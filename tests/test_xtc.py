"""XTC codec tests: fixture parity, round-trips, random access, windows."""

import numpy as np
import pytest

from molar_tpu.core.pbc import PeriodicBox
from molar_tpu.io import FileHandler, read_file
from molar_tpu.io.xtc import XtcHandler


@pytest.fixture(scope="module")
def benzene(ref_data):
    return XtcHandler(str(ref_data / "benzene.xtc"))


def test_benzene_first_frame_matches_pdb(ref_data, benzene):
    top, st0 = read_file(str(ref_data / "benzene.pdb"))
    st = benzene.read_frame(0)
    assert st.n_atoms == top.n_atoms == 12
    # XTC precision 1000 -> 1e-3 nm quantization
    np.testing.assert_allclose(st.coords, st0.coords, atol=5.1e-4)
    assert st.box is not None


def test_benzene_frames_physically_consistent(benzene):
    # Rigid-ish benzene: the intramolecular distance matrix must be stable
    # across frames; a desynced decode produces garbage geometry immediately.
    dmats = []
    for i in range(benzene.n_frames):
        c = benzene.read_frame(i).coords
        dmats.append(np.linalg.norm(c[:, None] - c[None, :], axis=2))
    for i in range(1, len(dmats)):
        assert np.abs(dmats[i] - dmats[0]).max() < 0.05, i


def test_times_monotonic(benzene):
    t = benzene.times
    assert np.all(np.diff(t) > 0)


def test_seek_and_iteration(benzene):
    benzene.seek_frame(0)
    frames = []
    while True:
        st = benzene.read_state()
        if st is None:
            break
        frames.append(st)
    assert len(frames) == benzene.n_frames
    last = benzene.seek_last()
    np.testing.assert_allclose(last.coords, frames[-1].coords)
    benzene.seek_time(float(benzene.times[2]))
    st = benzene.read_state()
    assert st.time == pytest.approx(float(benzene.times[2]))


def test_roundtrip_random(tmp_path):
    rng = np.random.default_rng(11)
    n = 3173
    box = PeriodicBox(np.diag([8.0, 9.0, 10.0]).astype(np.float32))
    path = str(tmp_path / "rt.xtc")
    w = XtcHandler(path, "w")
    frames = []
    for k in range(4):
        c = rng.uniform(-2, 11, (n, 3)).astype(np.float32)
        frames.append(c)
        w.write_raw(c, box.matrix, step=k * 100, time=2.0 * k)
    w.close()
    r = XtcHandler(path)
    assert r.n_frames == 4
    assert r.n_atoms == n
    for k in range(4):
        st = r.read_frame(k)
        np.testing.assert_allclose(st.coords, frames[k], atol=5.1e-4)
        assert st.step == k * 100
        assert st.time == pytest.approx(2.0 * k)
        np.testing.assert_allclose(st.box.matrix, box.matrix, atol=1e-6)
    r.close()


def test_roundtrip_small_system(tmp_path):
    # natoms <= 9 uses the uncompressed path
    rng = np.random.default_rng(5)
    c = rng.uniform(0, 3, (7, 3)).astype(np.float32)
    path = str(tmp_path / "small.xtc")
    w = XtcHandler(path, "w")
    w.write_raw(c, None, step=1, time=0.5)
    w.close()
    r = XtcHandler(path)
    st = r.read_frame(0)
    np.testing.assert_allclose(st.coords, c, atol=1e-6)  # exact floats
    assert st.box is None
    r.close()


def test_window_parallel_decode(tmp_path):
    rng = np.random.default_rng(3)
    n = 501
    path = str(tmp_path / "w.xtc")
    w = XtcHandler(path, "w")
    ref = []
    for k in range(16):
        c = rng.uniform(0, 5, (n, 3)).astype(np.float32)
        ref.append(c)
        w.write_raw(c, np.diag([5.0, 5.0, 5.0]).astype(np.float32), k, float(k))
    w.close()
    r = XtcHandler(path)
    coords, boxes, times = r.read_frames(2, 10, n_threads=4)
    assert coords.shape == (10, n, 3)
    for i in range(10):
        np.testing.assert_allclose(coords[i], ref[2 + i], atol=5.1e-4)
        assert times[i] == pytest.approx(2.0 + i)
    r.close()


def test_facade_dispatch(ref_data):
    fh = FileHandler(str(ref_data / "benzene.xtc"))
    states = list(fh.iter_states())
    assert len(states) == 5
    fh.close()


def test_truncated_tail_tolerated(tmp_path, ref_data):
    raw = (ref_data / "benzene.xtc").read_bytes()
    cut = tmp_path / "cut.xtc"
    cut.write_bytes(raw[: len(raw) - 37])  # chop mid-frame
    h = XtcHandler(str(cut))
    assert h.n_frames == 4  # last frame dropped, no error
    h.close()


def test_read_frames_i16_bitexact(ref_data):
    """i16 quantized decode x scale reproduces the float decode bit-exactly."""
    from molar_tpu.io.xtc import XtcHandler

    h = XtcHandler(str(ref_data / "benzene.xtc"), "r")
    ic, scale, boxes, times = h.read_frames_i16(0, h.n_frames)
    c, b2, t2 = h.read_frames(0, h.n_frames)
    assert ic.dtype == np.int16
    np.testing.assert_array_equal(ic.astype(np.float32) * scale, c)
    np.testing.assert_array_equal(boxes, b2)
    np.testing.assert_array_equal(times, t2)
    h.close()


def test_iter_windows_quantized(tmp_path, ref_data):
    from molar_tpu.io.xtc import XtcHandler
    from molar_tpu.tasks.trajectory import TrajectoryReader

    src = str(ref_data / "benzene.xtc")
    reader = TrajectoryReader([src])
    plain = list(reader.iter_windows(4))
    quant = list(reader.iter_windows(4, quantized=True))
    assert len(plain) == len(quant)
    for (c, b, i, t, ids), (cq, bq, iq, tq, idsq) in zip(plain, quant):
        assert isinstance(cq, tuple)
        ic, scale = cq
        np.testing.assert_array_equal(ic.astype(np.float32) * scale, c)
        np.testing.assert_array_equal(ids, idsq)


def test_sticky_run_dialect_new_xtc(ref_data):
    """Files written by the reference's Rust XTC codec (molly) use a
    non-canonical run-flag shorthand: flag==0 after a large coordinate
    repeats the PREVIOUS record's run length (canonical xdrfile means "no
    run"). tests/new.xtc is such a file, and its coordinates are exactly
    tests/protein.pdb's — decode must fall back to the sticky dialect and
    reproduce them bit-exactly (xtc_codec.cpp xtc_decode_core)."""
    import numpy as np

    from molar_tpu.io.xtc import XtcHandler

    path = ref_data / "new.xtc"
    if not path.exists():
        pytest.skip("new.xtc not in reference snapshot")
    gt = []
    for line in open(ref_data / "protein.pdb"):
        if line.startswith(("ATOM", "HETATM")):
            gt.append(
                [
                    round(float(line[30:38]) * 100),
                    round(float(line[38:46]) * 100),
                    round(float(line[46:54]) * 100),
                ]
            )
    gt = np.array(gt, np.int64)
    h = XtcHandler(str(path))
    assert h.n_frames == 10 and h.n_atoms == len(gt)
    for k in (0, 9):
        ints = np.round(h.read_frame(k).coords * 1000).astype(np.int64)
        np.testing.assert_array_equal(ints, gt)
    # the i16 (quantized transport) path must agree exactly too
    ic, scale, boxes, times = h.read_frames_i16(0, 10)
    np.testing.assert_array_equal(ic[4].astype(np.int64), gt)
    h.close()


def test_canonical_decode_still_exact_after_dialect_fallback(tmp_path):
    """The canonical-first decode with sticky retry must not perturb
    normally-written files (our own canonical writer round-trips)."""
    import numpy as np

    from molar_tpu.io.xtc import XtcHandler

    rng = np.random.default_rng(7)
    c = rng.uniform(0, 5, (500, 3)).astype(np.float32)
    box = np.diag([5.0, 5.0, 5.0]).astype(np.float32)
    p = tmp_path / "t.xtc"
    w = XtcHandler(str(p), "w")
    for k in range(3):
        w.write_raw(c + 0.01 * k, box, step=k, time=float(k))
    w.close()
    h = XtcHandler(str(p))
    got = h.read_frame(2).coords
    want = np.round((c + 0.02) * 1000) / 1000
    np.testing.assert_allclose(got, want, atol=5e-7)
    h.close()
