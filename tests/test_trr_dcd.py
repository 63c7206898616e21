"""TRR and DCD handler tests: round-trips, pick-reads, seeks, cross-format."""

import numpy as np
import pytest

from molar_tpu.core import Atom, PeriodicBox, State, Topology
from molar_tpu.io import FileHandler
from molar_tpu.io.dcd import DcdHandler
from molar_tpu.io.trr import TrrHandler


@pytest.fixture()
def frames():
    rng = np.random.default_rng(2)
    n = 77
    box = PeriodicBox.from_vectors_angles(5.0, 6.0, 7.0, 80.0, 85.0, 75.0)
    out = []
    for k in range(4):
        out.append(
            State(
                coords=rng.uniform(0, 5, (n, 3)).astype(np.float32),
                velocities=rng.normal(0, 1, (n, 3)).astype(np.float32),
                forces=rng.normal(0, 100, (n, 3)).astype(np.float32),
                time=float(10 * k),
                step=k * 500,
                box=box,
            )
        )
    return out


def test_trr_roundtrip(tmp_path, frames):
    path = str(tmp_path / "t.trr")
    w = TrrHandler(path, "w")
    for st in frames:
        w.write_state(st)
    w.close()
    r = TrrHandler(path)
    assert r.n_frames == 4
    assert r.n_atoms == 77
    for k, want in enumerate(frames):
        st = r.read_frame(k)
        np.testing.assert_allclose(st.coords, want.coords, atol=1e-6)
        np.testing.assert_allclose(st.velocities, want.velocities, atol=1e-6)
        np.testing.assert_allclose(st.forces, want.forces, atol=1e-4)
        np.testing.assert_allclose(st.box.matrix, want.box.matrix, atol=1e-6)
        assert st.time == pytest.approx(want.time)
        assert st.step == want.step
    r.close()


def test_trr_pick_read(tmp_path, frames):
    path = str(tmp_path / "t.trr")
    w = TrrHandler(path, "w")
    for st in frames:
        w.write_state(st)
    w.close()
    r = TrrHandler(path)
    st = r.read_state_pick(need_velocities=False, need_forces=False)
    assert st.velocities is None and st.forces is None
    np.testing.assert_allclose(st.coords, frames[0].coords, atol=1e-6)
    r.close()


def test_trr_selective_write(tmp_path, frames):
    path = str(tmp_path / "xonly.trr")
    w = TrrHandler(path, "w")
    for st in frames:
        w.write_state(st, write_velocities=False, write_forces=False)
    w.close()
    r = TrrHandler(path)
    st = r.read_frame(0)
    assert st.velocities is None and st.forces is None
    r.close()


def test_trr_seek(tmp_path, frames):
    path = str(tmp_path / "t.trr")
    w = TrrHandler(path, "w")
    for st in frames:
        w.write_state(st)
    w.close()
    r = TrrHandler(path)
    r.seek_time(20.0)
    st = r.read_state()
    assert st.time == pytest.approx(20.0)
    last = r.seek_last()
    assert last.time == pytest.approx(30.0)
    r.close()


def test_dcd_roundtrip(tmp_path, frames):
    path = str(tmp_path / "t.dcd")
    w = DcdHandler(path, "w")
    top = Topology.from_atoms(
        [Atom(name="C", resid=1).guess_element_and_mass() for _ in range(77)]
    )
    for st in frames:
        w.write(top, st)
    w.close()
    r = DcdHandler(path)
    assert r.n_frames == 4
    assert r.n_atoms == 77
    for k, want in enumerate(frames):
        st = r.read_frame(k)
        # DCD is f32 Angstrom on disk: ~1e-5 nm error
        np.testing.assert_allclose(st.coords, want.coords, atol=2e-5)
        lv, av = want.box.to_vectors_angles()
        lg, ag = st.box.to_vectors_angles()
        np.testing.assert_allclose(lg, lv, atol=1e-4)
        np.testing.assert_allclose(ag, av, atol=0.01)
    r.close()


def test_dcd_selection_write_and_facade(tmp_path, frames, ref_data):
    # trjconv-style: read xtc, write selection to dcd (the reference's third
    # benchmark workload, comparison_small.rs:44-57)
    from molar_tpu import System

    s = System.from_file(str(ref_data / "protein.pdb"))
    ca = s("name CA")
    out = str(tmp_path / "ca.dcd")
    with FileHandler(out, "w") as fh:
        fh.write(s.topology, s.state, indices=ca.indices)
    with FileHandler(out) as fh:
        st = fh.read_state()
        assert st.n_atoms == len(ca)
        np.testing.assert_allclose(st.coords, s.state.coords[ca.indices], atol=2e-5)


def test_trr_window_read(tmp_path, frames):
    path = str(tmp_path / "t.trr")
    w = TrrHandler(path, "w")
    for st in frames:
        w.write_state(st)
    w.close()
    r = TrrHandler(path)
    coords, boxes, times = r.read_frames(1, 2)
    assert coords.shape == (2, 77, 3)
    np.testing.assert_allclose(coords[0], frames[1].coords, atol=1e-6)
    r.close()


def test_facade_write_state_pick(tmp_path):
    """io.rs write_state_pick: drop velocities/forces at the IO level."""
    from molar_tpu.core.pbc import PeriodicBox
    from molar_tpu.core.state import State
    from molar_tpu.io import FileHandler

    rng = np.random.default_rng(3)
    st = State(
        coords=rng.uniform(0, 5, (20, 3)).astype(np.float32),
        velocities=rng.normal(size=(20, 3)).astype(np.float32),
        forces=rng.normal(size=(20, 3)).astype(np.float32),
        box=PeriodicBox(np.diag([5.0, 5.0, 5.0]).astype(np.float32)),
        time=1.5,
    )
    p = str(tmp_path / "pick.trr")
    w = FileHandler(p, "w")
    w.write_state_pick(st, write_velocities=False)
    w.close()
    r = FileHandler(p)
    got = r.read_state()
    r.close()
    assert got.velocities is None
    assert got.forces is not None  # forces kept
    np.testing.assert_allclose(got.coords, st.coords, atol=1e-6)
