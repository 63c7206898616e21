"""AMBER NetCDF handler tests + TPR/CPT plugin gating."""

import numpy as np
import pytest

from molar_tpu.core import PeriodicBox, State
from molar_tpu.io import FileHandler
from molar_tpu.io.netcdf_amber import NetcdfHandler


def test_read_benzene_nc(ref_data):
    h = NetcdfHandler(str(ref_data / "benzene.nc"))
    assert h.n_frames == 5
    assert h.n_atoms == 12
    st = h.read_frame(0)
    assert st.box is not None
    # matches the pdb (same first frame)
    from molar_tpu.io import read_file

    top, st0 = read_file(str(ref_data / "benzene.pdb"))
    np.testing.assert_allclose(st.coords, st0.coords, atol=1e-4)
    # matches the xtc within xtc quantization
    from molar_tpu.io.xtc import XtcHandler

    x = XtcHandler(str(ref_data / "benzene.xtc"))
    for k in range(5):
        np.testing.assert_allclose(
            h.read_frame(k).coords, x.read_frame(k).coords, atol=6e-4
        )


def test_nc_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 37
    box = PeriodicBox.from_vectors_angles(4.0, 5.0, 6.0, 80.0, 85.0, 75.0)
    path = str(tmp_path / "rt.nc")
    w = NetcdfHandler(path, "w")
    frames = []
    for k in range(3):
        c = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        frames.append(c)
        w.write(None, State(coords=c, time=2.0 * k, box=box))
    w.close()
    r = NetcdfHandler(path)
    assert r.n_frames == 3 and r.n_atoms == n
    for k in range(3):
        st = r.read_frame(k)
        np.testing.assert_allclose(st.coords, frames[k], atol=1e-6)
        assert st.time == 2.0 * k
        np.testing.assert_allclose(st.box.matrix, box.matrix, atol=1e-4)
    # seek api
    last = r.seek_last()
    np.testing.assert_allclose(last.coords, frames[-1], atol=1e-6)


def test_nc_facade_iteration(ref_data):
    with FileHandler(str(ref_data / "benzene.nc")) as fh:
        frames = list(fh.iter_states())
    assert len(frames) == 5
    assert all(np.diff([s.time for s in frames]) > 0)


def test_tpr_without_plugin_falls_back_to_native(ref_data, monkeypatch):
    """No libgromacs on the machine: a modern tpr must still open via the
    pure native tpx reader (round-3); garbage input still errors cleanly."""
    monkeypatch.delenv("MOLAR_GROMACS_PLUGIN", raising=False)
    from molar_tpu.io.tpr import _plugin

    _plugin.cache_clear()
    fh = FileHandler(str(ref_data / "topol.tpr"))
    top = fh.handler.read_topology()
    assert top.n_atoms == 57747
    fh.close()
    import tempfile, os

    bad = os.path.join(tempfile.mkdtemp(), "bad.tpr")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(Exception):
        FileHandler(bad)


# ---------------------------------------------------------------------------
# Native (no-libgromacs) TPR/CPT decode of the REAL reference fixtures
# ---------------------------------------------------------------------------


def test_native_tpr_real_file(ref_data):
    """Decode the real topol.tpr (GROMACS 2021.4, tpx v122) with the pure
    native reader and cross-validate the protein moltype against
    protein.pdb — two completely independent sources of the same system."""
    from molar_tpu import System

    tpr = ref_data / "topol.tpr"
    s = System.from_file(str(tpr))
    assert s.n_atoms == 57747
    assert len(s.topology.molecules) == 17875
    # box is 8.3027 nm cubic
    np.testing.assert_allclose(
        np.diag(s.state.box.matrix), [8.302669] * 3, atol=1e-4
    )
    assert s.state.velocities is not None and s.state.velocities.shape == (
        57747,
        3,
    )
    # protein part == protein.pdb (names, resnames, resids, element)
    p = System.from_file(str(ref_data / "protein.pdb"))
    n = p.n_atoms
    assert n == 4295
    assert s.topology.names()[:n].tolist() == p.topology.names()[:n].tolist()
    assert (
        s.topology.resnames()[:n].tolist()
        == p.topology.resnames()[:n].tolist()
    )
    np.testing.assert_array_equal(s.topology.resid[:n], p.topology.resid[:n])
    # masses/charges came from the force field, elements from atomtypes
    assert abs(float(s.topology.mass[:n].sum()) - 30472.35) < 1.0
    assert s.topology.mass.min() > 0
    # water is TIP3 3-site x 17768
    assert (np.asarray(s.topology.resnames()) == "TIP3").sum() == 53304
    # bonds: connectivity covers the protein (CONSTR h-bonds + harmonic)
    assert len(s.topology.bonds) > 30000
    b = np.asarray(s.topology.bonds)
    assert b.min() >= 0 and b.max() < s.n_atoms
    # selections work end-to-end on the decoded system
    assert len(s("protein and name CA").indices) == 265


def test_native_cpt_real_file(ref_data):
    """Decode the real state.cpt (GROMACS 2024.4 run, cpt v23 container):
    box, positions, velocities, step/time."""
    from molar_tpu.io import FileHandler

    with FileHandler(str(ref_data / "state.cpt")) as fh:
        states = list(fh.iter_states())
    assert len(states) == 1
    st = states[0]
    assert st.n_atoms == 96027
    assert st.time == 100000.0
    # triclinic box: column vectors (9.641, 0, 0), (4.821, 8.349, 0), ...
    m = st.box.matrix
    np.testing.assert_allclose(
        [m[0, 0], m[0, 1], m[1, 1], m[2, 2]],
        [9.641, 4.821, 8.349, 11.452],
        atol=2e-3,
    )
    assert st.velocities is not None
    # thermal velocity scale (nm/ps), not garbage
    assert 0.1 < float(np.abs(st.velocities).mean()) < 2.0


def test_tpx_version_floor_names_range(tmp_path):
    # A pre-v119 tpx header must raise loudly, naming the version and the
    # supported range (never risk a silently misaligned body parse).
    import struct

    from molar_tpu.io.tpx import MIN_TPX_VERSION, TpxError, read_tpx

    def xdr_string(s: bytes) -> bytes:
        return (
            struct.pack(">i", len(s) + 1)
            + struct.pack(">i", len(s))
            + s
            + b"\x00" * ((4 - len(s) % 4) % 4)
        )

    hdr = xdr_string(b"VERSION 2019.6") + struct.pack(">ii", 4, 110)
    p = tmp_path / "old.tpr"
    p.write_bytes(hdr + b"\x00" * 64)
    with pytest.raises(TpxError) as ei:
        read_tpx(str(p))
    msg = str(ei.value)
    assert "110" in msg and str(MIN_TPX_VERSION) in msg
