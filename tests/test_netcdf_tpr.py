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


def test_tpr_graceful_error(ref_data, monkeypatch):
    monkeypatch.delenv("MOLAR_GROMACS_PLUGIN", raising=False)
    from molar_tpu.io.tpr import GromacsPluginError, _plugin

    _plugin.cache_clear()
    with pytest.raises(Exception) as exc:
        FileHandler(str(ref_data / "topol.tpr"))
    assert "GROMACS plugin" in str(exc.value)
