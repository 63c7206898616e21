"""GROMACS plugin build smoke + ctypes round-trip against a mock .so.

The plugin (molar_tpu/native/gromacs_plugin.cpp) normally compiles only
against a full GROMACS source+build tree, which this environment lacks —
round 1 shipped it as the one never-built component. These tests compile it
against the checked-in stub headers (tests/fixtures/gmx_stub: a functional
mock of the GROMACS API surface the plugin touches) and drive the full
TprHandler/CptHandler ctypes path against the resulting shared library.
Reference mechanism: molar_gromacs/build.rs + wrapper.cpp (dlopen C ABI).
"""

import os
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
PLUGIN_SRC = REPO / "molar_tpu" / "native" / "gromacs_plugin.cpp"
STUB_DIR = REPO / "tests" / "fixtures" / "gmx_stub"

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)


@pytest.fixture(scope="module")
def mock_plugin(tmp_path_factory):
    out = tmp_path_factory.mktemp("gmx") / "libmolar_gromacs_mock.so"
    subprocess.run(
        [
            "g++",
            "-std=c++17",
            "-O1",
            "-shared",
            "-fPIC",
            f"-I{STUB_DIR}",
            str(PLUGIN_SRC),
            "-o",
            str(out),
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    return out


@pytest.fixture()
def plugin_env(mock_plugin, monkeypatch):
    from molar_tpu.io import tpr

    monkeypatch.setenv("MOLAR_GROMACS_PLUGIN", str(mock_plugin))
    tpr._plugin.cache_clear()
    yield
    tpr._plugin.cache_clear()


def test_plugin_syntax_only():
    """The plugin must at least parse standalone against the stub API."""
    subprocess.run(
        ["g++", "-std=c++17", "-fsyntax-only", f"-I{STUB_DIR}", str(PLUGIN_SRC)],
        check=True,
        capture_output=True,
        text=True,
    )


def test_tpr_roundtrip(plugin_env, tmp_path):
    from molar_tpu.io.tpr import TprHandler

    h = TprHandler(str(tmp_path / "fake.tpr"))
    top, st = h.read()
    # Constants from tests/fixtures/gmx_stub/gromacs/gmx_stub_core.h.
    assert top.n_atoms == 3
    assert list(top.names()) == ["OW", "HW1", "HW2"]
    assert list(top.resnames()) == ["SOL"] * 3
    assert top.resid.tolist() == [1, 1, 1]
    np.testing.assert_allclose(top.charge, [-0.8, 0.4, 0.4], atol=1e-6)
    np.testing.assert_allclose(top.mass, [15.999, 1.008, 1.008], atol=1e-6)
    # atomnumber -1 is clamped to 0 by the plugin
    assert top.atomic_number.tolist() == [8, 1, 0]
    assert [top.atom(i).type_name for i in range(3)] == [
        "opls116",
        "opls117",
        "opls117",
    ]
    assert [top.atom(i).type_id for i in range(3)] == [5, 6, 6]
    # Only the F_BONDS (IF_CHEMBOND) entries become bonds; SETTLE does not.
    assert sorted(map(tuple, top.bonds.tolist())) == [(0, 1), (0, 2)]
    assert top.molecules.tolist() == [[0, 2]]
    np.testing.assert_allclose(
        st.coords,
        np.array([[0.1, 0.2, 0.3], [0.2, 0.2, 0.3], [0.1, 0.3, 0.3]]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.diag(st.box.matrix), [1.5, 1.6, 1.7], atol=1e-6
    )
    with pytest.raises(EOFError):
        h.read()  # single-frame semantics
    h.close()


def test_cpt_roundtrip(plugin_env, tmp_path):
    from molar_tpu.io.tpr import CptHandler

    h = CptHandler(str(tmp_path / "fake.cpt"))
    st = h.read_state()
    assert st.n_atoms == 3
    np.testing.assert_allclose(st.coords[0], [1.1, 1.2, 1.3], atol=1e-6)
    assert st.velocities is not None
    np.testing.assert_allclose(st.velocities[1], [0.03, 0.04, 0.05], atol=1e-6)
    assert st.forces is None
    assert st.time == 123.5
    assert st.step == 42
    np.testing.assert_allclose(np.diag(st.box.matrix), [2.0, 2.1, 2.2], atol=1e-6)
    assert h.read_state() is None  # single frame
    h.close()


def test_missing_plugin_error(monkeypatch):
    from molar_tpu.io import tpr

    monkeypatch.delenv("MOLAR_GROMACS_PLUGIN", raising=False)
    tpr._plugin.cache_clear()
    if (REPO / "molar_tpu" / "native" / "libmolar_gromacs.so").exists():
        pytest.skip("a real plugin build is present")
    with pytest.raises(tpr.GromacsPluginError, match="plugin not found"):
        tpr.TprHandler("x.tpr")
    tpr._plugin.cache_clear()
