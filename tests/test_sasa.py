"""SASA tests: closed-form oracles + cross-validation of two implementations."""

import numpy as np
import pytest

from molar_tpu import System
from molar_tpu.ops import sasa as sasa_dev
from molar_tpu.ops import sasa_host


def test_single_sphere_exact():
    a = sasa_host.sasa(np.zeros((1, 3)), np.array([0.2]), probe=0.14, n_slices=64)
    exact = 4 * np.pi * 0.34**2
    assert abs(a[0] - exact) / exact < 1e-10


def test_two_sphere_caps_exact():
    R, d = 0.34, 0.4
    coords = np.array([[0, 0, 0], [d, 0, 0]], dtype=float)
    a = sasa_host.sasa(coords, np.array([0.2, 0.2]), probe=0.14, n_slices=256)
    h = R - d / 2
    exact = 4 * np.pi * R * R - 2 * np.pi * R * h
    np.testing.assert_allclose(a, exact, rtol=2e-3)


def test_buried_sphere_zero():
    coords = np.array([[0, 0, 0], [0.01, 0, 0]], dtype=float)
    a = sasa_host.sasa(coords, np.array([0.2, 0.05]), probe=0.14)
    assert a[1] == 0.0
    assert a[0] > 0


def test_cluster_cross_validation():
    # Random cluster: exact Lee-Richards vs device Shrake-Rupley must agree
    # to sampling error.
    rng = np.random.default_rng(4)
    n = 30
    coords = rng.uniform(0, 0.8, (n, 3)).astype(np.float32)
    vdw = rng.uniform(0.1, 0.2, n).astype(np.float32)
    exact = sasa_host.sasa(coords, vdw, probe=0.14, n_slices=128)
    radii = vdw + 0.14
    nbm, ofl = sasa_dev.neighbor_matrix(coords.astype(np.float64), radii, cap=64)
    assert not ofl
    import jax.numpy as jnp

    approx = np.asarray(
        sasa_dev.shrake_rupley(
            jnp.asarray(coords), jnp.asarray(radii.astype(np.float32)), jnp.asarray(nbm),
            n_points=1920,
        )
    )
    total_exact = exact.sum()
    total_approx = approx.sum()
    assert abs(total_exact - total_approx) / total_exact < 0.01
    # per-atom agreement within sampling noise
    np.testing.assert_allclose(approx, exact, atol=0.02)


def test_protein_sasa_sane(ref_data):
    sys = System.from_file(str(ref_data / "protein.pdb"))
    sel = sys("protein")
    s = sel.sasa(n_slices=32)
    areas = s.areas()
    assert len(areas) == len(sel)
    assert s.total_area() > 0
    # A folded ~260-residue protein has SASA roughly 100-200 nm^2.
    assert 50 < s.total_area() < 400
    # Core atoms are buried.
    assert (areas == 0).sum() > len(sel) * 0.3


def test_volume(ref_data):
    c = np.zeros((1, 3))
    from molar_tpu.ops.sasa_host import total_volume

    v = total_volume(c, np.array([0.2]), probe=0.14)
    exact = 4 / 3 * np.pi * 0.34**3
    assert abs(v - exact) / exact < 0.05
