"""Exact device Lee-Richards SASA vs the host ground truth (VERDICT r1 #8).

Contract: same slicing formulation on both sides => parity is pure float
error, ≤ 1e-4 relative per atom (reference exactness bar: sasa.rs PowerSasa
is exact; our host LR is exact-in-the-limit and the device must match it).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from molar_tpu import System
from molar_tpu.ops import sasa_host
from molar_tpu.ops.sasa_lr import max_displacement, neighbor_lists, sasa


def _rel_err(dev, host):
    scale = np.maximum(np.abs(host), 1e-3)
    return np.max(np.abs(dev - host) / scale)


def test_two_spheres_analytic():
    # Two equal spheres: exposed area = 4 pi r^2 - 2 pi r h (spherical cap)
    r = 0.3
    d = 0.4
    coords = np.array([[0, 0, 0], [d, 0, 0]], np.float64)
    radii = np.full(2, r)
    nbr, ofl = neighbor_lists(coords, radii, cap=4)
    assert not ofl
    dev = np.asarray(sasa(coords, radii, jnp.asarray(nbr), n_slices=256, block=2))
    h = r - d / 2
    want = 4 * np.pi * r * r - 2 * np.pi * r * h
    np.testing.assert_allclose(dev, want, rtol=2e-3)


def test_random_cluster_matches_host():
    rng = np.random.default_rng(5)
    coords = rng.uniform(0, 1.2, (60, 3))
    radii = rng.uniform(0.15, 0.3, 60)
    host = sasa_host.sasa(coords, radii - 0.0, probe=0.0, n_slices=48)
    nbr, ofl = neighbor_lists(coords, radii, cap=64)
    assert not ofl
    dev = np.asarray(
        sasa(coords, radii, jnp.asarray(nbr), n_slices=48, block=64)
    )
    assert _rel_err(dev, host) < 1e-4


def test_protein_matches_host(ref_data):
    sys_ = System.from_file(str(ref_data / "protein.pdb"))
    coords = sys_.state.coords.astype(np.float64)
    radii = sys_.topology.vdw().astype(np.float64) + 0.14
    host = sasa_host.sasa(coords, sys_.topology.vdw(), probe=0.14, n_slices=32)
    nbr, ofl = neighbor_lists(coords, radii, cap=128)
    assert not ofl
    dev = np.asarray(
        sasa(coords, radii, jnp.asarray(nbr), n_slices=32, block=512)
    )
    assert _rel_err(dev, host) < 1e-4
    # sanity: buried atoms ~0, surface atoms > 0
    assert (host > 0.01).sum() > 500


def test_verlet_skin_reuse():
    rng = np.random.default_rng(6)
    coords0 = rng.uniform(0, 2.0, (80, 3))
    radii = np.full(80, 0.25)
    skin = 0.2
    nbr, _ = neighbor_lists(coords0, radii, cap=96, skin=skin)
    # displace atoms by < skin/2: the list is still a superset, same result
    coords1 = coords0 + rng.uniform(-1, 1, coords0.shape) * (
        skin / (2 * np.sqrt(3)) * 0.99
    )
    assert float(max_displacement(jnp.asarray(coords1), jnp.asarray(coords0))) < skin / 2
    fresh, _ = neighbor_lists(coords1, radii, cap=96)
    a = np.asarray(sasa(coords1, radii, jnp.asarray(nbr), n_slices=32, block=80))
    b = np.asarray(sasa(coords1, radii, jnp.asarray(fresh), n_slices=32, block=80))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_neighbor_overflow_flag():
    coords = np.zeros((10, 3))
    radii = np.full(10, 0.3)
    _, ofl = neighbor_lists(coords, radii, cap=4)
    assert ofl


def test_sasa_series_update_reuse():
    """SasaSeries mirrors PowerSasa's update-reuse contract (sasa.rs:52-121):
    repeated updates stay exact across drift-triggered rebuilds."""
    from molar_tpu.ops.sasa_lr import SasaSeries

    rng = np.random.default_rng(11)
    c = rng.uniform(0, 1.5, (50, 3))
    vdw = np.full(50, 0.15)
    ss = SasaSeries(c, vdw, probe=0.14, skin=0.1, n_slices=32, cap=96, block=50)
    for k in range(6):
        c = c + rng.normal(0, 0.04, c.shape)  # guaranteed to exceed skin/2 soon
        got = np.asarray(ss.update(c))
        want = sasa_host.sasa(c, vdw, probe=0.14, n_slices=32)
        assert _rel_err(got, want) < 1e-4, k
    assert ss.rebuilds >= 1
