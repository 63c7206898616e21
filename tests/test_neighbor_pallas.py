"""Pallas within kernel vs host ground truth (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molar_tpu.core.pbc import PBC_FULL, PeriodicBox
from molar_tpu.ops import neighbor, neighbor_host
from molar_tpu.ops.neighbor_pallas import within_mask_pallas


@pytest.mark.parametrize("seed,cutoff", [(11, 0.5), (3, 0.8)])
def test_pallas_within_matches_host(seed, cutoff):
    rng = np.random.default_rng(seed)
    n, nt = 700, 90
    box = PeriodicBox(np.diag([4.0, 5.0, 6.0]).astype(np.float32))
    coords = rng.uniform(-2, 8, (n, 3)).astype(np.float32)
    src = np.arange(n)
    tgt = np.sort(rng.choice(n, nt, replace=False))
    dims = neighbor.grid_dims(box.box_extents(), cutoff)
    mask, ofl = within_mask_pallas(
        jnp.asarray(coords),
        jnp.asarray(src),
        jnp.asarray(tgt),
        cutoff,
        jnp.asarray(box.matrix),
        jnp.asarray(box.inv),
        dims,
        cap=48,
        tgt_cap=32,
        interpret=True,
    )
    assert not bool(ofl)
    got = src[np.asarray(mask)]
    want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


def test_pallas_small_grid():
    # dims with a length-2 axis (wrap aliasing stress)
    rng = np.random.default_rng(5)
    n = 200
    box = PeriodicBox(np.diag([2.0, 4.0, 4.0]).astype(np.float32))
    coords = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    src = np.arange(n)
    tgt = np.arange(0, n, 5)
    cutoff = 0.9
    dims = neighbor.grid_dims(box.box_extents(), cutoff)
    mask, ofl = within_mask_pallas(
        jnp.asarray(coords), jnp.asarray(src), jnp.asarray(tgt), cutoff,
        jnp.asarray(box.matrix), jnp.asarray(box.inv), dims,
        cap=128, tgt_cap=64, interpret=True,
    )
    got = src[np.asarray(mask)]
    want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("seed,cutoff", [(7, 0.5), (19, 0.9)])
def test_ghost_pallas_matches_host(seed, cutoff):
    from molar_tpu.ops.neighbor_pallas import within_ghost_pallas

    rng = np.random.default_rng(seed)
    n, nt = 900, 120
    box = PeriodicBox(np.diag([4.0, 5.0, 6.0]).astype(np.float32))
    coords = rng.uniform(-2, 8, (n, 3)).astype(np.float32)
    src = np.arange(n)
    tgt = np.sort(rng.choice(n, nt, replace=False))
    dims = neighbor.grid_dims(box.box_extents(), cutoff)
    mask, ofl = within_ghost_pallas(
        jnp.asarray(coords),
        jnp.asarray(src),
        jnp.asarray(tgt),
        cutoff,
        jnp.asarray(box.matrix),
        jnp.asarray(box.inv),
        dims,
        cap=64,
        tgt_cap=32,
        interpret=True,
    )
    assert not bool(ofl)
    got = src[np.asarray(mask)]
    want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


def test_ghost_pallas_partial_pbc():
    from molar_tpu.core.pbc import PbcDims
    from molar_tpu.ops.neighbor_pallas import within_ghost_pallas

    rng = np.random.default_rng(4)
    box = PeriodicBox(np.diag([4.0, 5.0, 6.0]).astype(np.float32))
    coords = rng.uniform(-2, 8, (500, 3)).astype(np.float32)
    pd = PbcDims(True, False, True)
    inside = (coords[:, 1] >= 0) & (coords[:, 1] < 5.0)
    src = np.arange(500)[inside]
    tgt = src[::6]
    dims = neighbor.grid_dims(box.box_extents(), 0.5)
    mask, _ = within_ghost_pallas(
        jnp.asarray(coords),
        jnp.asarray(src),
        jnp.asarray(tgt),
        0.5,
        jnp.asarray(box.matrix),
        jnp.asarray(box.inv),
        dims,
        cap=64,
        tgt_cap=32,
        pbc=pd.as_tuple(),
        interpret=True,
    )
    got = src[np.asarray(mask)]
    want = neighbor_host.search_within(0.5, coords, src, tgt, box, pd)
    assert np.array_equal(got, want)
