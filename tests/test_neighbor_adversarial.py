"""Adversarial device-vs-host parity for the cell-grid search.

Knife-edge cases the random scenes in test_neighbor_device.py cannot hit:
exact ties at the cutoff (the inclusive d^2 <= cutoff^2 contract,
distance_search.rs:287), tiny periodic grids where multiple images of the
same cell are in range, triclinic boxes with correction candidates, and the
sparse-target path's padding rows.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from molar_tpu.core.pbc import PBC_FULL, PeriodicBox
from molar_tpu.ops import neighbor, neighbor_host


def _device_within(coords, src, tgt, cutoff, box, **kw):
    kw.setdefault("dims", neighbor.grid_dims(box.box_extents(), cutoff))
    mask, ofl = neighbor.within_mask(
        jnp.asarray(coords),
        jnp.asarray(src),
        jnp.asarray(tgt),
        cutoff=cutoff,
        box=jnp.asarray(box.matrix),
        inv=jnp.asarray(box.inv),
        **kw,
    )
    assert not bool(ofl)
    return src[np.asarray(mask)]


def test_tie_exactly_at_cutoff_included():
    # dx = 0.5 is exact in f32; the inclusive cutoff must keep it, and
    # dx = 0.5 + 2^-10 (also exact) must drop it.
    box = PeriodicBox(np.diag([4.0, 4.0, 4.0]).astype(np.float32))
    eps = 2.0**-10
    coords = np.array(
        [
            [1.0, 1.0, 1.0],         # target
            [1.5, 1.0, 1.0],         # exactly at cutoff
            [1.5 + eps, 1.0, 1.0],   # just outside
            [1.0, 1.5, 1.0],         # tie on y
            [1.0, 1.0, 1.5 + eps],   # outside on z
        ],
        dtype=np.float32,
    )
    src = np.arange(1, 5)
    tgt = np.array([0])
    got = _device_within(coords, src, tgt, 0.5, box, cap=8)
    assert got.tolist() == [1, 3]
    want = neighbor_host.search_within(0.5, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


def test_tie_across_periodic_boundary():
    # Partner through the boundary at exactly the cutoff: 3.75 -> 0.25 with
    # box 4.0 is a min-image dx of exactly -0.5 (all exact in f32).
    box = PeriodicBox(np.diag([4.0, 4.0, 4.0]).astype(np.float32))
    coords = np.array(
        [[3.75, 2.0, 2.0], [0.25, 2.0, 2.0], [0.25 + 2.0**-10, 2.0, 2.0]],
        dtype=np.float32,
    )
    src = np.array([1, 2])
    tgt = np.array([0])
    got = _device_within(coords, src, tgt, 0.5, box, cap=8)
    assert got.tolist() == [1]
    want = neighbor_host.search_within(0.5, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("side,n", [(0.9, 40), (1.7, 80), (2.6, 120)])
def test_tiny_periodic_grids_match_host(side, n):
    # dims = 1 or 2 per axis: several images of the same cell are in range;
    # the shift path must enumerate them all (no dedupe) to match min-image.
    rng = np.random.default_rng(int(side * 100))
    box = PeriodicBox(np.diag([side] * 3).astype(np.float32))
    coords = rng.uniform(-side, 2 * side, (n, 3)).astype(np.float32)
    src = np.arange(n)
    tgt = rng.choice(n, max(n // 5, 3), replace=False)
    tgt.sort()
    for cutoff in (0.3, min(0.45, side / 2)):
        got = _device_within(coords, src, tgt, cutoff, box, cap=n)
        want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
        assert np.array_equal(got, want), (side, cutoff)


@pytest.mark.parametrize(
    "sides,cutoff",
    [
        ((0.7, 0.7, 0.7), 0.4),   # dims = (1,1,1): every axis aliases
        ((0.7, 2.0, 2.0), 0.4),   # dims = (1,5,5): one collapsed axis
    ],
)
def test_dim1_periodic_grid_matches_host(sides, cutoff):
    # side < 2*cutoff => grid_dims yields 1 on that axis: ALL 3 offsets per
    # collapsed axis alias to the same (only) cell, and the shift path's
    # no-dedupe claim (each offset is a distinct ±box image) carries the
    # whole result. This is the extreme the tiny-grid test above never
    # reaches (its dims floor at 2).
    rng = np.random.default_rng(77)
    box = PeriodicBox(np.diag(sides).astype(np.float32))
    n = 60
    coords = (rng.uniform(-1, 2, (n, 3)) * np.asarray(sides)).astype(np.float32)
    src = np.arange(n)
    tgt = rng.choice(n, 12, replace=False)
    tgt.sort()
    dims = neighbor.grid_dims(box.box_extents(), cutoff)
    assert min(dims) == 1
    got = _device_within(coords, src, tgt, cutoff, box, cap=n)
    want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


def test_triclinic_pairs_sorted_identity():
    # Full sorted pair-list identity (not just counts) on a skewed box that
    # exercises the correction-candidate sweep.
    box = PeriodicBox.from_vectors_angles(3.0, 3.2, 3.4, 75.0, 80.0, 70.0)
    rng = np.random.default_rng(11)
    coords = rng.uniform(-1, 5, (300, 3)).astype(np.float32)
    src = np.arange(300)
    tgt = np.arange(0, 300, 3)
    cutoff = 0.6
    dims = neighbor.grid_dims(box.box_extents(), cutoff)
    pairs, dist, count, ofl = neighbor.contact_pairs(
        jnp.asarray(coords),
        jnp.asarray(src),
        jnp.asarray(tgt),
        cutoff=cutoff,
        box=jnp.asarray(box.matrix),
        inv=jnp.asarray(box.inv),
        corrections=jnp.asarray(box.padded_corrections()),
        dims=dims,
        cap=128,
        max_pairs=1 << 14,
    )
    assert not bool(ofl)
    got = np.asarray(pairs)
    got = got[got[:, 0] >= 0]
    got = got[np.lexsort((got[:, 1], got[:, 0]))]
    hp, hd = neighbor_host.search_pairs(cutoff, coords, src, tgt, box, PBC_FULL)
    hp_sorted = hp[np.lexsort((hp[:, 1], hp[:, 0]))]
    assert np.array_equal(got, hp_sorted)


def test_contact_pairs_shift_path_distances():
    # corrections=None + dims >= 3 takes the lattice-shift step; distances
    # must equal the host's min-image distances for every pair.
    box = PeriodicBox(np.diag([4.0, 4.5, 5.0]).astype(np.float32))
    rng = np.random.default_rng(23)
    coords = rng.uniform(-2, 7, (400, 3)).astype(np.float32)
    src = np.arange(400)
    tgt = np.arange(0, 400, 4)
    cutoff = 0.7
    dims = neighbor.grid_dims(box.box_extents(), cutoff)
    assert min(dims) >= 3
    pairs, dist, count, ofl = neighbor.contact_pairs(
        jnp.asarray(coords),
        jnp.asarray(src),
        jnp.asarray(tgt),
        cutoff=cutoff,
        box=jnp.asarray(box.matrix),
        inv=jnp.asarray(box.inv),
        dims=dims,
        cap=64,
        max_pairs=1 << 14,
    )
    assert not bool(ofl)
    got = np.asarray(pairs)
    keep = got[:, 0] >= 0
    got_d = {tuple(p): d for p, d in zip(got[keep].tolist(), np.asarray(dist)[keep])}
    hp, hd = neighbor_host.search_pairs(cutoff, coords, src, tgt, box, PBC_FULL)
    want_d = {tuple(p): d for p, d in zip(hp.tolist(), hd.tolist())}
    assert set(got_d) == set(want_d)
    for p, d in want_d.items():
        assert abs(got_d[p] - d) < 1e-5


def test_sparse_target_padding_rows_do_not_hit():
    # max_tgt_cells far above the occupied count: the padding rows gather
    # cell 0's plane slots and must not produce hits anywhere.
    box = PeriodicBox(np.diag([6.0, 6.0, 6.0]).astype(np.float32))
    rng = np.random.default_rng(7)
    coords = rng.uniform(0, 6, (500, 3)).astype(np.float32)
    # Put a target clump in one corner; sources everywhere.
    coords[:10] = rng.uniform(0.0, 0.4, (10, 3)).astype(np.float32)
    src = np.arange(500)
    tgt = np.arange(10)
    cutoff = 0.5
    got = _device_within(
        coords, src, tgt, cutoff, box, cap=32, tgt_cap=16, max_tgt_cells=512
    )
    want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


def test_sparse_vs_dense_paths_agree():
    box = PeriodicBox(np.diag([5.0, 5.0, 5.0]).astype(np.float32))
    rng = np.random.default_rng(31)
    coords = rng.uniform(0, 5, (600, 3)).astype(np.float32)
    src = np.arange(600)
    tgt = rng.choice(600, 50, replace=False)
    tgt.sort()
    cutoff = 0.45
    dense = _device_within(coords, src, tgt, cutoff, box, cap=32, tgt_cap=16)
    sparse = _device_within(
        coords, src, tgt, cutoff, box, cap=32, tgt_cap=16, max_tgt_cells=256
    )
    assert np.array_equal(dense, sparse)


@pytest.mark.parametrize("side,cutoff", [(5.0, 0.5), (1.7, 0.4)])
def test_ghost_xla_path_matches_host(side, cutoff):
    # The ghost=True XLA variant (dynamic-slice stencil over ghost-padded
    # planes) must agree with the host on normal and tiny grids.
    rng = np.random.default_rng(int(side * 10))
    box = PeriodicBox(np.diag([side, side * 1.1, side * 1.2]).astype(np.float32))
    n = 400
    coords = rng.uniform(-side, 2 * side, (n, 3)).astype(np.float32)
    src = np.arange(n)
    tgt = rng.choice(n, n // 5, replace=False)
    tgt.sort()
    got = _device_within(coords, src, tgt, cutoff, box, cap=n, ghost=True)
    want = neighbor_host.search_within(cutoff, coords, src, tgt, box, PBC_FULL)
    assert np.array_equal(got, want)


def test_estimate_caps_bounds_real_occupancy():
    # The estimator's caps must actually hold the frame it measured (no
    # overflow when used as-is), and raw mode must return exact max counts.
    rng = np.random.default_rng(3)
    box = PeriodicBox(np.diag([5.0, 5.0, 5.0]).astype(np.float32))
    coords = rng.uniform(0, 5, (2000, 3)).astype(np.float32)
    tgt = np.arange(0, 2000, 7)
    dims = neighbor.grid_dims(box.box_extents(), 0.5)
    cap_raw, tcap_raw, ncells = neighbor.estimate_caps(
        coords, box.inv, dims, tgt, margin=1.0, round_to=1
    )
    # exact counts: reproduce with a direct bincount
    frac = (coords.astype(np.float64) @ box.inv.T.astype(np.float64)) % 1.0
    cell = tuple(
        np.minimum((frac[:, d] * dims[d]).astype(np.int64), dims[d] - 1)
        for d in range(3)
    )
    flat = (cell[0] * dims[1] + cell[1]) * dims[2] + cell[2]
    n_cells = dims[0] * dims[1] * dims[2]
    assert cap_raw == np.bincount(flat, minlength=n_cells).max()
    tc = np.bincount(flat[tgt], minlength=n_cells)
    assert tcap_raw == tc.max() and ncells == (tc > 0).sum()
    # rounded mode: multiple of 8 and >= raw
    cap8, tcap8, _ = neighbor.estimate_caps(coords, box.inv, dims, tgt)
    assert cap8 % 8 == 0 and cap8 >= cap_raw
    assert tcap8 % 8 == 0 and tcap8 >= tcap_raw
    # the caps hold: no overflow on the measured frame
    mask, ofl = neighbor.within_mask(
        jnp.asarray(coords), jnp.asarray(np.arange(2000)), jnp.asarray(tgt),
        cutoff=0.5, box=jnp.asarray(box.matrix), inv=jnp.asarray(box.inv),
        dims=dims, cap=cap8, tgt_cap=tcap8,
    )
    assert not bool(ofl)


def test_src_none_means_all_atoms():
    # src_idx=None skips the identity source gathers (hot-path saving);
    # result must equal the explicit arange form on every path.
    box = PeriodicBox(np.diag([5.0, 5.0, 5.0]).astype(np.float32))
    rng = np.random.default_rng(41)
    coords = rng.uniform(0, 5, (500, 3)).astype(np.float32)
    src = np.arange(500)
    tgt = rng.choice(500, 40, replace=False)
    tgt.sort()
    dims = neighbor.grid_dims(box.box_extents(), 0.5)
    for kw in (dict(), dict(max_tgt_cells=256), dict(ghost=True)):
        a, ofl_a = neighbor.within_mask(
            jnp.asarray(coords), None, jnp.asarray(tgt), cutoff=0.5,
            box=jnp.asarray(box.matrix), inv=jnp.asarray(box.inv),
            dims=dims, cap=32, tgt_cap=16, **kw,
        )
        b, ofl_b = neighbor.within_mask(
            jnp.asarray(coords), jnp.asarray(src), jnp.asarray(tgt),
            cutoff=0.5, box=jnp.asarray(box.matrix), inv=jnp.asarray(box.inv),
            dims=dims, cap=32, tgt_cap=16, **kw,
        )
        assert not bool(ofl_a) and not bool(ofl_b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # triclinic path too
    tb = PeriodicBox.from_vectors_angles(3.0, 3.2, 3.4, 75.0, 80.0, 70.0)
    tc = rng.uniform(0, 3, (300, 3)).astype(np.float32)
    tdims = neighbor.grid_dims(tb.box_extents(), 0.5)
    a, _ = neighbor.within_mask(
        jnp.asarray(tc), None, jnp.asarray(np.arange(0, 300, 5)), cutoff=0.5,
        box=jnp.asarray(tb.matrix), inv=jnp.asarray(tb.inv),
        corrections=jnp.asarray(tb.padded_corrections()), dims=tdims, cap=64,
    )
    b, _ = neighbor.within_mask(
        jnp.asarray(tc), jnp.asarray(np.arange(300)),
        jnp.asarray(np.arange(0, 300, 5)), cutoff=0.5,
        box=jnp.asarray(tb.matrix), inv=jnp.asarray(tb.inv),
        corrections=jnp.asarray(tb.padded_corrections()), dims=tdims, cap=64,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
