"""Exact Lee-Richards SASA on device (batched, fixed-capacity).

The reference's SASA is the exact PowerSasa power diagram
(molar/src/sasa.rs:14-122). Round 1 shipped exact Lee-Richards on host
(ops/sasa_host.py) and approximate Shrake-Rupley on device; this module is
the exact device formulation: the SAME Lee-Richards slicing as the host
ground truth, re-expressed as dense batched tensor math so it jits, vmaps
over frames, and runs on the TPU VPU:

* per atom: ``n_slices`` z-slabs relative to its own center (identical slab
  placement to the host, so parity is pure float error);
* per (atom, slice, neighbor): the neighbor's covering angular interval on
  the slice circle, wrap-split into two ``[lo, hi]`` slots in [-pi, pi];
* exact union length of the 2K intervals via lo-sort + running-cummax
  sweep: ``sum_i max(0, hi_i - max(lo_i, cummax_{j<i} hi_j))`` — the
  interval-union sweep is an associative scan, no data-dependent loops;
* exposed arc * R * dz accumulates the area (Lee-Richards band area).

Neighbor lists are fixed-capacity ``(N, K)`` index arrays (pad -1). For
trajectories, :func:`neighbor_lists` builds them host-side with a skin
margin (Verlet list): the list stays valid while no atom moved more than
``skin/2`` from its build position — check with :func:`max_displacement`
on device and rebuild on demand (same fixed-capacity + retry philosophy as
ops/neighbor.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pbc import PBC_NONE
from . import neighbor_host

DEFAULT_PROBE = 0.14


def neighbor_lists(
    coords: np.ndarray,
    radii: np.ndarray,
    cap: int,
    skin: float = 0.0,
) -> tuple[np.ndarray, bool]:
    """Host-side fixed-capacity neighbor lists for LR-SASA.

    Neighbors = atoms j with ``|xi - xj| < ri + rj + skin`` (the spheres
    whose expanded radii can clip atom i's circles while no atom has moved
    more than skin/2). Returns ((N, cap) int32 padded with -1, overflowed).
    """
    coords = np.asarray(coords, np.float64)
    radii = np.asarray(radii, np.float64)
    n = len(coords)
    out = np.full((n, cap), -1, np.int32)
    if n == 0:
        return out, False
    cut = float(2 * radii.max() + skin)
    pairs, _ = neighbor_host.search_pairs(
        cut, coords.astype(np.float32), np.arange(n), None, None, PBC_NONE
    )
    d = np.linalg.norm(coords[pairs[:, 0]] - coords[pairs[:, 1]], axis=1)
    keep = d < radii[pairs[:, 0]] + radii[pairs[:, 1]] + skin
    kept = pairs[keep]
    # Vectorized fixed-capacity fill: duplicate each pair in both directions,
    # sort by owner, rank within the owner's run (a Python loop over the
    # ~1M pair entries of a dense protein measured seconds per rebuild).
    owners = np.concatenate([kept[:, 0], kept[:, 1]])
    others = np.concatenate([kept[:, 1], kept[:, 0]]).astype(np.int32)
    order = np.argsort(owners, kind="stable")
    owners_s = owners[order]
    others_s = others[order]
    starts = np.searchsorted(owners_s, np.arange(n))
    rank = np.arange(len(owners_s)) - starts[owners_s]
    overflow = bool(np.any(rank >= cap))
    ok = rank < cap
    out[owners_s[ok], rank[ok]] = others_s[ok]
    return out, overflow


def max_displacement(coords, build_coords):
    """Max atom displacement since the neighbor list build (device scalar);
    the list is valid while this is < skin/2."""
    d = coords - build_coords
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))


def sasa(
    coords,
    radii,
    nbr,
    n_slices: int = 64,
    block: int = 2048,
):
    """Per-atom exact Lee-Richards SASA (device). One frame.

    ``coords`` (N,3), ``radii`` (N,) = vdw + probe, ``nbr`` (N,K) padded -1.
    ``n_slices``/``block`` static. Memory peaks at (block, S, 2K) — lower
    ``block`` for very large K. Matches ops/sasa_host.sasa with the same
    ``n_slices`` to float32 accuracy.
    """
    coords = jnp.asarray(coords)
    radii = jnp.asarray(radii, coords.dtype)
    n = coords.shape[0]
    k = nbr.shape[1]
    s = n_slices
    pi = jnp.asarray(np.pi, coords.dtype)

    pad = (-n) % block
    coords_p = jnp.pad(coords, ((0, pad), (0, 0)))
    radii_p = jnp.pad(radii, (0, pad), constant_values=1.0)
    nbr_p = jnp.pad(nbr, ((0, pad), (0, 0)), constant_values=-1)

    def one_block(args):
        ci, ri, nb = args  # (B,3), (B,), (B,K)
        valid_n = nb >= 0
        nbs = jnp.maximum(nb, 0)
        xj = coords_p[:, 0][nbs.reshape(-1)].reshape(nbs.shape)
        yj = coords_p[:, 1][nbs.reshape(-1)].reshape(nbs.shape)
        zj = coords_p[:, 2][nbs.reshape(-1)].reshape(nbs.shape)
        rj = radii_p[nbs.reshape(-1)].reshape(nbs.shape)
        dx = xj - ci[:, 0:1]  # (B,K)
        dy = yj - ci[:, 1:2]
        dxy = jnp.sqrt(dx * dx + dy * dy)
        theta = jnp.arctan2(dy, dx)  # (B,K)

        dz = 2 * ri / s  # (B,)
        ks = jnp.arange(s, dtype=coords.dtype) + 0.5
        zrel = -ri[:, None] + dz[:, None] * ks[None, :]  # (B,S) z - zi
        rk2 = ri[:, None] ** 2 - zrel**2
        rk = jnp.sqrt(jnp.maximum(rk2, 0.0))  # (B,S)
        slice_live = rk2 > 0

        # neighbor circle radius in each slab: (B,S,K)
        dzj = (ci[:, 2:3, None] + zrel[:, :, None]) - zj[:, None, :]
        cj2 = rj[:, None, :] ** 2 - dzj * dzj
        cj = jnp.sqrt(jnp.maximum(cj2, 0.0))
        act = valid_n[:, None, :] & (cj2 > 0) & slice_live[:, :, None]

        d3 = dxy[:, None, :]
        r3 = rk[:, :, None]
        no_ovl = d3 >= r3 + cj
        fully = (d3 + r3 <= cj) & act
        inside = d3 + cj <= r3
        covers = act & ~no_ovl & ~fully & ~inside

        denom = jnp.where(covers, 2 * d3 * r3, 1.0)
        cos_half = jnp.clip((d3 * d3 + r3 * r3 - cj * cj) / denom, -1.0, 1.0)
        half = jnp.arccos(cos_half)
        lo = theta[:, None, :] - half
        hi = theta[:, None, :] + half
        # Wrap-split into two interval slots per neighbor. Empty slots get
        # the negative-length sentinel [pi, -pi] (zero contribution in the
        # sweep, never raises the running cummax). A neighbor wraps on at
        # most one side, so the two wrap pieces share one slot via min/max.
        lo1 = jnp.where(covers, jnp.maximum(lo, -pi), pi)
        hi1 = jnp.where(covers, jnp.minimum(hi, pi), -pi)
        lo_wrap = covers & (lo < -pi)
        hi_wrap = covers & (hi > pi)
        lo2 = jnp.where(lo_wrap, lo + 2 * pi, pi)
        hi2 = jnp.where(lo_wrap, pi, -pi)
        lo3 = jnp.where(hi_wrap, -pi, pi)
        hi3 = jnp.where(hi_wrap, hi - 2 * pi, -pi)
        los = jnp.concatenate([lo1, jnp.minimum(lo2, lo3)], axis=2)
        his = jnp.concatenate([hi1, jnp.maximum(hi2, hi3)], axis=2)

        # union sweep: sort by lo, running cummax of hi. Key-value lax.sort
        # (not argsort + take_along_axis: the two (B, S, 2K) computed-index
        # gathers were both slow and implicated in a TPU worker crash at
        # K ~ 300 on the 50k-atom workload).
        lo_s, hi_s = jax.lax.sort((los, his), dimension=2, num_keys=1)
        cum = jax.lax.associative_scan(jnp.maximum, hi_s, axis=2)
        prev = jnp.concatenate(
            [jnp.full(cum[:, :, :1].shape, -pi), cum[:, :, :-1]], axis=2
        )
        contrib = jnp.maximum(0.0, hi_s - jnp.maximum(lo_s, prev))
        union = jnp.sum(contrib, axis=2)  # (B,S)

        any_full = jnp.any(fully, axis=2)
        exposed = jnp.where(
            slice_live & ~any_full, 2 * pi - union, 0.0
        )
        return jnp.sum(exposed, axis=1) * ri * dz  # (B,)

    blocks = jax.lax.map(
        one_block,
        (
            coords_p.reshape(-1, block, 3),
            radii_p.reshape(-1, block),
            nbr_p.reshape(-1, block, k),
        ),
    )
    return blocks.reshape(-1)[:n]


class SasaSeries:
    """Reusable exact-SASA evaluator for trajectories (device).

    The reference PowerSasa keeps its power diagram alive and ``update``-s it
    per frame (molar/src/sasa.rs:52-121); the TPU-era analog keeps a
    fixed-capacity Verlet neighbor list alive and rebuilds it only when any
    atom drifted more than skin/2 from its build position. ``update(coords)``
    returns the exact per-atom areas for the new coordinates.

    >>> ss = SasaSeries(coords0, vdw, probe=0.14)
    >>> areas_t = [np.asarray(ss.update(c)) for c in frames]
    """

    def __init__(
        self,
        coords,
        vdw,
        probe: float = DEFAULT_PROBE,
        skin: float = 0.2,
        n_slices: int = 64,
        cap: int = 96,
        block: int = 2048,
    ):
        self.radii_np = np.asarray(vdw, np.float64) + probe
        self.skin = skin
        self.n_slices = n_slices
        self.block = block
        self.cap = cap
        self.rebuilds = 0
        self._build(np.asarray(coords, np.float64))

    def _build(self, coords) -> None:
        while True:
            nbr, overflow = neighbor_lists(
                coords, self.radii_np, cap=self.cap, skin=self.skin
            )
            if not overflow:
                break
            self.cap += max(self.cap // 2, 16)
        self._nbr = jnp.asarray(nbr)
        self._build_coords = jnp.asarray(coords, jnp.float32)
        self._radii = jnp.asarray(self.radii_np, jnp.float32)

    def update(self, coords):
        """Exact per-atom SASA for new coordinates, reusing the neighbor
        list while it is still valid (drift < skin/2)."""
        c = jnp.asarray(coords, jnp.float32)
        if float(max_displacement(c, self._build_coords)) >= self.skin / 2:
            self.rebuilds += 1
            self._build(np.asarray(coords, np.float64))
        return sasa(
            c, self._radii, self._nbr, n_slices=self.n_slices, block=self.block
        )

    def areas(self, coords):
        return self.update(coords)
