"""Device (JAX) SASA: Shrake-Rupley sphere sampling, vmappable over frames.

The trajectory-throughput counterpart of the exact host Lee-Richards
implementation (:mod:`molar_tpu.ops.sasa_host`): each solvent-expanded sphere
carries a fixed Fibonacci point set; a point is accessible iff it lies outside
every neighbor sphere. Per-atom area = 4 pi R^2 * accessible_fraction.
Sampling error ~ O(1/sqrt(P)) per atom (~1% at P=960); the shapes are fully
static ((N, K) neighbor lists, (P, 3) points), so whole frame windows jit and
vmap — SASA time series over a trajectory is one fused program per window.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pbc import PBC_NONE
from . import neighbor_host

DEFAULT_PROBE = 0.14


def fibonacci_sphere(n: int) -> np.ndarray:
    """(n, 3) well-distributed unit sphere points (golden spiral)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = np.pi * (1 + 5**0.5)
    theta = golden * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=1,
    ).astype(np.float32)


def neighbor_matrix(
    coords: np.ndarray, radii: np.ndarray, cap: int = 64
) -> tuple[np.ndarray, bool]:
    """Host helper: (N, cap) neighbor indices (-1 padded) of overlapping
    solvent-expanded spheres. Returns (matrix, overflowed)."""
    n = len(coords)
    idx = np.arange(n)
    max_r = float(np.max(radii))
    pairs, _ = neighbor_host.search_pairs(
        2 * max_r, np.asarray(coords, np.float32), idx, None, None, PBC_NONE
    )
    d = np.linalg.norm(coords[pairs[:, 0]] - coords[pairs[:, 1]], axis=1)
    keep = d < radii[pairs[:, 0]] + radii[pairs[:, 1]]
    pairs = pairs[keep]
    out = np.full((n, cap), -1, dtype=np.int32)
    counts = np.zeros(n, dtype=np.int64)
    overflow = False
    for a, b in np.concatenate([pairs, pairs[:, ::-1]]):
        if counts[a] < cap:
            out[a, counts[a]] = b
            counts[a] += 1
        else:
            overflow = True
    return out, overflow


@partial(jax.jit, static_argnames=("n_points",))
def shrake_rupley(coords, radii, neighbors, n_points: int = 960):
    """Per-atom SASA.

    coords (..., N, 3), radii (N,), neighbors (N, K) int32 (-1 padded,
    host-built per frame or reused across a window when topology-stable).
    Leading batch dims broadcast (vmap-free batching via einsum-style ops).
    """
    pts = jnp.asarray(fibonacci_sphere(n_points))  # (P, 3)

    def one_frame(c):
        # sample points on each sphere: (N, P, 3)
        sp = c[:, None, :] + radii[:, None, None] * pts[None, :, :]
        nb = jnp.maximum(neighbors, 0)  # (N, K)
        nb_valid = neighbors >= 0
        nc = c[nb]  # (N, K, 3)
        nr = radii[nb]  # (N, K)
        d2 = jnp.sum((sp[:, None, :, :] - nc[:, :, None, :]) ** 2, axis=-1)  # (N,K,P)
        buried = jnp.any(
            nb_valid[:, :, None] & (d2 < (nr**2)[:, :, None]), axis=1
        )  # (N, P)
        frac = 1.0 - jnp.mean(buried, axis=1)
        return 4.0 * jnp.pi * radii**2 * frac

    if coords.ndim == 2:
        return one_frame(coords)
    return jax.vmap(one_frame)(coords)
