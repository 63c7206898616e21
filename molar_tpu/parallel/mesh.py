"""Multi-chip execution: frames sharded over a device mesh.

The reference is single-node Rayon; its TPU-native re-expression (SURVEY §2.7)
shards the **frame axis** — trajectory analysis is embarrassingly parallel
over frames, so a window ``(B, N, 3)`` splits B/n_devices per chip, topology
index arrays replicate, and the only cross-chip communication is the
reduction of time-averaged observables (mean RMSD, histograms, order
parameters), which XLA lowers to `psum` over ICI.

Usage:

    mesh = frame_mesh()                        # all local devices
    fn = sharded_window_fn(window_fn, mesh)    # jit with frame shardings
    out = fn(*shard_window(mesh, coords, boxes, invs, times))

``window_fn`` stays an ordinary per-window function (scan/vmap over its
leading frame axis); per-frame outputs come back frame-sharded, window-level
scalars (means) replicated.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAMES = "frames"


def frame_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(FRAMES,))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FRAMES))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_window(mesh: Mesh, *arrays):
    """device_put window arrays with the leading (frame) axis sharded.

    The frame count must divide the mesh size; the trajectory pipeline pads
    ragged tails (FrameBatch.valid) before sharding.
    """
    fs = frame_sharding(mesh)
    return tuple(jax.device_put(a, fs) for a in arrays)


def sharded_window_fn(
    window_fn: Callable,
    mesh: Mesh,
    n_frame_args: int = 4,
    replicated_outs: tuple = (),
) -> Callable:
    """jit ``window_fn`` with its first ``n_frame_args`` args sharded over the
    frame axis. Outputs stay frame-sharded unless listed (by index) in
    ``replicated_outs`` (e.g. window-level scalar reductions)."""
    fs = frame_sharding(mesh)
    return jax.jit(window_fn, in_shardings=(fs,) * n_frame_args)


def pad_to_multiple(arrays, times, multiple: int):
    """Pad the leading frame axis to a device-count multiple; returns
    (padded arrays, valid mask). Padding repeats the last frame, and the
    mask excludes it from reductions."""
    b = arrays[0].shape[0]
    rem = (-b) % multiple
    valid = np.ones(b + rem, dtype=bool)
    if rem == 0:
        return arrays, valid
    valid[b:] = False
    out = []
    for a in arrays:
        pad = np.repeat(a[-1:], rem, axis=0)
        out.append(np.concatenate([a, pad], axis=0))
    return tuple(out), valid


# ---------------------------------------------------------------------------
# 2-D (frames x atoms) sharding: systems too large for one chip's HBM
# ---------------------------------------------------------------------------

ATOMS = "atoms"


def frame_atom_mesh(n_frame_devices: int, n_atom_devices: int) -> Mesh:
    """2-D mesh: the frame axis is the embarrassingly parallel one; the atom
    axis splits a single frame's coordinates across chips (for systems whose
    (B, N, 3) window exceeds one chip's HBM) with `psum` reductions riding
    ICI for per-frame observables."""
    devs = jax.devices()
    n = n_frame_devices * n_atom_devices
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    grid = np.array(devs[:n]).reshape(n_frame_devices, n_atom_devices)
    return Mesh(grid, axis_names=(FRAMES, ATOMS))


def com_gyration_sharded(mesh: Mesh) -> Callable:
    """Per-frame COM + radius of gyration over a (frames, atoms)-sharded
    window: each chip reduces its local atom shard, `psum` over the atom
    axis completes the moments (non-PBC variant; measure.rs:120-168).

    Returns a jitted ``fn(coords (B, N, 3), masses (N,)) -> (com (B, 3),
    gyration (B,))`` whose outputs are frame-sharded.
    """
    from functools import partial

    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(FRAMES, ATOMS, None), P(ATOMS)),
        out_specs=(P(FRAMES), P(FRAMES)),
    )
    def kernel(coords, masses):
        # local shard: coords (B/nf, N/na, 3), masses (N/na,)
        msum = jax.lax.psum(jnp.sum(masses), ATOMS)
        # weighted coordinate sums, accumulated elementwise (MXU bf16 trap)
        wsum = jax.lax.psum(
            jnp.sum(coords * masses[None, :, None], axis=1), ATOMS
        )
        com = wsum / msum  # (B_local, 3), identical on every atom shard
        d = coords - com[:, None, :]
        g2 = jax.lax.psum(
            jnp.sum(jnp.sum(d * d, axis=-1) * masses[None, :], axis=1), ATOMS
        )
        return com, jnp.sqrt(g2 / msum)

    return jax.jit(kernel)
