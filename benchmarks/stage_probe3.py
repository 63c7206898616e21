#!/usr/bin/env python
"""Layout experiment: sparse stencil with T-minor (full-lane) blocks.

The production sparse stencil computes (T, cap, tcap) blocks whose minor
axis is tcap=32 — only a quarter of the 128 VPU lanes. This variant
transposes the block to (cap, tcap, T) so the minor axis is the occupied-
cell count (multiple of 128), at the price of two relayouts per offset.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/molar_tpu/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from bench import make_system
    from molar_tpu.core.pbc import PBC_FULL, PeriodicBox
    from molar_tpu.ops import neighbor as nb
    from molar_tpu.ops import neighbor_host

    box = PeriodicBox(np.diag([10.0] * 3).astype(np.float32))
    coords0, _ = make_system(100_000, 5_000, 10.0)
    rng = np.random.default_rng(2)
    W = 16
    frames = np.stack(
        [coords0 + rng.normal(0, 0.02, coords0.shape).astype(np.float32)
         for _ in range(W)]
    )
    dims = (20, 20, 20)
    n_cells = 8000
    cap, tcap, T = 48, 32, 768
    aidx = jnp.asarray(np.arange(100_000))
    pidx = jnp.asarray(np.arange(5_000))
    fj = jax.device_put(jnp.asarray(frames))
    bj = jax.device_put(jnp.asarray(box.matrix))
    ij = jax.device_put(jnp.asarray(box.inv))
    offs_j = jnp.asarray(nb._OFFSETS)
    pbc = (True, True, True)

    def within_tmin(coords):
        x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
        src = jnp.stack([x[aidx], y[aidx], z[aidx]], axis=-1)
        tgt = jnp.stack([x[pidx], y[pidx], z[pidx]], axis=-1)
        sfx, sfy, sfz = nb._wrap_frac(src, ij)
        tfx, tfy, tfz = nb._wrap_frac(tgt, ij)
        sx, sy, sz = nb._apply3(bj, sfx, sfy, sfz)
        tx, ty, tz = nb._apply3(bj, tfx, tfy, tfz)
        scx, scy, scz = nb._cell3(sfx, sfy, sfz, dims)
        sflat = (scx * dims[1] + scy) * dims[2] + scz
        tcx, tcy, tcz = nb._cell3(tfx, tfy, tfz, dims)
        tflat = (tcx * dims[1] + tcy) * dims[2] + tcz
        big_s = jnp.float32(-1e17)
        big_t = jnp.float32(1e17)
        (sxb, syb, szb), s_slot, s_order, s_ofl = nb._blocked_planes(
            [sx, sy, sz], sflat, n_cells, cap, [big_s] * 3
        )
        (txb, tyb, tzb), _, _, t_ofl = nb._blocked_planes(
            [tx, ty, tz], tflat, n_cells, tcap, [big_t] * 3
        )
        sorted_t = jnp.sort(tflat)
        is_first = jnp.concatenate(
            [jnp.ones(1, bool), sorted_t[1:] != sorted_t[:-1]]
        )
        (occ_pos,) = jnp.nonzero(is_first, size=T, fill_value=-1)
        occ_ofl = jnp.sum(is_first) > T
        occ_valid = occ_pos >= 0
        occ = jnp.where(occ_valid, sorted_t[jnp.maximum(occ_pos, 0)], 0)
        ocx = occ // (dims[1] * dims[2])
        ocy = (occ // dims[2]) % dims[1]
        ocz = occ % dims[2]
        pad = ~occ_valid[None, None, :]
        # T-minor layout: (1, tcap, T)
        otx = jnp.where(pad, big_t, txb[occ].T[None, :, :])
        oty = jnp.where(pad, big_t, tyb[occ].T[None, :, :])
        otz = jnp.where(pad, big_t, tzb[occ].T[None, :, :])
        c2 = jnp.float32(0.25)

        def body(o, hit_blocks):
            off = offs_j[o]
            scells, (shx, shy, shz), ok = nb._cells_shift(
                ocx, ocy, ocz, off, dims, pbc, bj, jnp.float32
            )
            # (cap, 1, T) source planes, T-minor
            nsx = sxb[scells].T[:, None, :] + shx[None, None, :]
            nsy = syb[scells].T[:, None, :] + shy[None, None, :]
            nsz = szb[scells].T[:, None, :] + shz[None, None, :]
            dx = otx - nsx
            dy = oty - nsy
            dz = otz - nsz
            d2 = dx * dx + dy * dy + dz * dz
            hit = jnp.any(d2 <= c2, axis=1) & ok[None, :]  # (cap, T)
            return hit_blocks.at[scells].max(hit.T)

        hit_blocks = jax.lax.fori_loop(
            0, 27, body, jnp.zeros((n_cells, cap), dtype=bool)
        )
        hit_sorted = hit_blocks.reshape(-1)[s_slot]
        mask = (
            jnp.zeros(src.shape[0], dtype=bool)
            .at[s_order]
            .set(hit_sorted, unique_indices=True)
        )
        return jnp.sum(mask), s_ofl | t_ofl | occ_ofl

    @jax.jit
    def run(fr):
        def body(carry, c):
            return carry, within_tmin(c)
        _, out = jax.lax.scan(body, 0, fr)
        return out

    t0 = time.perf_counter()
    counts, ofl = jax.block_until_ready(run(fj))
    tc = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(fj))
        best = min(best, time.perf_counter() - t0)
    print(f"within T-minor sparse: {best / W * 1e3:.2f} ms/frame "
          f"(compile {tc:.1f}s) count0={int(counts[0])} "
          f"overflow={bool(np.asarray(ofl).any())}")
    want = neighbor_host.search_within(
        0.5, frames[0], np.arange(100_000), np.arange(5_000), box, PBC_FULL
    )
    print("host count0 =", len(want), "parity", int(counts[0]) == len(want))


if __name__ == "__main__":
    main()
