#!/usr/bin/env python
"""Sub-stage timings inside within_mask (sparse-target, bench config).

Splits the 9-10 ms/frame within_mask into: cell ids, argsort+rank, plane
scatters, occupied-cell list, stencil loop, and mask unsort — each timed as
its own scanned jit on resident device data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=100_000)
    ap.add_argument("--protein", type=int, default=5_000)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--cutoff", type=float, default=0.5)
    ap.add_argument("--box", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "molar_tpu", "jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from bench import make_system
    from molar_tpu.core.pbc import PeriodicBox
    from molar_tpu.ops import neighbor as nb

    box = PeriodicBox(np.diag([args.box] * 3).astype(np.float32))
    coords0, masses = make_system(args.atoms, args.protein, args.box)
    rng = np.random.default_rng(2)
    frames = np.stack(
        [coords0 + rng.normal(0, 0.02, coords0.shape).astype(np.float32)
         for _ in range(args.window)]
    )
    dims = (20, 20, 20)
    n_cells = dims[0] * dims[1] * dims[2]
    cap, tcap, tcells = 48, 32, 768
    pidx = jnp.asarray(np.arange(args.protein))
    aidx = jnp.asarray(np.arange(args.atoms))

    fj = jax.device_put(jnp.asarray(frames))
    bj = jax.device_put(jnp.asarray(box.matrix))
    ij = jax.device_put(jnp.asarray(box.inv))

    def scan_stage(name, frame_fn):
        @jax.jit
        def run(fr):
            def body(carry, c):
                out = frame_fn(c)
                red = jax.tree_util.tree_map(
                    lambda a: a.ravel()[0] if a.ndim else a, out
                )
                return carry, red
            _, out = jax.lax.scan(body, 0, fr)
            return out

        t0 = time.perf_counter()
        jax.block_until_ready(run(fj))
        t_compile = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(fj))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.window * 1e3
        print(f"{name:32s} {ms:7.2f} ms/frame   (compile {t_compile:.1f}s)")
        return ms

    # -- pieces mirroring within_mask's fast sparse path ---------------------
    def cells_of(c, idx):
        sub = c[idx]
        fx, fy, fz = nb._wrap_frac(sub, ij)
        sx, sy, sz = nb._apply3(bj, fx, fy, fz)
        cx, cy, cz = nb._cell3(fx, fy, fz, dims)
        flat = (cx * dims[1] + cy) * dims[2] + cz
        return (sx, sy, sz), flat

    def src_cells(c):
        (sx, sy, sz), flat = cells_of(c, aidx)
        return sx + sy + sz, flat

    def src_sort(c):
        (sx, sy, sz), flat = cells_of(c, aidx)
        order = jnp.argsort(flat)
        sorted_flat = flat[order]
        rank = nb._rank_in_run(sorted_flat)
        return sorted_flat, rank

    def src_planes(c):
        (sx, sy, sz), flat = cells_of(c, aidx)
        planes, slot, order, ofl = nb._blocked_planes(
            [sx, sy, sz], flat, n_cells, cap,
            [jnp.float32(-1e17)] * 3,
        )
        return planes[0], ofl

    def both_planes_occ(c):
        (sx, sy, sz), flat = cells_of(c, aidx)
        planes, slot, order, ofl = nb._blocked_planes(
            [sx, sy, sz], flat, n_cells, cap, [jnp.float32(-1e17)] * 3
        )
        (tx, ty, tz), tflat = cells_of(c, pidx)
        tplanes, _, _, tofl = nb._blocked_planes(
            [tx, ty, tz], tflat, n_cells, tcap, [jnp.float32(1e17)] * 3
        )
        sorted_t = jnp.sort(tflat)
        is_first = jnp.concatenate([jnp.ones(1, bool), sorted_t[1:] != sorted_t[:-1]])
        (occ_pos,) = jnp.nonzero(is_first, size=tcells, fill_value=-1)
        return planes[0], tplanes[0], occ_pos, ofl | tofl

    def full(c):
        mask, ofl = nb.within_mask(
            c, aidx, pidx, cutoff=args.cutoff, box=bj, inv=ij,
            dims=dims, cap=cap, tgt_cap=tcap, max_tgt_cells=tcells,
        )
        return jnp.sum(mask), ofl

    t1 = scan_stage("cell ids (wrap+bin, 100k)", src_cells)
    t2 = scan_stage("+ argsort + rank", src_sort)
    t3 = scan_stage("+ 3 plane scatters (src)", src_planes)
    t4 = scan_stage("+ tgt planes + occ list", both_planes_occ)
    t5 = scan_stage("within_mask sparse (full)", full)
    print(f"# deltas: sort={t2-t1:.2f} scatters={t3-t2:.2f} "
          f"tgt+occ={t4-t3:.2f} stencil+unsort={t5-t4:.2f}")


if __name__ == "__main__":
    main()
