#!/usr/bin/env python
"""Isolated per-stage device timings for the headline pipeline.

Times the within_mask sparse-target search and the Kabsch fit on resident
device data (no host decode, no H2D) at the bench.py configuration, so the
per-frame compute budget in docs/perf_notes.md is auditable separately from
transport. One TPU process at a time (CLAUDE.md).

Usage: python benchmarks/stage_probe.py [--atoms N] [--window W] [--cpu]
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
        "molar_tpu",
        "jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from bench import make_system
    from molar_tpu.core.pbc import PeriodicBox
    from molar_tpu.ops import measure, neighbor

    box = PeriodicBox(np.diag([args.box] * 3).astype(np.float32))
    coords0, masses = make_system(args.atoms, args.protein, args.box)
    rng = np.random.default_rng(2)
    frames = np.stack(
        [coords0 + rng.normal(0, 0.02, coords0.shape).astype(np.float32)
         for _ in range(args.window)]
    )
    protein_idx = jnp.asarray(np.arange(args.protein))
    all_idx = jnp.asarray(np.arange(args.atoms))
    ref = jnp.asarray(coords0[: args.protein])
    pm = jnp.asarray(masses[: args.protein])

    dims = neighbor.grid_dims(box.box_extents(), args.cutoff)
    inv = box.inv
    frac = (coords0 @ inv.T) % 1.0
    cell = tuple(
        np.minimum((frac[:, d] * dims[d]).astype(np.int64), dims[d] - 1)
        for d in range(3)
    )
    flat = (cell[0] * dims[1] + cell[1]) * dims[2] + cell[2]
    cnt = np.bincount(flat, minlength=dims[0] * dims[1] * dims[2])
    tc = np.bincount(flat[: args.protein], minlength=dims[0] * dims[1] * dims[2])
    cap = (int(cnt.max() * 1.2) + 2 + 7) // 8 * 8
    tcap = (int(tc.max() * 1.2) + 2 + 7) // 8 * 8
    tcells = max(512, (int((tc > 0).sum() * 1.25) + 255) // 256 * 256)
    print(f"# dims={dims} cap={cap} tcap={tcap} tgt_cells={tcells}", file=sys.stderr)

    fj = jax.device_put(jnp.asarray(frames))
    bj = jax.device_put(jnp.asarray(box.matrix))
    ij = jax.device_put(jnp.asarray(box.inv))

    def scan_stage(name, frame_fn):
        @jax.jit
        def run(fr):
            def body(carry, c):
                return carry, frame_fn(c)
            _, out = jax.lax.scan(body, 0, fr)
            return out

        t0 = time.perf_counter()
        r = jax.block_until_ready(run(fj))
        t_compile = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = jax.block_until_ready(run(fj))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.window * 1e3
        print(f"{name:28s} {ms:7.2f} ms/frame   (compile {t_compile:.1f}s)")
        return ms

    def within_sparse(c):
        mask, ofl = neighbor.within_mask(
            c, all_idx, protein_idx, cutoff=args.cutoff, box=bj, inv=ij,
            dims=dims, cap=cap, tgt_cap=tcap, max_tgt_cells=tcells,
        )
        return jnp.sum(mask), ofl

    def within_dense(c):
        mask, ofl = neighbor.within_mask(
            c, all_idx, protein_idx, cutoff=args.cutoff, box=bj, inv=ij,
            dims=dims, cap=cap, tgt_cap=tcap,
        )
        return jnp.sum(mask), ofl

    def within_ghost(c):
        mask, ofl = neighbor.within_mask(
            c, all_idx, protein_idx, cutoff=args.cutoff, box=bj, inv=ij,
            dims=dims, cap=cap, tgt_cap=tcap, ghost=True,
        )
        return jnp.sum(mask), ofl

    def fit(c):
        sel = jnp.stack(
            [c[:, 0][protein_idx], c[:, 1][protein_idx], c[:, 2][protein_idx]],
            axis=-1,
        )
        rmsd, _, _ = measure.fit_rmsd(sel, ref, pm)
        return rmsd

    def full(c):
        return fit(c), within_sparse(c)

    t_w = scan_stage("within_mask sparse", within_sparse)
    t_g = scan_stage("within_mask ghost", within_ghost)
    t_f = scan_stage("fit_rmsd", fit)
    t_all = scan_stage("fit + within (pipeline)", full)
    t_d = scan_stage("within_mask dense", within_dense)
    print(f"# ceiling at zero overhead: {1e3 / t_all:.1f} fps")


if __name__ == "__main__":
    main()
