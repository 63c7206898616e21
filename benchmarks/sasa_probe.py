#!/usr/bin/env python
"""SASA kernel probe: where does exact device Lee-Richards time go?

Round-2 measured 0.41 fps at the 50k-atom workload (4k-atom dense ALA ball,
K~330 neighbors). Arithmetic points at the per-(atom, slice) `lax.sort` over
2K~670 interval slots (bitonic over the minor/lane axis) as the dominant
term. Variants probed here (all exact, parity-checked against production):

  base    — ops/sasa_lr.sasa as shipped
  axis0   — same math, but the interval axis transposed to the MAJOR axis
            before sort+scan (each bitonic stage becomes a full-width
            row-select instead of lane shuffles; the transposes themselves
            are the price)
  band    — z-banded neighbor compaction: neighbors sorted by dz once per
            atom (host, at list build), slices grouped into G consecutive
            bands, each band gathers only the W << K neighbors active in
            its z-range, so the sort runs at 2W instead of 2K slots.

Usage: python benchmarks/sasa_probe.py [--atoms 50000] [--frames 4] [--cpu]
Prints ms/frame per variant; run on a QUIET machine (one process per TPU).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=50_000)
    ap.add_argument("--protein", type=int, default=4_000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--slices", type=int, default=32)
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip", default="", help="comma list of variants to skip")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os

    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "molar_tpu", "jax_cache",
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from benchmarks.workloads import _synth_system
    from molar_tpu.ops import sasa_lr

    system = _synth_system(args.atoms, args.protein)
    sel = system("resname ALA")
    radii_np = sel.topology.vdw()[sel.indices].astype(np.float64) + 0.14
    radii = jnp.asarray(radii_np, jnp.float32)
    idx = sel.indices
    c0 = system.state.coords[idx].astype(np.float64)

    cap = 96
    while True:
        nb, ofl = sasa_lr.neighbor_lists(c0, radii_np, cap=cap, skin=0.3)
        if not ofl:
            break
        cap += 48
    print(f"# n_sel={len(idx)} cap={cap} slices={args.slices}", file=sys.stderr)
    nbj = jnp.asarray(nb)
    cj = jnp.asarray(c0, jnp.float32)

    skip = set(args.skip.split(",")) if args.skip else set()
    results = {}

    def timeit(name, fn):
        if name in skip:
            return
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jax.block_until_ready(fn())
        ms = (time.perf_counter() - t0) / args.reps * 1000
        results[name] = (np.asarray(out), ms)
        print(f"# {name}: {ms:.1f} ms/frame (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)

    f_base = jax.jit(lambda c: sasa_lr.sasa(
        c, radii, nbj, n_slices=args.slices, block=args.block))
    timeit("base", lambda: f_base(cj))

    f_axis0 = jax.jit(lambda c: sasa_lr.sasa(
        c, radii, nbj, n_slices=args.slices, block=args.block,
        sort_axis0=True))
    timeit("axis0", lambda: f_axis0(cj))

    if "band" not in skip and hasattr(sasa_lr, "sasa_banded"):
        nbz, starts, W, G = sasa_lr.band_neighbor_lists(
            c0, radii_np, nb, n_slices=args.slices, n_bands=8
        )
        print(f"# band: W={W} G={G}", file=sys.stderr)
        nbzj = jnp.asarray(nbz)
        stj = jnp.asarray(starts)
        f_band = jax.jit(lambda c: sasa_lr.sasa_banded(
            c, radii, nbzj, stj, W, G, n_slices=args.slices,
            block=args.block))
        timeit("band", lambda: f_band(cj))

    base = results.get("base")
    for name, (out, ms) in results.items():
        if base is not None and name != "base":
            err = float(np.max(np.abs(out - base[0])))
            print(f"# {name} vs base max |err| = {err:.2e}", file=sys.stderr)
    print({k: round(v[1], 1) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
