#!/usr/bin/env python
"""Pipeline wall decomposition for the headline bench (one process).

Measures, back-to-back on the same trajectory and compiled program:

  decode    — drain iter_windows (delta transport), no device at all
  put       — decode + device_put per window, synced at the end
  exec      — window program on resident data (compute ceiling)
  stream    — the production WindowPipeline (decode+put feeder overlapping
              dispatches)

The difference stream - max(decode, put, exec-chain) is the interleaving /
RPC-serialization cost the round-2/3 campaigns chase. Run on a QUIET host.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=100_000)
    ap.add_argument("--protein", type=int, default=5_000)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "molar_tpu", "jax_cache",
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import tempfile

    import jax.numpy as jnp

    from bench import _estimate_caps, make_system, make_trajectory
    from molar_tpu.core.pbc import PeriodicBox
    from molar_tpu.ops import measure, neighbor
    from molar_tpu.tasks.trajectory import (
        TrajectoryReader,
        WindowPipeline,
        decode_window_coords,
    )

    box = PeriodicBox(np.diag([10.0] * 3).astype(np.float32))
    coords0, masses = make_system(args.atoms, args.protein, 10.0)
    tmp = tempfile.mkdtemp(prefix="molar_pp_")
    xtc = os.path.join(tmp, "t.xtc")
    make_trajectory(xtc, coords0, box.matrix, args.frames)
    pidx = np.arange(args.protein)
    ref = jnp.asarray(coords0[pidx])
    pm = jnp.asarray(masses[pidx])
    pidx_j = jnp.asarray(pidx)
    dims = neighbor.grid_dims(box.box_extents(), 0.5)
    cap0, tcap0, cells0 = _estimate_caps(xtc, box, pidx, dims)
    cap = (int(cap0 * 1.2) + 2 + 7) // 8 * 8
    tcap = (int(tcap0 * 1.2) + 2 + 7) // 8 * 8
    cells = max(512, (int(cells0 * 1.25) + 255) // 256 * 256)

    @jax.jit
    def window_fn(coords, boxes, invs, times):
        coords = decode_window_coords(coords)

        def per_frame(carry, fr):
            c, b, i = fr
            sel = jnp.stack([c[:, 0][pidx_j], c[:, 1][pidx_j], c[:, 2][pidx_j]], -1)
            rmsd, _, _ = measure.fit_rmsd(sel, ref, pm)
            mask, ofl = neighbor.within_mask(
                c, None, pidx_j, cutoff=0.5, box=b, inv=i, dims=dims,
                cap=cap, tgt_cap=tcap, max_tgt_cells=cells,
            )
            return carry, (rmsd, jnp.sum(mask), ofl)

        return jax.lax.scan(per_frame, 0, (coords, boxes, invs))[1]

    reader = TrajectoryReader([xtc])

    def decode_pass():
        n = 0
        for w in reader.iter_windows(args.window, quantized="delta"):
            n += len(w[3])
        return n

    def put_pass():
        refs = []
        n = 0
        for c, b, i, t, ids in reader.iter_windows(args.window, quantized="delta"):
            refs.append(jax.device_put((c, b, i, t)))
            n += len(ids)
        jax.block_until_ready(refs)
        return n, refs

    # warm compile
    n, refs = put_pass()
    out = jax.block_until_ready(window_fn(*refs[0]))
    print("# compiled", file=sys.stderr)

    results = {}

    def timed(name, fn):
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        print(f"# {name}: best {best:.2f}s = {args.frames / best:.1f} fps",
              file=sys.stderr, flush=True)

    timed("decode", decode_pass)

    def put_only():
        _, r = put_pass()
        del r

    timed("put", put_only)

    def exec_resident():
        outs = [window_fn(*r) for r in refs]
        jax.block_until_ready(outs)

    timed("exec", exec_resident)

    def stream():
        outs = []
        for ids, r in WindowPipeline(
            reader, args.window, window_fn, quantized="delta"
        ).run():
            outs.append(r)
        jax.block_until_ready(outs)

    timed("stream", stream)

    print({k: round(v, 2) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
