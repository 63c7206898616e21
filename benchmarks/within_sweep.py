#!/usr/bin/env python
"""Cutoff sweep for the within search (reference benches/within_size_bench.rs:
d = 0.3..4.2 over targets of increasing size).

    python benchmarks/within_sweep.py -f structure.pdb [--targets N ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("--cutoffs", type=float, nargs="+",
                    default=[0.3, 0.6, 1.0, 1.5, 2.0, 3.0, 4.2])
    ap.add_argument("--targets", type=int, nargs="+", default=[1, 20, 40, 60],
                    help="number of leading residues in the target selection")
    ap.add_argument("--device", action="store_true", help="time the jitted kernel")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--host-max-cutoff", type=float, default=1.5,
                    help="skip host timing above this cutoff: near-single-cell "
                    "grids make the host search O(n*m) per rep (protein.pdb at "
                    "4.2 nm measured >25 min), while the device grid stays "
                    "fixed-shape")
    args = ap.parse_args()

    from molar_tpu import PBC_FULL, System
    from molar_tpu.ops import neighbor_host

    sys_ = System.from_file(args.file)
    st = sys_.state
    resindex = sys_.topology.resindex
    out = {}
    for nres in args.targets:
        tgt = np.nonzero(resindex < nres)[0]
        if len(tgt) == 0:
            continue
        for cutoff in args.cutoffs:
            if cutoff > args.host_max_cutoff:
                continue
            t0 = time.perf_counter()
            for _ in range(args.reps):
                found = neighbor_host.search_within(
                    cutoff, st.coords, np.arange(sys_.n_atoms), tgt, st.box, PBC_FULL
                )
            el = (time.perf_counter() - t0) / args.reps
            out[f"host_res{nres}_d{cutoff}"] = {
                "ms": round(el * 1000, 2),
                "hits": int(len(found)),
            }
    if args.device:
        import jax
        import jax.numpy as jnp

        from molar_tpu.ops import neighbor

        for nres in args.targets:
            tgt_np = np.nonzero(resindex < nres)[0]
            tgt = jnp.asarray(tgt_np)
            aidx = jnp.arange(sys_.n_atoms)
            for cutoff in args.cutoffs:
                dims = neighbor.grid_dims(st.box.box_extents(), cutoff)
                # Caps sized from the frame's occupancy: a fixed cap both
                # wastes block width at small cutoffs and overflows at large
                # ones (dims -> 1 puts everything in one cell).
                cap, tcap, _ = neighbor.estimate_caps(
                    st.coords, st.box.inv, dims, tgt_np, margin=1.25
                )
                f = jax.jit(
                    lambda c, _cut=cutoff, _dims=dims, _cap=cap, _tcap=tcap,
                    _tgt=tgt: neighbor.within_mask(
                        c, aidx, _tgt, cutoff=_cut,
                        box=jnp.asarray(st.box.matrix),
                        inv=jnp.asarray(st.box.inv), dims=_dims, cap=_cap,
                        tgt_cap=_tcap,
                    )
                )
                mask, ofl = jax.block_until_ready(f(jnp.asarray(st.coords)))
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    mask, ofl = f(jnp.asarray(st.coords))
                jax.block_until_ready(mask)
                el = (time.perf_counter() - t0) / args.reps
                out[f"device_res{nres}_d{cutoff}"] = {
                    "ms": round(el * 1000, 2),
                    "hits": int(np.asarray(mask).sum()),
                    "overflow": bool(ofl),
                }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
