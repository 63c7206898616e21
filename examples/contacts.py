#!/usr/bin/env python
"""Atoms within a cutoff of a target selection, per frame (PBC cell grid).

    python examples/contacts.py -f structure.pdb traj.xtc \
        --target "resname LIG" --cutoff 0.5
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from molar_tpu import System
from molar_tpu.ops import neighbor
from molar_tpu.tasks.trajectory import (
    FrameSpec,
    TrajectoryReader,
    WindowPipeline,
    build_arg_parser,
)
from molar_tpu.utils import greeting


def main() -> int:
    parser = build_arg_parser("windowed contact counts")
    parser.add_argument("--target", required=True)
    parser.add_argument("--cutoff", type=float, default=0.5)
    args = parser.parse_args()
    greeting("contacts")

    structure, *trajs = args.files
    system = System.from_file(structure)
    tgt = jnp.asarray(system(args.target).indices)
    alla = jnp.arange(system.n_atoms)
    box = system.state.require_box()
    dims = neighbor.grid_dims(box.box_extents(), args.cutoff)
    # Fixed-capacity contract: size the cell capacity from the first frame
    # with headroom; the overflow flag catches violations at run time.
    frac = (system.state.coords @ box.inv.T) % 1.0
    cell = (
        np.minimum((frac[:, 0] * dims[0]).astype(int), dims[0] - 1) * dims[1]
        + np.minimum((frac[:, 1] * dims[1]).astype(int), dims[1] - 1)
    ) * dims[2] + np.minimum((frac[:, 2] * dims[2]).astype(int), dims[2] - 1)
    cap = int(np.bincount(cell).max() * 1.5 + 8) // 8 * 8

    @jax.jit
    def window_fn(coords, boxes, invs, times):
        def per_frame(_, fr):
            c, b, i = fr
            mask, ofl = neighbor.within_mask(
                c, alla, tgt, cutoff=args.cutoff, box=b, inv=i,
                dims=dims, cap=cap, tgt_cap=cap,
            )
            return _, (jnp.sum(mask), ofl)

        _, (cnt, ofl) = jax.lax.scan(per_frame, 0, (coords, boxes, invs))
        return cnt, ofl

    reader = TrajectoryReader(
        trajs or [structure],
        begin=FrameSpec.parse(args.begin),
        end=FrameSpec.parse(args.end),
        skip=args.skip,
    )
    for ids, (cnt, ofl) in WindowPipeline(reader, args.window, window_fn).run():
        if bool(np.asarray(ofl).any()):
            raise RuntimeError("cell capacity overflow — raise cap and rerun")
        for f, n in zip(ids, np.asarray(cnt)):
            print(f"{f}\t{int(n)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
