#!/usr/bin/env python
"""Membrane per-lipid curvature/order analysis from a TOML options file.

    python examples/membrane_curvature.py -f system.gro traj.xtc --options membrane.toml

Options file (see molar_tpu.membrane.MembraneOptions for the full schema):

    sel = "resname POPC"
    cutoff = 2.5
    order_type = "scdcorr"
    output_dir = "."
    groups = ["all"]

    [lipids.POPC]
    whole = "resname POPC"
    head = "name P"
    mid = "name C22"
    tails = ["C22-C23-C24-C25", "C32-C33-C34-C35"]
"""

from __future__ import annotations

from molar_tpu import System
from molar_tpu.membrane import Membrane, MembraneOptions
from molar_tpu.tasks.trajectory import FrameSpec, TrajectoryReader, build_arg_parser
from molar_tpu.utils import greeting


def main() -> int:
    parser = build_arg_parser("membrane curvature/order analysis")
    parser.add_argument("--options", required=True, help="TOML options file")
    parser.add_argument("--vmd", default=None, help="write VMD TCL visualization")
    args = parser.parse_args()
    greeting("membrane_curvature")

    structure, *trajs = args.files
    system = System.from_file(structure)
    opts = MembraneOptions.from_toml(open(args.options).read())
    membrane = Membrane(system, opts)

    reader = TrajectoryReader(
        trajs or [structure],
        begin=FrameSpec.parse(args.begin),
        end=FrameSpec.parse(args.end),
        skip=args.skip,
    )
    n = 0
    for fr, state in reader.iter_states():
        system.set_state(state)
        membrane.compute()
        n += 1
        if args.log_every and n % args.log_every == 0:
            print(f"frame {fr}")
    membrane.finalize()
    if args.vmd:
        membrane.write_vmd_visualization(args.vmd)
    print(f"{n} frames -> {opts.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
