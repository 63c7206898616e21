#!/usr/bin/env python
"""Single-structure report: SASA, secondary structure, inertia, surface mesh.

    python examples/structure_report.py protein.pdb [--obj out.obj]
"""

from __future__ import annotations

import argparse

from molar_tpu import System
from molar_tpu.ops.surface import dedupe_mesh, mesh_area, write_obj
from molar_tpu.utils import greeting


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("structure")
    ap.add_argument("--sel", default="protein")
    ap.add_argument("--obj", default=None, help="write the SES mesh here")
    args = ap.parse_args()
    greeting("structure_report")

    system = System.from_file(args.structure)
    sel = system(args.sel)
    print(f"atoms: {len(sel)} / {system.n_atoms}")
    print(f"center of mass: {sel.com()}")
    print(f"radius of gyration: {sel.gyration():.4f} nm")
    sasa = sel.sasa(with_volume=True)
    print(f"SASA: {sasa.total_area():.2f} nm^2   volume: {sasa.total_volume():.2f} nm^3")
    print(f"DSSP: {sel.dssp()}")
    if args.obj:
        v, t = sel.ses_mesh(spacing=0.05)
        v, t = dedupe_mesh(v, t)
        write_obj(args.obj, v, t)
        print(f"SES mesh: {len(v)} verts, {len(t)} tris, {mesh_area(v, t):.2f} nm^2 -> {args.obj}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
