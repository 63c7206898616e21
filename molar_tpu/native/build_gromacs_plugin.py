#!/usr/bin/env python
"""Build the GROMACS TPR/CPT plugin against a GROMACS source+build tree.

GROMACS exposes no stable ABI, so the shim (gromacs_plugin.cpp) is compiled
per installation and dlopened at runtime (same mechanism as the reference
molar_gromacs plugin, build.rs:1-66). Required env:

    GROMACS_SOURCE_DIR  path to the gromacs source checkout
    GROMACS_BUILD_DIR   path to its cmake build directory
    GROMACS_LIB_DIR     directory containing libgromacs.so

Output: libmolar_gromacs.so next to this script (override with -o). At
runtime the loader honors MOLAR_GROMACS_PLUGIN pointing at the built .so.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys

_DIR = pathlib.Path(__file__).parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default=str(_DIR / "libmolar_gromacs.so"))
    args = ap.parse_args()
    src = os.environ.get("GROMACS_SOURCE_DIR")
    bld = os.environ.get("GROMACS_BUILD_DIR")
    lib = os.environ.get("GROMACS_LIB_DIR")
    if not (src and bld and lib):
        print(
            "set GROMACS_SOURCE_DIR, GROMACS_BUILD_DIR and GROMACS_LIB_DIR",
            file=sys.stderr,
        )
        return 1
    includes = [
        f"{src}/src",
        f"{src}/src/gromacs/utility/include",
        f"{src}/src/gromacs/math/include",
        f"{src}/src/gromacs/topology/include",
        f"{src}/api/legacy/include",
        f"{src}/src/external",
        f"{bld}/api/legacy/include",
        f"{bld}/src/include",
    ]
    tmpi = f"{src}/src/external/thread_mpi/include"
    if os.path.isdir(tmpi):
        includes.append(tmpi)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        str(_DIR / "gromacs_plugin.cpp"),
        "-o",
        args.output,
        *[f"-I{p}" for p in includes],
        f"-L{lib}",
        f"-Wl,-rpath,{lib}",
        "-lgromacs",
    ]
    print(" ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
