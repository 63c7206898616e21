"""``molar`` command-line tool (subcommands mirror molar_bin: last, rearrange,
solvate, tip3to4 — reference molar_bin/src/main.rs:30-100). Filled in as the
corresponding subsystems land."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="molar", description=__doc__)
    sub = parser.add_subparsers(dest="command")
    sub.add_parser("info", help="print version and backend info")
    args = parser.parse_args(argv)
    if args.command == "info":
        import jax

        from . import __version__

        print(f"molar_tpu {__version__}")
        print(f"jax {jax.__version__}, devices: {jax.devices()}")
        return 0
    parser.print_help()
    return 1


if __name__ == "__main__":
    sys.exit(main())
