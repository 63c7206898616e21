"""Fast streaming trajectory conversion (trjconv): XTC -> selection -> DCD.

The reference's trjconv workload (molar/benches/comparison_small.rs:44-57)
streams an XTC and writes a selection to DCD per frame — pure host work.
This path beats the naive ``read_frame``/``write`` loop three ways:

* **prefix decode** — XDR3DFR is a sequential per-atom stream, so only
  atoms ``[0, max(selection)+1)`` are decoded (``XtcHandler.decode_prefix``).
  GROMACS topologies put the protein first, so a protein selection skips
  the entire solvent tail — the decode is the dominant cost and shrinks by
  ``n_atoms / (max(sel)+1)``. The reference's molly codec decodes full
  frames only (molar/src/io/xtc_handler.rs).
* no per-frame ``State``/``PeriodicBox`` object churn — raw (step, time,
  box9) tuples all the way through;
* raw Fortran-record assembly with one buffered write per frame
  (``DcdHandler.write_frame_raw``).

Coordinates are byte-identical to the per-frame ``DcdHandler.write`` path;
the unit-cell record is computed directly from vector cosines (exact for
orthorhombic cells, where ``write``'s angle roundtrip leaves a ~3e-7
cos(arccos) residue).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .dcd import DcdHandler
from .xtc import XtcHandler


def _cell6_from_box9(box9: np.ndarray) -> np.ndarray:
    """DCD unit-cell record [A, cos g, B, cos b, cos a, C] (Angstrom) from
    the XTC header's row-major box rows (nm). Zero box -> zero record."""
    m = np.asarray(box9, np.float64).reshape(3, 3)  # rows are box vectors
    if not m.any():
        return np.zeros(6)
    ln = np.sqrt((m * m).sum(1))

    def cosang(i: int, j: int) -> float:
        d = ln[i] * ln[j]
        return float(m[i] @ m[j] / d) if d else 0.0

    return np.array([
        ln[0] * 10.0, cosang(0, 1), ln[1] * 10.0,
        cosang(0, 2), cosang(1, 2), ln[2] * 10.0,
    ])


def trjconv(
    src: str,
    dst: str,
    indices: Optional[np.ndarray] = None,
    *,
    first: int = 0,
    last: Optional[int] = None,
    step: int = 1,
) -> int:
    """Stream ``src`` (XTC), write the ``indices`` selection to ``dst``
    (DCD). Returns the number of frames written.

    ``first``/``last``/``step`` subset the frame range (``last`` is
    exclusive; None = end of trajectory).
    """
    r = XtcHandler(src)
    try:
        if indices is None:
            idx = np.arange(r.n_atoms, dtype=np.int64)
        else:
            idx = np.asarray(indices, dtype=np.int64)
        if idx.size == 0:
            raise ValueError("trjconv: empty selection")
        if idx.min() < 0 or idx.max() >= r.n_atoms:
            raise ValueError(
                f"trjconv: selection indices out of range 0..{r.n_atoms - 1}"
            )
        n_want = int(idx.max()) + 1
        stop = r.n_frames if last is None else min(last, r.n_frames)
        s0 = int(idx[0])
        contig = bool(
            np.array_equal(idx, np.arange(s0, s0 + idx.size, dtype=np.int64))
        )
        buf = np.empty((n_want + XtcHandler.PREFIX_SLACK, 3), np.float32)
        xyz = np.empty((3, idx.size), np.float32)
        ten = np.float32(10.0)  # nm -> Angstrom; f32 multiply matches the
        # f64-roundtrip in DcdHandler.write bit-for-bit (both correctly
        # rounded from the same f32 value)
        w = DcdHandler(dst, "w")
        n = 0
        try:
            for k in range(first, stop, step):
                coords, _st, _t, box9 = r.decode_prefix(k, n_want, buf)
                sel = coords[s0 : s0 + idx.size] if contig else coords[idx]
                np.multiply(sel.T, ten, out=xyz)
                w.write_frame_raw(xyz, _cell6_from_box9(box9))
                n += 1
        finally:
            w.close()
        return n
    finally:
        r.close()
