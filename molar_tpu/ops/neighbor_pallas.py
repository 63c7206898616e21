"""Pallas TPU kernel for the cell-grid within search (orthorhombic full PBC).

The XLA cell-blocked search (ops.neighbor) materializes gathered neighbor
blocks through HBM. This kernel exploits the grid structure instead: cells
along x are contiguous in the flat cell id, so the 27-stencil factorizes into
9 (dy, dz) neighbor *rows* x 3 x-shifts. Each program processes one cell row:
the 9 neighbor rows arrive as BlockSpec-indexed VMEM blocks (the same target
planes passed nine times with different index maps — no gather materializes),
the three x-shifts are VMEM rolls, and the (dims_x, cap, tcap) distance block
reduces on the VPU.

Scope: orthorhombic boxes, full PBC, per-frame call (use inside lax.scan over
a window). Triclinic / partial-PBC fall back to ops.neighbor.within_mask.
Target-slot validity is carried as f32 additive d2 penalties (Mosaic rejects
sub-byte/i8 2D->3D broadcasts). Correctness is validated against the host
search in interpreter mode and on hardware; the blocked planes/caps contract
matches ops.neighbor (fixed capacity + overflow flag from the plane builder).

Hardware status (v5e, 100k atoms / 5k targets / 0.5 nm grid 24x24x24,
cap=40/tcap=48): compiles in ~16 s, exact host parity, ~60 ms/frame vs
~30 ms/frame for the XLA dense path — the (1, nx, cap) row tiles underfill
the 128-lane VPU. A fat-slab restructuring (whole (nz, nx, cap) y-slab per
program, 3 BlockSpec y-slabs x in-kernel z/x rolls) is interpret-correct but
hangs the Mosaic compiler on this toolchain (>30 min, killed); revisit with a
newer Mosaic. Until then the XLA path remains the production default and this
kernel is an opt-in alternative.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import neighbor

_OFF9 = [(dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _kernel(dims_x: int, cap: int, tcap: int):
    def kernel(lengths_ref, sx, sy, sz, sval, *tgt_and_out):
        # tgt_and_out: 9 x (tx, ty, tz, tpen) blocks then the output ref.
        out = tgt_and_out[-1]
        lx = lengths_ref[0]
        ly = lengths_ref[1]
        lz = lengths_ref[2]
        c2 = lengths_ref[3]
        hit = jnp.zeros((dims_x, cap), dtype=jnp.bool_)
        sxv = sx[0]
        syv = sy[0]
        szv = sz[0]
        svv = sval[0]
        for k in range(9):
            tx = tgt_and_out[4 * k][0]  # (dims_x, tcap)
            ty = tgt_and_out[4 * k + 1][0]
            tz = tgt_and_out[4 * k + 2][0]
            # Pad slots carry a huge additive d2 penalty (f32 all the way —
            # Mosaic rejects i8/bool 2D->3D broadcasts).
            tp = tgt_and_out[4 * k + 3][0]
            for dx in (-1, 0, 1):
                if dx == 0:
                    rx, ry, rz, rp = tx, ty, tz, tp
                else:
                    rx = jnp.roll(tx, -dx, 0)
                    ry = jnp.roll(ty, -dx, 0)
                    rz = jnp.roll(tz, -dx, 0)
                    rp = jnp.roll(tp, -dx, 0)
                ddx = rx[:, None, :] - sxv[:, :, None]
                ddy = ry[:, None, :] - syv[:, :, None]
                ddz = rz[:, None, :] - szv[:, :, None]
                ddx = ddx - lx * jnp.round(ddx / lx)
                ddy = ddy - ly * jnp.round(ddy / ly)
                ddz = ddz - lz * jnp.round(ddz / lz)
                d2 = ddx * ddx + ddy * ddy + ddz * ddz + rp[:, None, :]
                hit = hit | jnp.any(d2 <= c2, axis=2)
        out[0] = hit & (svv > 0)

    return kernel


def _row_index_maps(dims):
    """9 index maps: program r (flat row over y,z) -> neighbor row (dy,dz)."""
    nx, ny, nz = dims

    def make(dy, dz):
        def imap(r):
            y = r // nz
            z = r % nz
            yy = (y + dy) % ny
            zz = (z + dz) % nz
            return (yy * nz + zz, 0, 0)

        return imap

    return [make(dy, dz) for dy, dz in _OFF9]


def within_mask_pallas(
    coords,
    src_idx,
    tgt_idx,
    cutoff: float,
    box,
    inv,
    dims: tuple[int, int, int],
    cap: int = 32,
    tgt_cap: int = 32,
    interpret: bool = False,
):
    """Boolean within mask (orthorhombic, full PBC) via the Pallas kernel.

    Same contract as ops.neighbor.within_mask (minus triclinic/partial pbc):
    returns (mask over src_idx, overflow flag).
    """
    nx, ny, nz = dims
    n_rows = ny * nz
    n = src_idx.shape[0]

    # Build the blocked planes with the shared XLA helpers (sorts/scatters are
    # fine in XLA; the kernel takes over the stencil compute).
    src = coords[src_idx]
    tgt = coords[tgt_idx]
    sfx, sfy, sfz = neighbor._wrap_frac(src, inv)
    tfx, tfy, tfz = neighbor._wrap_frac(tgt, inv)
    sx, sy, sz = neighbor._apply3(box, sfx, sfy, sfz)
    tx, ty, tz = neighbor._apply3(box, tfx, tfy, tfz)
    scx, scy, scz = neighbor._cell3(sfx, sfy, sfz, dims)
    # Flat id with x minor-most WITHIN a row: row = y*nz + z, cell = row*nx + x
    sflat = (scy * nz + scz) * nx + scx
    tcx, tcy, tcz = neighbor._cell3(tfx, tfy, tfz, dims)
    tflat = (tcy * nz + tcz) * nx + tcx
    n_cells = nx * ny * nz
    zero = jnp.asarray(0.0, src.dtype)
    big = jnp.asarray(1e12, src.dtype)
    ones_s = jnp.ones(src.shape[0], dtype=src.dtype)
    pen_t = jnp.zeros(tgt.shape[0], dtype=src.dtype)
    (sxb, syb, szb, svalid), s_slot, s_order, s_ofl = neighbor._blocked_planes(
        [sx, sy, sz, ones_s], sflat, n_cells, cap, [zero, zero, zero, zero]
    )
    (txb, tyb, tzb, tpen), _, _, t_ofl = neighbor._blocked_planes(
        [tx, ty, tz, pen_t], tflat, n_cells, tgt_cap, [zero, zero, zero, big]
    )

    # (n_rows, nx, cap) layout: rows are the pallas grid.
    def rows(a, c):
        return a.reshape(n_rows, nx, c)

    sxb, syb, szb = rows(sxb, cap), rows(syb, cap), rows(szb, cap)
    svalid = rows(svalid, cap)
    txb, tyb, tzb = rows(txb, tgt_cap), rows(tyb, tgt_cap), rows(tzb, tgt_cap)
    tpen = rows(tpen, tgt_cap)

    lengths = jnp.stack(
        [box[0, 0], box[1, 1], box[2, 2], jnp.asarray(cutoff, src.dtype) ** 2]
    )

    src_spec = pl.BlockSpec((1, nx, cap), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
    tgt_specs = []
    for imap in _row_index_maps(dims):
        for _ in range(4):
            tgt_specs.append(
                pl.BlockSpec((1, nx, tgt_cap), imap, memory_space=pltpu.VMEM)
            )
    # interleave the 9x4 tgt inputs in imap-major order to match the kernel
    tgt_inputs = []
    for _ in _OFF9:
        tgt_inputs.extend([txb, tyb, tzb, tpen])

    out = pl.pallas_call(
        _kernel(nx, cap, tgt_cap),
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            src_spec,
            src_spec,
            src_spec,
            src_spec,
            *tgt_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, nx, cap), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, nx, cap), jnp.bool_),
        interpret=interpret,
    )(lengths, sxb, syb, szb, svalid, *tgt_inputs)

    from .neighbor import _unsort_mask

    return _unsort_mask(out, s_slot, s_order, n), s_ofl | t_ofl


# ---------------------------------------------------------------------------
# Ghost-slab kernel (round 2): ghost-padded target planes + 128-lane z-windows
# ---------------------------------------------------------------------------


def _ghost_kernel(nzq: int, cap: int, tcap: int, c2f: float):
    """One program per (x, y) cell column, z processed four cells at a time.

    The ghost-padded target planes make every neighbor access a contiguous
    window: rows i..i+2, j..j+2 cover the x/y neighbors (periodic images
    have pre-shifted coordinates in the ghost cells). Mosaic requires
    dynamic lane starts to be 128-multiples, so the z stencil reads an
    aligned 8-cell (8*tcap-lane) window per *quad* of source cells; each
    source cell's hits reduce over its static 4-cell sub-window (cells
    k-1..k+2 — the extra z+2 cell is >= one cell away, so it cannot add
    hits within the cutoff). No gathers, no per-pair image math, no
    validity masks (sentinel coordinates).
    """
    w = 8 * tcap  # 256 lanes at tcap=32; q*(4*tcap) starts are 128-aligned

    def kernel(qmask, ny_ref, gx, gy, gz, sx, sy, sz, out):
        i = pl.program_id(0)
        j = pl.program_id(1)
        c2 = jnp.float32(c2f)
        bits = qmask[i * ny_ref[0] + j]

        # Static quad unroll: every lane offset, slice, and store row is a
        # compile-time constant — dynamic lane addressing measured ~2x the
        # whole kernel in scalar-core overhead.
        for q in range(nzq // 4):
            live = (bits >> q) & 1
            lo = q * 4 * tcap

            # Most (column, quad) windows contain no target atoms at all
            # (~75-90% on the solvated-protein headline workload): the
            # bitmask makes them a 4-row zero store instead of 9 blocks.
            @pl.when(live == 1)
            def _(q=q, lo=lo):
                sxq = sx[0, 0, 4 * q: 4 * q + 4, :]  # (4, cap)
                syq = sy[0, 0, 4 * q: 4 * q + 4, :]
                szq = sz[0, 0, 4 * q: 4 * q + 4, :]
                hit = jnp.zeros((4, cap, w), dtype=jnp.bool_)
                for a in range(3):
                    for b in range(3):
                        ddx = gx[i + a, j + b, lo: lo + w][None, None, :] - sxq[:, :, None]
                        ddy = gy[i + a, j + b, lo: lo + w][None, None, :] - syq[:, :, None]
                        ddz = gz[i + a, j + b, lo: lo + w][None, None, :] - szq[:, :, None]
                        d2 = ddx * ddx + ddy * ddy + ddz * ddz
                        hit = hit | (d2 <= c2)
                for r in range(4):
                    win = hit[r, :, r * tcap: r * tcap + 4 * tcap]
                    out[0, 0, 4 * q + r, :] = jnp.any(win, axis=1)

            @pl.when(live == 0)
            def _(q=q):
                out[0, 0, 4 * q: 4 * q + 4, :] = jnp.zeros(
                    (4, cap), dtype=jnp.bool_
                )

    return kernel


def within_ghost_pallas(
    coords,
    src_idx,
    tgt_idx,
    cutoff: float,
    box,
    inv,
    dims: tuple[int, int, int],
    cap: int = 32,
    tgt_cap: int = 32,
    pbc=(True, True, True),
    interpret: bool = False,
):
    """Within mask via the ghost-slab Pallas kernel.

    Same contract as ops.neighbor.within_mask for ``corrections is None``
    (any box matrix whose images are covered by +-1 cell shifts; triclinic
    correction sweeps fall back to the XLA path). ``tgt_cap`` is rounded up
    to a multiple of 32 by the caller for the 128-lane z-window.
    """
    from .neighbor import (
        _apply3,
        _blocked_planes,
        _cell3,
        _ghost_planes,
        _wrap_frac,
    )

    nx, ny, nz = dims
    n_cells = nx * ny * nz
    n = src_idx.shape[0]

    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    src = jnp.stack([x[src_idx], y[src_idx], z[src_idx]], axis=-1)
    tgt = jnp.stack([x[tgt_idx], y[tgt_idx], z[tgt_idx]], axis=-1)
    sfx, sfy, sfz = _wrap_frac(src, inv)
    tfx, tfy, tfz = _wrap_frac(tgt, inv)
    sx, sy, sz = _apply3(box, sfx, sfy, sfz)
    tx, ty, tz = _apply3(box, tfx, tfy, tfz)
    scx, scy, scz = _cell3(sfx, sfy, sfz, dims)
    sflat = (scx * ny + scy) * nz + scz
    tcx, tcy, tcz = _cell3(tfx, tfy, tfz, dims)

    big_s = jnp.asarray(-1e17, src.dtype)
    big_t = jnp.asarray(1e17, src.dtype)
    (sxb, syb, szb), s_slot, s_order, s_ofl = _blocked_planes(
        [sx, sy, sz], sflat, n_cells, cap, [big_s, big_s, big_s]
    )
    if tgt_cap % 32:
        raise ValueError("within_ghost_pallas requires tgt_cap % 32 == 0")
    if ((nz + 3) // 4 * 4) // 4 > 31:
        raise ValueError("within_ghost_pallas supports nz <= 121 (int32 quad mask)")
    tflat_pad = ((tcx + 1) * (ny + 2) + (tcy + 1)) * (nz + 2) + (tcz + 1)
    (gx, gy, gz), t_ofl = _ghost_planes(
        [tx, ty, tz], tflat_pad, dims, tgt_cap, box, pbc, big_t
    )
    # z padded to a quad multiple (+4 ghost/pad slots) so the kernel's
    # aligned 8-cell windows never run off the end.
    nzq = (nz + 3) // 4 * 4
    pad_z = nzq + 4 - (nz + 2)
    pad_cfg = ((0, 0), (0, 0), (0, pad_z), (0, 0))
    gx = jnp.pad(gx, pad_cfg, constant_values=1e17)
    gy = jnp.pad(gy, pad_cfg, constant_values=1e17)
    gz = jnp.pad(gz, pad_cfg, constant_values=1e17)
    lz = (nzq + 4) * tgt_cap
    gx = gx.reshape(nx + 2, ny + 2, lz)
    gy = gy.reshape(nx + 2, ny + 2, lz)
    gz = gz.reshape(nx + 2, ny + 2, lz)

    def col(a):
        a = a.reshape(nx, ny, nz, cap)
        if nzq != nz:
            a = jnp.pad(
                a, ((0, 0), (0, 0), (0, nzq - nz), (0, 0)),
                constant_values=-1e17,
            )
        return a

    # Per-(column, quad) occupancy bitmask: does the 3x3 xy-neighborhood x
    # 8-cell z window contain ANY target atom? Cheap XLA dilation over the
    # ghost occupancy; lets the kernel skip the ~90% of windows that are
    # pure solvent-vs-nothing on sparse-target workloads.
    nq = nzq // 4
    occ = (gx.reshape(nx + 2, ny + 2, nzq + 4, tgt_cap) != big_t).any(-1)
    occ = occ[:nx, :, :] | occ[1: nx + 1, :, :] | occ[2: nx + 2, :, :]
    occ = occ[:, :ny, :] | occ[:, 1: ny + 1, :] | occ[:, 2: ny + 2, :]
    quad_any = occ.reshape(nx, ny, nq + 1, 4).any(-1)
    live = quad_any[:, :, :nq] | quad_any[:, :, 1:]
    qmask = jnp.sum(
        live.astype(jnp.int32) << jnp.arange(nq, dtype=jnp.int32)[None, None, :],
        axis=-1,
        dtype=jnp.int32,
    ).reshape(nx * ny)

    ghost_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    src_spec = pl.BlockSpec(
        (1, 1, nzq, cap), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _ghost_kernel(nzq, cap, tgt_cap, float(cutoff) ** 2),
        grid=(nx, ny),
        in_specs=[smem_spec, smem_spec,
                  ghost_spec, ghost_spec, ghost_spec,
                  src_spec, src_spec, src_spec],
        out_specs=pl.BlockSpec(
            (1, 1, nzq, cap), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nzq, cap), jnp.bool_),
        interpret=interpret,
    )(qmask, jnp.asarray([ny], jnp.int32), gx, gy, gz,
      col(sxb), col(syb), col(szb))

    from .neighbor import _unsort_mask

    return _unsort_mask(out[:, :, :nz], s_slot, s_order, n), s_ofl | t_ofl
