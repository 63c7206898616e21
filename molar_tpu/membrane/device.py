"""Device (jitted) membrane per-frame pipeline, batched over frame windows.

The host pipeline in :mod:`molar_tpu.membrane.membrane` runs ~100 numpy
dispatches per frame on one CPU core (the profile is dominated by the batched
Voronoi clip loop). This module traces the ENTIRE per-frame pipeline —
marker COMs, patch adjacency, normal seeding, local frames, quadric fits,
curvature, Voronoi cells, marker smoothing, curvature smoothing and tail
order parameters — into one jitted program scanned over a window of frames,
so a 16-frame window costs one device dispatch (SURVEY §7: "batched quadric
fits are very TPU-friendly"; reference loop: molar_membrane/src/lib.rs:661-760
rayon par_iter over lipids, re-expressed as lipid-axis arrays under jit).

Scale note: patches are a top-K padded (L, K) structure (K sized from the
build-time frame, overflow flagged) so every per-lipid stage is O(L*K), not
O(L^2) — a 5k-lipid membrane runs the same program. Only the patch-detection
distance matrix and the optional curvature-smoothing shell expansion touch
(L, L); both are elementwise/matmul forms that XLA handles at that size.

Numerics: the device path computes in f32 (matching the reference's Float
build; molar_membrane works in f32 throughout), while the host path keeps
numpy f64 — parity tests hold to ~1e-4..1e-3 relative, not bitwise. All
3-vector transforms are elementwise (VPU) per the bf16-MXU rule; the
quadric normal equations contract with ``precision=HIGHEST``.

Boxes: the box KIND (orthorhombic vs triclinic) is a static, build-time
choice — the same compile-time class split :mod:`molar_tpu.selection.compiled`
makes — but the box VALUES are per-frame inputs, so NPT rescaling stays
exact. Triclinic frames run the fractional-round + 26-lattice-correction
min image (core.pbc.shortest_vector semantics, re-expressed as a running
min over unrolled candidate shifts: no computed-index gathers, which the
TPU tolerates badly at (L, L) scale — see CLAUDE.md). The candidate
VECTORS are rebuilt inside the trace from each frame's box columns
(unpruned ±1 combinations; the host's pruning is only an optimization).

Divergence note: options with ``n_shells_patch > 0`` fall back to the host
pipeline.
"""

from __future__ import annotations

import numpy as np

from .membrane import LipidGroup, Membrane, MembraneError

_VORO_TOL = 1e-6  # f32 analogue of the host clip's 1e-10 (f64)
_VORO_BOUND = 10.0


# ---------------------------------------------------------------------------
# jnp building blocks
# ---------------------------------------------------------------------------


def _unit(v):
    import jax.numpy as jnp

    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.where(n == 0, 1.0, n)


def _min_image_ortho(vec, ext):
    """Orthorhombic minimum image, componentwise (ext: (3,) box extents)."""
    import jax.numpy as jnp

    return vec - ext * jnp.round(vec / ext)


_IJK = np.array(
    [
        (i, j, k)
        for i in (-1, 0, 1)
        for j in (-1, 0, 1)
        for k in (-1, 0, 1)
        if (i, j, k) != (0, 0, 0)
    ],
    dtype=np.float32,
)  # (26, 3)


def _frame_corrections(mat):
    """All 26 ±1-lattice candidate shifts from a (possibly traced) box
    matrix (columns = box vectors), elementwise — the per-frame twin of
    core.pbc.build_tric_corrections without the pruning (zero benefit
    inside jit: losing rows are no-ops in the running min)."""
    import jax.numpy as jnp

    ijk = jnp.asarray(_IJK)
    return (
        ijk[:, 0:1] * mat[:, 0][None, :]
        + ijk[:, 1:2] * mat[:, 1][None, :]
        + ijk[:, 2:3] * mat[:, 2][None, :]
    )  # (26, 3)


def _min_image_tric(vec, mat, inv, corr):
    """Triclinic minimum image: fractional round, then the shortest of the
    26 lattice-corrected candidates (core.pbc.shortest_vector semantics,
    periodic_box.rs:25-66). Running-min over unrolled shifts instead of
    argmin + take_along_axis: computed-index gathers at (L, L, K) scale
    are a TPU worker hazard (CLAUDE.md), while 26 fused elementwise
    select steps keep the working set at one (..., 3) buffer."""
    import jax.numpy as jnp

    from ..core.pbc import mat3_apply

    frac = mat3_apply(inv, vec)
    frac = frac - jnp.round(frac)
    start = mat3_apply(mat, frac)
    best = start
    best2 = jnp.sum(best * best, axis=-1)
    for k in range(corr.shape[0]):
        cand = start + corr[k]
        cand2 = jnp.sum(cand * cand, axis=-1)
        take = cand2 < best2
        best = jnp.where(take[..., None], cand, best)
        best2 = jnp.where(take, cand2, best2)
    return best


def _solve6_cholesky(M, rhs):
    """Unrolled 6x6 Cholesky solve, batched over the leading axis.

    Returns (coefs, ok) where ok is the "Cholesky succeeds" flag the host
    path expresses as eigvalsh(M) > 0 (membrane.py:696): all pivots positive
    and finite. Unrolled scalar recurrences keep everything on the VPU —
    no lapack custom-call, no MXU.
    """
    import jax.numpy as jnp

    n = 6
    Lc = [[None] * n for _ in range(n)]
    ok = jnp.ones(M.shape[0], bool)
    for i in range(n):
        for j in range(i + 1):
            s = M[:, i, j]
            for k in range(j):
                s = s - Lc[i][k] * Lc[j][k]
            if i == j:
                ok = ok & (s > 0) & jnp.isfinite(s)
                Lc[i][j] = jnp.sqrt(jnp.where(s > 0, s, 1.0))
            else:
                Lc[i][j] = s / Lc[j][j]
    y = [None] * n
    for i in range(n):
        s = rhs[:, i]
        for k in range(i):
            s = s - Lc[i][k] * y[k]
        y[i] = s / Lc[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - Lc[k][i] * x[k]
        x[i] = s / Lc[i][i]
    return jnp.stack(x, axis=1), ok


def _voronoi_planes(points, pmask):
    """Scatter-free Voronoi cell geometry via candidate vertices.

    The sequential Sutherland-Hodgman clip (a jnp fori_loop port of
    :func:`molar_tpu.ops.voronoi.voronoi_cells_batch`, removed after the
    A/B — see docs/perf_notes.md round-4) cost 3 TPU scatters per cut per
    frame — measured ~0.5 s per 16-frame window at
    72 lipids. This formulation is pure reductions: the cell of the origin
    is the intersection of P = K+4 half-planes (K bisectors + the bounding
    box), its vertices are plane-pair intersections that satisfy every
    other half-plane, and each surviving plane contributes one edge whose
    endpoints are the extreme on-plane vertices. No fori_loop, no scatter,
    no gather.

    ``points`` (L, K, 2) bisector targets, ``pmask`` (L, K). Returns:
      has_edge (L, K) — bisector k owns an edge of the final cell
      wall     (L,)   — a bounding-box side owns an edge (host: invalid)
      e1, e2   (L, K+4, 2) — edge endpoints per plane (undefined where no
                edge; box-side endpoints included for completeness)
      edge_ok  (L, K+4) — which planes own an edge at all

    Geometry identical to the clip up to fp tolerance; the area fan
    (triangles apex-origin per edge) reproduces the host polygon's
    shoelace sum triangle-for-triangle.
    """
    import jax.numpy as jnp

    L, K = pmask.shape
    P = K + 4
    b = _VORO_BOUND
    eps = 1e-4  # f32 on-plane/containment tolerance (normalized planes)

    # half-planes n.x <= c, normalized so eps is a geometric distance
    nx = 0.5 * points[..., 0]
    ny = 0.5 * points[..., 1]
    c = nx * nx + ny * ny
    active = pmask & (c >= _VORO_TOL)
    norm = jnp.sqrt(c)
    safe = jnp.where(norm == 0, 1.0, norm)
    pn = jnp.stack(
        [
            jnp.concatenate([nx / safe, jnp.broadcast_to(
                jnp.array([0.0, 1.0, 0.0, -1.0]), (L, 4))], axis=1),
            jnp.concatenate([ny / safe, jnp.broadcast_to(
                jnp.array([-1.0, 0.0, 1.0, 0.0]), (L, 4))], axis=1),
        ],
        axis=-1,
    )  # (L, P, 2); box sides: -y<=b, x<=b, y<=b, -x<=b
    pc = jnp.concatenate(
        [norm, jnp.broadcast_to(jnp.array([b, b, b, b]), (L, 4))], axis=1
    )
    pact = jnp.concatenate(
        [active, jnp.ones((L, 4), bool)], axis=1
    )  # (L, P)

    # candidate vertices: intersections of plane pairs i<j
    iu, ju = np.triu_indices(P, k=1)  # static (M,) pair index arrays
    n1 = pn[:, iu]  # (L, M, 2)
    n2 = pn[:, ju]
    c1 = pc[:, iu]
    c2 = pc[:, ju]
    det = n1[..., 0] * n2[..., 1] - n1[..., 1] * n2[..., 0]
    par = jnp.abs(det) < 1e-12
    sdet = jnp.where(par, 1.0, det)
    vx = (c1 * n2[..., 1] - c2 * n1[..., 1]) / sdet
    vy = (n1[..., 0] * c2 - n2[..., 0] * c1) / sdet
    pair_ok = ~par & pact[:, iu] & pact[:, ju]

    # vertex is real iff it satisfies every ACTIVE half-plane (<= c + eps)
    d = (
        pn[:, None, :, 0] * vx[:, :, None]
        + pn[:, None, :, 1] * vy[:, :, None]
        - pc[:, None, :]
    )  # (L, M, P)
    inside = jnp.all(jnp.where(pact[:, None, :], d <= eps, True), axis=2)
    vert_ok = pair_ok & inside

    # per plane: the on-plane vertices' extreme tangential coordinates.
    # tangent direction t = (-n_y, n_x); on-plane membership comes from the
    # static pair ids (exact, no epsilon fuzz).
    M = len(iu)
    on_np = np.zeros((M, P), bool)
    on_np[np.arange(M), iu] = True
    on_np[np.arange(M), ju] = True
    on_plane = jnp.asarray(on_np)  # (M, P) static
    member = vert_ok[:, :, None] & on_plane[None, :, :]  # (L, M, P)
    t = (
        -pn[:, None, :, 1] * vx[:, :, None]
        + pn[:, None, :, 0] * vy[:, :, None]
    )  # (L, M, P)
    big = jnp.float32(1e30)
    tmin = jnp.min(jnp.where(member, t, big), axis=1)
    tmax = jnp.max(jnp.where(member, t, -big), axis=1)
    edge_ok = pact & (tmax > tmin + 1e-7)  # degenerate/absent edges drop

    # endpoint coordinates: x = c*n + t*(-n_y, n_x)
    def endpoint(tt):
        return jnp.stack(
            [
                pc * pn[..., 0] - tt * pn[..., 1],
                pc * pn[..., 1] + tt * pn[..., 0],
            ],
            axis=-1,
        )

    e1 = endpoint(jnp.where(edge_ok, tmin, 0.0))
    e2 = endpoint(jnp.where(edge_ok, tmax, 0.0))
    has_edge = edge_ok[:, :K]
    wall = jnp.any(edge_ok[:, K:], axis=1)
    return has_edge, wall, e1, e2, edge_ok


def _order_batch(order_type, coords, normals, bond_orders):
    """jnp port of measure_host.lipid_tail_order_batch (same expression
    sequence; the bond-order branch structure is static, so the position
    loop unrolls at trace time)."""
    import jax.numpy as jnp

    L, n = coords.shape[0], coords.shape[1]
    normals = jnp.broadcast_to(normals[:, None, :], (L, max(n - 2, 1), 3))

    def cosang(a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.sqrt(jnp.sum(a * a, -1) * jnp.sum(b * b, -1))
        return jnp.clip(num / jnp.where(den == 0, 1.0, den), -1.0, 1.0)

    cols = [jnp.zeros(L, jnp.float32) for _ in range(n - 2)]
    if order_type == "sz":
        for at in range(1, n - 1):
            v = coords[:, at + 1] - coords[:, at - 1]
            cth = cosang(v, normals[:, at - 1])
            cols[at - 1] = 1.5 * cth**2 - 0.5
        return jnp.stack(cols, axis=1)

    corr = order_type == "scdcorr"
    for i in range(n - 2):
        if bond_orders[i] == 1:
            if bond_orders[i + 1] == 1:
                p1, p2, p3 = coords[:, i], coords[:, i + 1], coords[:, i + 2]
                local_z = _unit(p3 - p1)
                local_x = _unit(jnp.cross(p1 - p2, p3 - p2))
                local_y = jnp.cross(local_x, local_z)
                nv = normals[:, i]
                sxx = 0.5 * (3 * cosang(local_x, nv) ** 2 - 1)
                syy = 0.5 * (3 * cosang(local_y, nv) ** 2 - 1)
                cols[i] = -(2 * sxx + syy) / 3.0
        else:
            p1, p2, p3, p4 = (
                coords[:, i - 1],
                coords[:, i],
                coords[:, i + 1],
                coords[:, i + 2],
            )
            a1 = 0.5 * (jnp.pi - jnp.arccos(cosang(p1 - p2, p3 - p2)))
            a2 = 0.5 * (jnp.pi - jnp.arccos(cosang(p2 - p3, p4 - p3)))
            local_z = _unit(p3 - p2)
            local_x = _unit(jnp.cross(p1 - p2, local_z))
            local_y = jnp.cross(local_x, local_z)
            n1 = normals[:, i]
            szz = 0.5 * (3 * cosang(local_z, n1) ** 2 - 1)
            syy = 0.5 * (3 * cosang(local_y, n1) ** 2 - 1)
            syz = 1.5 * cosang(local_y, n1) * cosang(local_z, n1)
            if corr:
                cols[i - 1] = -(
                    jnp.cos(a1) ** 2 * syy
                    + jnp.sin(a1) ** 2 * szz
                    - 2 * jnp.cos(a1) * jnp.sin(a1) * syz
                )
            else:
                cols[i - 1] = -(szz / 4 + 3 * syy / 4 - np.sqrt(3.0) * syz / 2)
            local_x = _unit(jnp.cross(p3 - p4, local_z))
            local_y = jnp.cross(local_x, local_z)
            n2 = normals[:, min(i + 1, max(n - 2, 1) - 1)]
            szz = 0.5 * (3 * cosang(local_z, n2) ** 2 - 1)
            syy = 0.5 * (3 * cosang(local_y, n2) ** 2 - 1)
            syz = 1.5 * cosang(local_y, n2) * cosang(local_z, n2)
            if corr:
                cols[i] = -(
                    jnp.cos(a2) ** 2 * syy
                    + jnp.sin(a2) ** 2 * szz
                    + 2 * jnp.cos(a2) * jnp.sin(a2) * syz
                )
            else:
                cols[i] = -(szz / 4 + 3 * syy / 4 + np.sqrt(3.0) * syz / 2)
    return jnp.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# The window program
# ---------------------------------------------------------------------------


class MembraneDevice:
    """Window-batched device execution of a :class:`Membrane`'s per-frame
    pipeline. Build once per Membrane (after groups are set); call
    :meth:`compute_window` with frame windows, then :meth:`accumulate` to
    fold results into the host Membrane's group statistics (same Welford
    accumulators, so ``merge_stats_from`` and ``save`` keep working).

    ``patch_cap``: static per-lipid patch capacity K. Default: 1.25x the
    build-time frame's max patch count, rounded up to 8. A frame whose
    patch counts exceed K sets the ``overflow`` output flag — rebuild with
    a larger cap (same tier pattern as the neighbor-search caps).

    ``engine``: ``"device"`` (default backend), ``"cpu"`` (commit window
    inputs to the CPU backend — the measured winner for small membranes,
    docs/perf_notes.md), or ``"auto"`` (pick at the first window from the
    per-frame work estimate x window size; tasks.engine crossovers).
    """

    def __init__(
        self,
        membrane: Membrane,
        patch_cap: int | None = None,
        engine: str = "device",
    ):
        import jax

        m = membrane
        opt = m.options
        if opt.n_shells_patch > 0:
            raise MembraneError(
                "device membrane path does not support n_shells_patch > 0; "
                "use the host pipeline"
            )
        box = m.system.state.require_box()
        mat = np.asarray(box.matrix, np.float64)
        # Box KIND is static (selects the traced min-image path); box
        # VALUES stay per-frame inputs (compute_window boxes=).
        self._triclinic = bool(
            np.abs(mat - np.diag(np.diag(mat))).max() > 1e-9
        )
        self.membrane = m
        self.options = opt
        L = len(m.lipids)
        self.n_lipids = L

        # ---- static index structure (all local to the shipped subset) ----
        atom_idx = np.concatenate([l.sel.indices for l in m.lipids])
        self.subset = atom_idx  # global rows to ship (iter_windows(subset=))
        g2l = {int(g): i for i, g in enumerate(atom_idx)}
        loc = lambda garr: np.asarray([g2l[int(g)] for g in garr], np.int32)
        self._first = loc([l.sel.indices[0] for l in m.lipids])
        self._atom_first = np.concatenate(
            [
                np.full(len(l.sel.indices), self._first[i], np.int32)
                for i, l in enumerate(m.lipids)
            ]
        )
        masses = np.asarray(m.system.topology.mass, np.float32)
        self._masses = masses[atom_idx]

        def marker(idx_of):
            idx = np.concatenate([loc(idx_of(l)) for l in m.lipids])
            seg = np.concatenate(
                [
                    np.full(len(idx_of(l)), i, np.int32)
                    for i, l in enumerate(m.lipids)
                ]
            )
            return idx, seg

        self._head = marker(lambda l: l.head_idx)
        self._mid = marker(lambda l: l.mid_idx)
        self._tail = marker(lambda l: l.tail_end_idx)

        # species grouping (static): lipid ids per species, tail index
        # matrices local to the subset
        self.species_names = sorted({l.species.name for l in m.lipids})
        self._sp_lipids = {}
        self._sp_tails = {}
        for sp in self.species_names:
            lids = np.asarray(
                [i for i, l in enumerate(m.lipids) if l.species.name == sp],
                np.int32,
            )
            self._sp_lipids[sp] = lids
            spec = m.lipids[int(lids[0])].species
            tails = []
            for offsets, orders in spec.tails:
                tl = self._first[lids][:, None] + np.asarray(offsets, np.int32)
                tails.append((tl.astype(np.int32), tuple(int(o) for o in orders)))
            self._sp_tails[sp] = tails
        self.species_of = np.asarray(
            [self.species_names.index(l.species.name) for l in m.lipids],
            np.int32,
        )

        if patch_cap is None:
            patch_cap = self._estimate_patch_cap()
        # (clamped: lax.top_k needs k <= L whatever the caller asked for)
        self.patch_cap = max(1, min(int(patch_cap), self.n_lipids))
        # Engine selection (tasks.engine): "device" = default backend,
        # "cpu" = commit window inputs to the CPU backend (measured winner
        # for small membranes: 72 lipids CPU-jit 134 fps vs TPU 41.5 —
        # docs/perf_notes.md), "auto" = pick from the per-frame work
        # estimate at the first compute_window (window size amortizes
        # dispatch, so the decision needs B).
        if engine not in ("auto", "cpu", "device"):
            raise MembraneError(
                f"MembraneDevice engine must be auto/cpu/device, got {engine!r}"
            )
        self.engine = engine
        self._engine_dev = None  # resolved lazily ("auto") or below
        self.engine_resolved = None if engine == "auto" else engine
        if engine == "cpu":
            from ..tasks.engine import engine_device

            self._engine_dev = engine_device("cpu")
        self._window_fn = jax.jit(self._build_window_fn())

    def _per_frame_flops(self) -> float:
        """Rough device-FLOP estimate of one frame of the window program.

        Terms: the L x L head-distance matrix + top_k patch search
        (~10 flops/pair), per-lipid candidate-vertex Voronoi over K^2 pairs
        (~40 each), and the 6x6 quadric Cholesky (~1e3). Order of magnitude
        only — the engine crossovers it feeds are ~2 decades apart
        (tasks.engine.DEVICE_FLOPS_FLOOR): 72-lipid bilayers land ~1e6-1e7
        (CPU-jit wins, measured 134 vs 41.5 fps), 4608-lipid ~3e8 (device
        wins, measured ~2x the native single core).
        """
        L, K = float(self.n_lipids), float(self.patch_cap)
        return L * (10.0 * L + 40.0 * K * K + 1000.0)

    def _estimate_patch_cap(self) -> int:
        """Max patch count on the build-time frame, x1.25, rounded to 8."""
        box = self.membrane.system.state.require_box()
        coords = self.membrane.system.state.coords
        # head markers from the current frame (unwrap + mass-weighted mean);
        # host-side shortest_vector handles both box kinds
        idx, seg = self._head
        sub = coords[self.subset].astype(np.float64)
        ref = sub[self._atom_first]
        u = ref + box.shortest_vector(sub - ref)
        w = self._masses[idx].astype(np.float64)
        L = self.n_lipids
        wsum = np.bincount(seg, weights=w, minlength=L)
        heads = np.stack(
            [
                np.bincount(seg, weights=w * u[idx, k], minlength=L)
                for k in range(3)
            ],
            axis=-1,
        ) / wsum[:, None]
        dm = box.shortest_vector(
            (heads[:, None, :] - heads[None, :, :]).reshape(-1, 3)
        ).reshape(L, L, 3)
        adj = (dm * dm).sum(-1) <= self.options.cutoff**2
        np.fill_diagonal(adj, False)
        kmax = int(adj.sum(1).max(initial=0))
        # top_k(k) over the (L, L) distance matrix needs k <= L: small
        # membranes clamp the 8-multiple rounding (and the 1.25 margin)
        # rather than crash in XLA with an opaque k > dimension error.
        return min(max((int(kmax * 1.25) + 7) // 8 * 8, 8), self.n_lipids)

    # -- traced pipeline ----------------------------------------------------

    def _build_window_fn(self):
        import jax
        import jax.numpy as jnp

        opt = self.options
        L = self.n_lipids
        K = self.patch_cap
        cutoff2 = np.float32(opt.cutoff**2)
        atom_first = jnp.asarray(self._atom_first)
        masses = jnp.asarray(self._masses)
        head_i, head_s = map(jnp.asarray, self._head)
        mid_i, mid_s = map(jnp.asarray, self._mid)
        tail_i, tail_s = map(jnp.asarray, self._tail)
        gn = (
            None
            if opt.global_normal is None
            else jnp.asarray(opt.global_normal, jnp.float32)
        )
        hp = jax.lax.Precision.HIGHEST

        def seg_com(u, idx, seg):
            w = masses[idx]
            wsum = jax.ops.segment_sum(w, seg, num_segments=L)
            out = []
            for d in range(3):
                out.append(
                    jax.ops.segment_sum(w * u[:, d][idx], seg, num_segments=L)
                )
            return jnp.stack(out, axis=-1) / wsum[:, None]

        def gather_rows(u, idx):
            # per-component gathers (CLAUDE.md: (n,3) row gathers are a
            # compile-time trap; componentwise is fast and fuses)
            return jnp.stack([u[..., 0][idx], u[..., 1][idx], u[..., 2][idx]], -1)

        def smooth_pass(markers, normals, pid, pmask, valid, mi):
            """One _smooth() pass (membrane.py:654-811), lipid-axis batched
            over the padded (L, K) patch table.

            Invalid NEIGHBORS deliberately stay in the fits and clips
            (matching the host's pmask semantics: only OWN validity gates).
            """
            valid = valid & jnp.any(pmask, axis=1)

            # local frames: columns (n x ex), (n x (n x ex)), -n
            ex = jnp.array([1.0, 0.0, 0.0], jnp.float32)
            c0 = jnp.cross(normals, ex)
            c1 = jnp.cross(normals, c0)
            to_lab = jnp.stack([c0, c1, -normals], axis=2)  # (L,3,3) columns
            A = to_lab
            det = (
                A[:, 0, 0] * (A[:, 1, 1] * A[:, 2, 2] - A[:, 1, 2] * A[:, 2, 1])
                - A[:, 0, 1] * (A[:, 1, 0] * A[:, 2, 2] - A[:, 1, 2] * A[:, 2, 0])
                + A[:, 0, 2] * (A[:, 1, 0] * A[:, 2, 1] - A[:, 1, 1] * A[:, 2, 0])
            )
            sing = ~jnp.isfinite(det) | (jnp.abs(det) < 1e-12)
            valid = valid & ~sing
            safed = jnp.where(sing, 1.0, det)
            inv = jnp.stack(
                [
                    jnp.stack(
                        [
                            A[:, 1, 1] * A[:, 2, 2] - A[:, 1, 2] * A[:, 2, 1],
                            A[:, 0, 2] * A[:, 2, 1] - A[:, 0, 1] * A[:, 2, 2],
                            A[:, 0, 1] * A[:, 1, 2] - A[:, 0, 2] * A[:, 1, 1],
                        ],
                        -1,
                    ),
                    jnp.stack(
                        [
                            A[:, 1, 2] * A[:, 2, 0] - A[:, 1, 0] * A[:, 2, 2],
                            A[:, 0, 0] * A[:, 2, 2] - A[:, 0, 2] * A[:, 2, 0],
                            A[:, 0, 2] * A[:, 1, 0] - A[:, 0, 0] * A[:, 1, 2],
                        ],
                        -1,
                    ),
                    jnp.stack(
                        [
                            A[:, 1, 0] * A[:, 2, 1] - A[:, 1, 1] * A[:, 2, 0],
                            A[:, 0, 1] * A[:, 2, 0] - A[:, 0, 0] * A[:, 2, 1],
                            A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0],
                        ],
                        -1,
                    ),
                ],
                axis=1,
            ) / safed[:, None, None]

            # min-image displacements to every patch member, local coords
            mpk = gather_rows(markers, pid)  # (L, K, 3)
            rel = mi(mpk - markers[:, None, :])
            local = jnp.einsum("lij,lkj->lki", inv, rel, precision=hp)
            x, y, z = local[..., 0], local[..., 1], local[..., 2]

            # quadric z = Ax^2+By^2+Cxy+Dx+Ey+F, masked normal equations
            Pm = jnp.stack([x * x, y * y, x * y, x, y, jnp.ones_like(x)], -1)
            Pm = jnp.where(pmask[..., None], Pm, 0.0)
            zm = jnp.where(pmask, z, 0.0)
            zm = jnp.where(jnp.isfinite(zm), zm, 0.0)
            Pm = jnp.where(jnp.isfinite(Pm), Pm, 0.0)
            M = jnp.einsum("lki,lkj->lij", Pm, Pm, precision=hp)
            rhs = jnp.einsum("lki,lk->li", Pm, zm, precision=hp)
            M = jnp.where(valid[:, None, None], M, jnp.eye(6, dtype=M.dtype))
            coefs, pd = _solve6_cholesky(M, rhs)
            valid = valid & pd

            a, b, c, d, e, f = (coefs[:, k] for k in range(6))
            E = 1 + d * d
            F = d * e
            G = 1 + e * e
            Lq = 2 * a
            Mq = c
            Nq = 2 * b
            Z = jnp.where(valid, E * G - F * F, 1.0)
            gaussian = (Lq * Nq - Mq * Mq) / Z
            meanc = 0.5 * (E * Nq - 2 * F * Mq + G * Lq) / Z
            vn = _unit(jnp.stack([d, e, -jnp.ones_like(d)], axis=1))
            new_normals = jnp.einsum("lij,lj->li", to_lab, vn, precision=hp)

            zs = (
                a[:, None] * x * x
                + b[:, None] * y * y
                + c[:, None] * x * y
                + d[:, None] * x
                + e[:, None] * y
                + f[:, None]
            )
            fit_pts = mpk + (zs - z)[..., None] * to_lab[:, None, :, 2]

            # Voronoi cells in the local tangent plane — candidate-vertex
            # formulation (reductions only; the sequential clip's scatters
            # measured ~0.5 s/window on TPU)
            pts2 = jnp.where(pmask[..., None], local[:, :, :2], 0.0)
            pts2 = jnp.where(jnp.isfinite(pts2), pts2, 0.0)
            has_edge, wall, edge1, edge2, edge_ok = _voronoi_planes(
                pts2, pmask & valid[:, None]
            )
            valid = valid & ~wall

            # neighbor ids: bisector planes owning an edge of the cell
            nb_mask = has_edge
            nb_ids = jnp.where(nb_mask, pid, -1)

            # area: one triangle (origin, e1, e2) per surviving edge on the
            # lifted surface — the same triangle set as the host polygon fan
            def lift(pt):  # (L, P, 2) -> lab-frame (L, P, 3)
                px, py = pt[..., 0], pt[..., 1]
                pz = (
                    a[:, None] * px * px
                    + b[:, None] * py * py
                    + c[:, None] * px * py
                    + d[:, None] * px
                    + e[:, None] * py
                    + f[:, None]
                )
                return jnp.einsum(
                    "lij,lpj->lpi",
                    to_lab,
                    jnp.stack([px, py, pz], axis=-1),
                    precision=hp,
                )

            v1 = lift(edge1)
            v2 = lift(edge2)
            cr = jnp.cross(v1, v2)
            areas = 0.5 * jnp.sum(
                jnp.where(edge_ok, jnp.sqrt(jnp.sum(cr * cr, -1)), 0.0),
                axis=1,
            )

            runaway = jnp.abs(f) > 0.5
            valid = valid & ~runaway
            # Host parity: _smooth `continue`s before the marker update for
            # lipids invalidated this pass (wall/non-PD/runaway) and never
            # touches entry-invalid ones — freeze their markers, or the
            # garbage f of a masked fit teleports them into the NEXT pass's
            # fits of their valid neighbors (max_smooth_iter >= 2).
            new_markers = jnp.where(
                valid[:, None], markers + f[:, None] * to_lab[:, :, 2], markers
            )

            # marker smoothing: valid OWNERS scatter their fitted projection
            # of member j back onto j (np.add.at analogue)
            ok = valid[:, None] & pmask  # (owner, slot)
            tgt = jnp.where(ok, pid, L)  # L = dropped
            flat = tgt.ravel()
            sm_n = (
                jnp.ones(L + 1, jnp.float32)
                .at[flat]
                .add(jnp.where(ok, 1.0, 0.0).ravel(), mode="drop")[:-1]
            )
            sm_p = new_markers + jnp.stack(
                [
                    jnp.zeros(L + 1, jnp.float32)
                    .at[flat]
                    .add(
                        jnp.where(ok, fit_pts[..., dd], 0.0).ravel(),
                        mode="drop",
                    )[:-1]
                    for dd in range(3)
                ],
                axis=-1,
            )
            # only valid lipids take the smoothed marker (host: for _valid())
            new_markers = jnp.where(
                valid[:, None], sm_p / sm_n[:, None], new_markers
            )
            return (
                new_markers,
                new_normals,
                valid,
                nb_ids,
                nb_mask,
                meanc,
                gaussian,
                areas,
            )

        tric = self._triclinic

        def per_frame(coords, pb):
            # static box-kind split: pb is ext (3,) orthorhombic or
            # (mat, inv) (3,3) each for a triclinic build box
            if tric:
                mat, inv = pb
                corr = _frame_corrections(mat)
                mi = lambda v: _min_image_tric(v, mat, inv, corr)
            else:
                mi = lambda v: _min_image_ortho(v, pb)

            # 1. unwrap each lipid to its first atom's image
            ref = gather_rows(coords, atom_first)
            u = ref + mi(coords - ref)

            # 2. markers
            heads = seg_com(u, head_i, head_s)
            _mids = seg_com(u, mid_i, mid_s)  # noqa: F841 (host parity)
            tails = seg_com(u, tail_i, tail_s)

            # 3. patches: head-marker adjacency within cutoff -> top-K table
            dm = mi(heads[None, :, :] - heads[:, None, :])
            d2 = jnp.sum(dm * dm, -1)
            d2 = jnp.where(jnp.eye(L, dtype=bool), jnp.inf, d2)
            adj = d2 <= cutoff2
            n_patch = jnp.sum(adj, axis=1)
            overflow = jnp.any(n_patch > K)
            negd, pid = jax.lax.top_k(-jnp.where(adj, d2, jnp.inf), K)
            pmask = jnp.isfinite(negd)
            pid = jnp.where(pmask, pid, 0).astype(jnp.int32)

            # 4. tail-head vectors + 2-pass normal seeding over the patch
            thv = _unit(heads - tails)
            vecs = thv
            for _ in range(2):
                vk = gather_rows(vecs, pid)  # (L, K, 3)
                cos = jnp.sum(vecs[:, None, :] * vk, axis=-1)
                keep = pmask & (cos >= 0)
                acc = vecs + jnp.sum(jnp.where(keep[..., None], vk, 0.0), axis=1)
                vecs = _unit(acc)
            normals = vecs

            valid = jnp.ones(L, bool)
            markers = heads
            for _ in range(max(opt.max_smooth_iter, 1)):
                (markers, normals, valid, nb_ids, nb_mask, meanc, gaussc,
                 areas) = smooth_pass(markers, normals, pid, pmask, valid, mi)

            # 5. order parameters per species/tail (on unwrapped coords)
            order = {}
            for sp in self.species_names:
                lids = jnp.asarray(self._sp_lipids[sp])
                if gn is not None:
                    nrm = jnp.broadcast_to(
                        gn[None, :], (len(self._sp_lipids[sp]), 3)
                    )
                else:
                    nrm = gather_rows(normals, lids)
                tvals = []
                for tl, orders in self._sp_tails[sp]:
                    tc = jnp.stack(
                        [u[:, 0][tl], u[:, 1][tl], u[:, 2][tl]], -1
                    )
                    tvals.append(_order_batch(opt.order_type, tc, nrm, orders))
                order[sp] = tvals

            # 6. curvature smoothing over n shells of the Voronoi graph
            ns = opt.n_shells_smoothing
            if ns >= 1:
                # densify the neighbor graph, then matmul-expand the shells
                tgt = jnp.where(nb_mask, nb_ids, L)
                rows = jnp.broadcast_to(
                    jnp.arange(L)[:, None], nb_ids.shape
                )
                flat = jnp.where(nb_mask, rows * L + tgt, L * L)
                neib_d = (
                    jnp.zeros(L * L + 1, jnp.float32)
                    .at[flat.ravel()]
                    .set(1.0, mode="drop")[:-1]
                    .reshape(L, L)
                )
                reach = neib_d
                for _ in range(ns - 1):
                    grown = jnp.einsum(
                        "ij,jk->ik", reach, neib_d, precision=hp
                    )
                    reach = jnp.maximum(reach, jnp.minimum(grown, 1.0))
                wm = (reach > 0) & valid[None, :]
                cnt = jnp.sum(wm, axis=1)
                msum = jnp.sum(jnp.where(wm, meanc[None, :], 0.0), axis=1)
                gsum = jnp.sum(jnp.where(wm, gaussc[None, :], 0.0), axis=1)
                has = valid & (cnt > 0)
                meanc = jnp.where(has, (meanc + msum) / (cnt + 1), meanc)
                gaussc = jnp.where(has, (gaussc + gsum) / (cnt + 1), gaussc)

            return {
                "valid": valid,
                "overflow": overflow,
                "area": areas,
                "mean_curv": meanc,
                "gauss_curv": gaussc,
                "normal": normals,
                "thv": thv,
                "n_neighbors": jnp.sum(nb_mask, axis=1),
                "nb_ids": nb_ids,
                "nb_mask": nb_mask,
                "order": order,
            }

        def window_fn(coords, pbs):
            def step(carry, fr):
                c, pb = fr
                return carry, per_frame(c, pb)

            return jax.lax.scan(step, 0, (coords, pbs))[1]

        return window_fn

    # -- host driver ----------------------------------------------------------

    def compute_window(self, coords, boxes=None):
        """Run the jitted pipeline on a window.

        ``coords``: (B, n_subset_atoms, 3) f32 (rows per :attr:`subset`) or
        any transport tuple from ``iter_windows(subset=...)``;
        ``boxes``: (B, 3, 3) (None = the system's current box for every
        frame). Returns the per-frame output pytree as numpy arrays. A True
        ``overflow`` entry means a frame exceeded the patch capacity —
        rebuild with a larger ``patch_cap``.
        """
        import jax

        from ..tasks.trajectory import decode_window_coords, transport_frames

        B = transport_frames(coords)
        if self.engine == "auto" and self.engine_resolved is None:
            from ..tasks.engine import engine_device, pick_engine

            self.engine_resolved = pick_engine(self._per_frame_flops(), B)
            if self.engine_resolved == "cpu":
                self._engine_dev = engine_device("cpu")
        if self._engine_dev is not None:
            # Commit the RAW transport to the chosen backend so the decode
            # itself (and every jit tracing these arrays) runs there — no
            # round-trip through the default device.
            coords = jax.device_put(coords, self._engine_dev)
        coords = decode_window_coords(coords)
        if boxes is None:
            bs = np.broadcast_to(
                np.asarray(
                    self.membrane.system.state.require_box().matrix,
                    np.float64,
                ),
                (B, 3, 3),
            )
        else:
            bs = np.asarray(boxes, np.float64)
        if self._triclinic:
            # inverses on host in f64 (a per-frame 3x3 — not device work),
            # shipped f32 next to the matrices
            pbs = (
                bs.astype(np.float32),
                np.linalg.inv(bs).astype(np.float32),
            )
        else:
            # The compiled program's min-image is the componentwise
            # orthorhombic form (a static, build-time choice); silently
            # np.diag-ing a tilted per-frame cell (NPT Parrinello-Rahman)
            # would corrupt every distance — fail loudly instead.
            off = bs - bs * np.eye(3)[None]
            if np.abs(off).max(initial=0.0) > 1e-5:
                raise MembraneError(
                    "MembraneDevice.compute_window: per-frame box is not "
                    "orthorhombic (off-diagonal max "
                    f"{np.abs(off).max():.2e}) but this MembraneDevice was "
                    "built from an orthorhombic box — rebuild it with a "
                    "triclinic build-frame box to compile the triclinic "
                    "min-image path"
                )
            pbs = np.stack([np.diag(b) for b in bs]).astype(np.float32)
        if self._engine_dev is not None:
            pbs = jax.device_put(pbs, self._engine_dev)
        out = self._window_fn(coords, pbs)
        return jax.tree_util.tree_map(np.asarray, out)

    def accumulate(self, outs) -> None:
        """Fold a window's outputs into the Membrane's group statistics
        (the array form of LipidGroup.frame_update, same Welford streams)."""
        if bool(np.any(outs["overflow"])):
            raise MembraneError(
                f"patch capacity {self.patch_cap} overflowed; rebuild "
                "MembraneDevice with a larger patch_cap"
            )
        m = self.membrane
        B = outs["valid"].shape[0]
        for fr in range(B):
            valid = outs["valid"][fr]
            tilt = _tilt_deg(outs["normal"][fr], outs["thv"][fr])
            for gr in m.groups.values():
                self._group_update(gr, fr, outs, valid, tilt)

    def _group_update(self, gr: LipidGroup, fr, outs, valid, tilt):
        in_group = np.zeros(self.n_lipids + 1, bool)
        in_group[list(gr.lipid_ids)] = True
        nb_ids = outs["nb_ids"][fr]
        nb_mask = outs["nb_mask"][fr]
        for sp in gr.species_names:
            st = gr.per_species[sp]
            spm = self.species_of == self.species_names.index(sp)
            sel = in_group[:-1] & valid & spm
            idx = np.nonzero(sel)[0]
            st["count"].add(len(idx))
            if len(idx) == 0:
                continue
            st["area"].add(float(np.mean(outs["area"][fr][idx])))
            st["tilt"].add(float(np.mean(tilt[idx])))
            st["mean_curv"].add(float(np.mean(outs["mean_curv"][fr][idx])))
            st["gauss_curv"].add(float(np.mean(outs["gauss_curv"][fr][idx])))
            st["n_neighbors"].add(float(np.mean(outs["n_neighbors"][fr][idx])))
            # neighbor species fractions (neighbors restricted to the group)
            ids = nb_ids[idx]
            ok = nb_mask[idx] & in_group[np.where(ids >= 0, ids, -1)] & (ids >= 0)
            total = int(ok.sum())
            if total:
                nsp = self.species_of[np.where(ids >= 0, ids, 0)]
                for s in gr.species_names:
                    scode = self.species_names.index(s)
                    st["neib_fractions"][s].add(
                        int((ok & (nsp == scode)).sum()) / total
                    )
            # order profiles: mean over the group's valid lipids of the species
            sp_l = self._sp_lipids[sp]
            rows = np.nonzero(sel[sp_l])[0]
            tails = outs["order"][sp]
            if len(rows) and len(tails):
                from .membrane import _RunningStats

                if st["order"] is None:
                    st["order"] = [_RunningStats((t.shape[-1],)) for t in tails]
                for k, t in enumerate(tails):
                    st["order"][k].add(np.mean(t[fr][rows], axis=0))


def _tilt_deg(normals, thv):
    num = np.sum(normals * thv, axis=1)
    den = np.linalg.norm(normals, axis=1) * np.linalg.norm(thv, axis=1)
    c = np.clip(num / np.where(den == 0, 1.0, den), -1, 1)
    return np.degrees(np.arccos(c))
