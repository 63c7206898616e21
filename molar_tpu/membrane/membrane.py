"""Lipid membrane analysis: patches, normals, curvature, areas, order.

The TPU-era molar_membrane (reference: molar_membrane/src/{lib,lipid_molecule,
lipid_species}.rs). TOML-configured per-species lipid definitions; per frame:

1. per-lipid unwrap + head/mid/tail markers (COMs of marker selections);
2. patches = PBC cell-grid search over head markers within ``cutoff``
   (default 2.5 nm);
3. initial normals: normalized tail->head vectors, then two passes of
   angular-filtered (<= pi/2) patch averaging;
4. ``max_smooth_iter`` rounds of smoothing: local frame from the normal,
   min-image-unwrapped patch in local coords, quadric fit
   ``z = Ax^2 + By^2 + Cxy + Dx + Ey + F`` via 6x6 normal equations,
   2D Voronoi cell for direct neighbors + in-plane area (triangle fan over
   surface-projected vertices), mean/Gaussian/principal curvature from the
   fundamental forms, marker update by the fitted height (invalid if > 0.5 nm
   or the patch touches the Voronoi wall), then marker averaging over fitted
   patch projections;
5. per-tail order parameters (Sz/Scd/ScdCorr) with the lipid or global normal;
6. optional n-shell curvature smoothing; per-group running statistics.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..core.pbc import PBC_FULL
from ..core.system import Sel, System
from ..ops import measure_host, neighbor_host
from ..ops.voronoi import VoronoiCell


class MembraneError(RuntimeError):
    pass


@dataclass
class MembraneOptions:
    sel: str = "all"
    cutoff: float = 2.5
    max_smooth_iter: int = 1
    order_type: str = "scdcorr"
    output_dir: str = "."
    global_normal: Optional[np.ndarray] = None
    n_shells_patch: int = 0
    n_shells_smoothing: int = 0
    lipids: dict = field(default_factory=dict)
    groups: list = field(default_factory=list)

    @staticmethod
    def from_toml(text: str) -> "MembraneOptions":
        data = tomllib.loads(text)
        opts = MembraneOptions()
        for key in (
            "sel",
            "cutoff",
            "max_smooth_iter",
            "output_dir",
            "n_shells_patch",
            "n_shells_smoothing",
            "groups",
        ):
            if key in data:
                setattr(opts, key, data[key])
        if "order_type" in data:
            opts.order_type = str(data["order_type"]).lower()
        if "global_normal" in data:
            opts.global_normal = np.asarray(data["global_normal"], dtype=np.float64)
        opts.lipids = data.get("lipids", {})
        return opts


class LipidSpecies:
    """Per-species atom-offset template built from the first instance
    (lipid_species.rs: tail strings 'C1-C2=C3...' parse into offsets +
    bond orders)."""

    def __init__(self, name: str, descr: dict, first_lipid: Sel):
        self.name = name
        self.whole = descr["whole"]
        first_index = int(first_lipid.indices[0])
        self.head_offsets = first_lipid.select(descr["head"]).indices - first_index
        self.mid_offsets = first_lipid.select(descr["mid"]).indices - first_index
        self.max_area = float(descr.get("max_area", 0.0))
        self.tails: list[tuple[np.ndarray, np.ndarray]] = []
        for t in descr.get("tails", []):
            names: list[str] = []
            orders: list[int] = []
            cur = t
            while True:
                cut = min(
                    [i for i in (cur.find("-"), cur.find("=")) if i >= 0],
                    default=-1,
                )
                if cut < 0:
                    break
                if cut == 0:
                    raise MembraneError(f"missing carbon atom name in tail {t!r}")
                names.append(cur[:cut])
                orders.append(1 if cur[cut] == "-" else 2)
                cur = cur[cut + 1 :]
            if not cur:
                raise MembraneError(f"missing last carbon atom name in tail {t!r}")
            names.append(cur)
            offsets = []
            for nm in names:
                a = first_lipid.select(f"name {nm}")
                if len(a) != 1:
                    raise MembraneError(f"tail atom {nm} not unique in lipid")
                offsets.append(int(a.indices[0]) - first_index)
            self.tails.append(
                (np.asarray(offsets, np.int64), np.asarray(orders, np.int64))
            )
        # tail end = last carbon of each tail
        self.tail_end_offsets = np.asarray(
            [t[0][-1] for t in self.tails] or [0], np.int64
        )


class LipidMolecule:
    def __init__(self, lipid_id: int, sel: Sel, species: LipidSpecies):
        self.id = lipid_id
        self.sel = sel
        self.species = species
        first = int(sel.indices[0])
        self.head_idx = sel.indices[0] + species.head_offsets
        self.mid_idx = sel.indices[0] + species.mid_offsets
        self.tail_end_idx = sel.indices[0] + species.tail_end_offsets
        self.valid = True
        self.head_marker = np.zeros(3)
        self.mid_marker = np.zeros(3)
        self.tail_marker = np.zeros(3)
        self.tail_head_vec = np.zeros(3)
        self.normal = np.array([0.0, 0.0, 1.0])
        self.patch_ids: list[int] = []
        self.neib_ids: list[int] = []
        self.fitted_patch_points: list[np.ndarray] = []
        self.voro_vertexes: list[np.ndarray] = []
        self.mean_curv = 0.0
        self.gaussian_curv = 0.0
        self.princ_curvs = np.zeros(2)
        self.princ_dirs = np.zeros((3, 2))
        self.area = 0.0
        self.order: list[np.ndarray] = [
            np.zeros(max(len(t[0]) - 2, 0)) for t in species.tails
        ]

    def update_markers(self, system: System) -> None:
        """Unwrap the lipid and recompute COM markers."""
        self.sel.unwrap_simple()
        coords = system.state.coords
        masses = system.topology.mass
        self.head_marker = measure_host.center(
            coords[self.head_idx], masses[self.head_idx]
        )
        self.mid_marker = measure_host.center(coords[self.mid_idx], masses[self.mid_idx])
        self.tail_marker = measure_host.center(
            coords[self.tail_end_idx], masses[self.tail_end_idx]
        )

    def to_lab_transform(self) -> np.ndarray:
        """Local->lab matrix (columns n x x-hat, n x (n x x-hat), -n;
        lipid_molecule.rs:190-196 — deliberately not orthonormalized)."""
        n = self.normal
        c0 = np.cross(n, [1.0, 0.0, 0.0])
        c1 = np.cross(n, c0)
        return np.stack([c0, c1, -n], axis=1)

    def compute_curvature_and_normal(self, coefs: np.ndarray, to_lab: np.ndarray):
        a, b, c, d, e, _f = coefs
        E = 1 + d * d
        F = d * e
        G = 1 + e * e
        L = 2 * a
        M = c
        N = 2 * b
        Z = E * G - F * F
        self.gaussian_curv = (L * N - M * M) / Z
        self.mean_curv = 0.5 * (E * N - 2 * F * M + G * L) / Z
        v = np.array([d, e, -1.0])
        self.normal = to_lab @ (v / np.linalg.norm(v))
        W = np.array(
            [[E * L - F * M, E * M - F * N], [G * M - F * L, G * N - F * M]]
        ) / Z
        vals, vecs = np.linalg.eigh(0.5 * (W + W.T))
        self.princ_curvs = vals
        self.princ_dirs = np.stack(
            [
                to_lab @ np.array([vecs[0, 0], vecs[1, 0], 0.0]),
                to_lab @ np.array([vecs[0, 1], vecs[1, 1], 0.0]),
            ],
            axis=1,
        )

    def compute_order(self, system: System, order_type: str, global_normal):
        normal = global_normal if global_normal is not None else self.normal
        coords = system.state.coords
        first = self.sel.indices[0]
        for k, (offsets, orders) in enumerate(self.species.tails):
            tail_coords = coords[first + offsets]
            self.order[k] = measure_host.lipid_tail_order(
                order_type, tail_coords, normal.reshape(1, 3), orders
            )


def get_quad_coefs(local_points: np.ndarray) -> Optional[np.ndarray]:
    """Least-squares quadric z = Ax^2+By^2+Cxy+Dx+Ey+F (lib.rs:844-866)."""
    x, y, z = local_points[:, 0], local_points[:, 1], local_points[:, 2]
    P = np.stack([x * x, y * y, x * y, x, y, np.ones_like(x)], axis=1)
    m = P.T @ P
    rhs = P.T @ z
    try:
        c = np.linalg.cholesky(m)
    except np.linalg.LinAlgError:
        return None
    return np.linalg.solve(m, rhs)


def _z_surf(x, y, c):
    return c[0] * x * x + c[1] * y * y + c[2] * x * y + c[3] * x + c[4] * y + c[5]


class _RunningStats:
    """Welford mean/std accumulator."""

    def __init__(self, shape=()):
        self.n = 0
        self.mean = np.zeros(shape)
        self.m2 = np.zeros(shape)

    def add(self, x):
        x = np.asarray(x, dtype=np.float64)
        self.n += 1
        d = x - self.mean
        self.mean = self.mean + d / self.n
        self.m2 = self.m2 + d * (x - self.mean)

    @property
    def std(self):
        return np.sqrt(self.m2 / self.n) if self.n > 1 else np.zeros_like(self.mean)


class LipidGroup:
    """Named lipid container with per-species running stats. Populated via
    Membrane.add_ids_to_group (reference lib.rs:288-310: leaflet/group
    membership is caller-decided)."""

    def __init__(self, name: str, lipid_ids=None, species_names=None):
        self.name = name
        self.lipid_ids = list(lipid_ids or [])
        self.species_names = sorted(set(species_names or []))
        self._init_stats()

    def _init_stats(self):
        self.per_species: dict[str, dict] = {
            sp: {
                "count": _RunningStats(),
                "area": _RunningStats(),
                "tilt": _RunningStats(),
                "mean_curv": _RunningStats(),
                "gauss_curv": _RunningStats(),
                "n_neighbors": _RunningStats(),
                "order": None,  # lazily sized per tail
                "neib_fractions": {s: _RunningStats() for s in self.species_names},
            }
            for sp in self.species_names
        }

    def frame_update(self, lipids: list[LipidMolecule]) -> None:
        by_species: dict[str, list[LipidMolecule]] = {s: [] for s in self.species_names}
        in_group = set(self.lipid_ids)
        for lid in self.lipid_ids:
            lip = lipids[lid]
            if lip.valid:
                by_species[lip.species.name].append(lip)
        for sp, lips in by_species.items():
            st = self.per_species[sp]
            st["count"].add(len(lips))
            if not lips:
                continue
            st["area"].add(np.mean([l.area for l in lips]))
            tilts = []
            for l in lips:
                cosang = np.clip(
                    l.normal
                    @ l.tail_head_vec
                    / (np.linalg.norm(l.normal) * np.linalg.norm(l.tail_head_vec)),
                    -1,
                    1,
                )
                tilts.append(np.degrees(np.arccos(cosang)))
            st["tilt"].add(np.mean(tilts))
            st["mean_curv"].add(np.mean([l.mean_curv for l in lips]))
            st["gauss_curv"].add(np.mean([l.gaussian_curv for l in lips]))
            st["n_neighbors"].add(np.mean([len(l.neib_ids) for l in lips]))
            # neighbor species fractions
            fracs = {s: 0.0 for s in self.species_names}
            total = 0
            for l in lips:
                for nid in l.neib_ids:
                    if nid in in_group:
                        fracs[lipids[nid].species.name] = (
                            fracs.get(lipids[nid].species.name, 0.0) + 1
                        )
                        total += 1
            if total:
                for s in self.species_names:
                    st["neib_fractions"][s].add(fracs.get(s, 0.0) / total)
            # order profiles averaged per tail position
            if lips[0].order:
                if st["order"] is None:
                    st["order"] = [
                        _RunningStats(o.shape) for o in lips[0].order
                    ]
                for k in range(len(lips[0].order)):
                    st["order"][k].add(
                        np.mean([l.order[k] for l in lips], axis=0)
                    )

    def save(self, outdir: str) -> None:
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"stats_{self.name}.dat")
        with open(path, "w") as fh:
            fh.write(
                "# species count area tilt_deg mean_curv gauss_curv n_neighbors (mean +- std)\n"
            )
            for sp in self.species_names:
                st = self.per_species[sp]
                fh.write(
                    f"{sp} "
                    f"{st['count'].mean:.3f}±{st['count'].std:.3f} "
                    f"{st['area'].mean:.4f}±{st['area'].std:.4f} "
                    f"{st['tilt'].mean:.2f}±{st['tilt'].std:.2f} "
                    f"{st['mean_curv'].mean:.4f}±{st['mean_curv'].std:.4f} "
                    f"{st['gauss_curv'].mean:.4f}±{st['gauss_curv'].std:.4f} "
                    f"{st['n_neighbors'].mean:.2f}±{st['n_neighbors'].std:.2f}\n"
                )
        for sp in self.species_names:
            st = self.per_species[sp]
            if st["order"] is None:
                continue
            opath = os.path.join(outdir, f"order_{self.name}_{sp}.dat")
            with open(opath, "w") as fh:
                fh.write("# carbon tail order (mean +- std) per tail\n")
                for k, acc in enumerate(st["order"]):
                    fh.write(f"# tail {k}\n")
                    for i, (m, s) in enumerate(zip(acc.mean, acc.std)):
                        fh.write(f"{i + 2} {m:.4f} {s:.4f}\n")


class Membrane:
    def __init__(self, system: System, options: str | MembraneOptions):
        if isinstance(options, str):
            options = MembraneOptions.from_toml(options)
        self.options = options
        self.system = system
        src = system.select(options.sel)
        self.lipids: list[LipidMolecule] = []
        self.resindex_to_id: dict[int, int] = {}
        self.species: list[LipidSpecies] = []
        for name, descr in options.lipids.items():
            try:
                lips_sel = src.select(descr["whole"])
            except Exception:
                continue
            per_lipid = lips_sel.split_resindex()
            if not per_lipid:
                continue
            sp = LipidSpecies(name, descr, per_lipid[0])
            self.species.append(sp)
            for lsel in per_lipid:
                lid = len(self.lipids)
                self.lipids.append(LipidMolecule(lid, lsel, sp))
                self.resindex_to_id[
                    int(system.topology.resindex[lsel.indices[0]])
                ] = lid
        if not self.lipids:
            raise MembraneError("no lipids matched the configured species")
        # Named groups start empty; membership is added by the caller
        # (add_ids_to_group) — e.g. leaflets split by marker z.
        self.groups: dict[str, LipidGroup] = {
            name: LipidGroup(name) for name in (options.groups or ["all"])
        }
        if "all" in self.groups and not options.groups:
            self.add_ids_to_group("all", [l.id for l in self.lipids])

    def add_ids_to_group(self, name: str, ids) -> None:
        gr = self.groups.get(name)
        if gr is None:
            raise MembraneError(f"no such group {name!r}")
        for i in ids:
            if not 0 <= i < len(self.lipids):
                raise MembraneError(f"lipid id {i} out of bounds")
            if not self.lipids[i].valid:
                continue
            gr.lipid_ids.append(int(i))
        gr.species_names = sorted(
            {self.lipids[i].species.name for i in gr.lipid_ids}
        )
        gr._init_stats()

    # reference python-binding name (membrane_order.py workflow)
    add_lipids_to_group = add_ids_to_group

    def set_state(self, state) -> None:
        """Swap a new frame into the analyzed system (reference
        Membrane.set_state); call before :meth:`compute` per frame."""
        self.system.set_state(state)

    def reset_groups(self) -> None:
        for gr in self.groups.values():
            gr.lipid_ids.clear()
            gr._init_stats()

    def reset_valid_lipids(self) -> None:
        for l in self.lipids:
            l.valid = True

    # -- per-frame pipeline --------------------------------------------------

    def compute(self) -> None:
        sys = self.system
        box = sys.state.require_box()
        for lip in self.lipids:
            lip.valid = True
            lip.update_markers(sys)
        self._compute_patches(self.options.cutoff)
        self._initial_normals()
        for it in range(max(self.options.max_smooth_iter, 1)):
            if self.options.n_shells_patch > 0 and it == 0:
                self._smooth()
                self._patches_from_nth_shell(self.options.n_shells_patch)
            self._smooth()
        for lip in self.lipids:
            if lip.valid:
                lip.compute_order(
                    sys, self.options.order_type, self.options.global_normal
                )
        self._smooth_curvature(self.options.n_shells_smoothing)
        for gr in self.groups.values():
            gr.frame_update(self.lipids)

    def finalize(self) -> None:
        for gr in self.groups.values():
            gr.save(self.options.output_dir)

    def write_vmd_visualization(self, path: str) -> None:
        """TCL graphics: markers, tail-head vectors, fitted normals, Voronoi
        cells (reference lib.rs write_vmd_visualization)."""
        from .vmd_visual import VmdVisual

        vis = VmdVisual()
        for lip in self._valid():
            vis.sphere(lip.head_marker, 0.8, "white")
            vis.arrow(lip.head_marker, lip.tail_head_vec, "yellow")
            vis.sphere(lip.head_marker, 0.8, "red")
            vis.arrow(lip.head_marker, lip.normal, "orange")
            n = len(lip.voro_vertexes)
            for i in range(n):
                vis.cylinder(
                    lip.voro_vertexes[i], lip.voro_vertexes[(i + 1) % n], "green"
                )
            for p in lip.fitted_patch_points:
                vis.sphere(p, 0.3, "green")
        vis.save(path)

    # -- internals ------------------------------------------------------------

    def _valid(self):
        return [l for l in self.lipids if l.valid]

    def _compute_patches(self, cutoff: float) -> None:
        box = self.system.state.require_box()
        valid = self._valid()
        markers = np.asarray([l.head_marker for l in valid], dtype=np.float32)
        ids = [l.id for l in valid]
        for lip in self.lipids:
            lip.patch_ids = []
        if len(markers) < 2:
            return
        pairs, _ = neighbor_host.search_pairs(
            cutoff, markers, np.arange(len(markers)), None, box, PBC_FULL
        )
        for a, b in pairs:
            self.lipids[ids[a]].patch_ids.append(ids[b])
            self.lipids[ids[b]].patch_ids.append(ids[a])

    def _initial_normals(self) -> None:
        for lip in self._valid():
            v = lip.head_marker - lip.tail_marker
            lip.tail_head_vec = v / np.linalg.norm(v)
        for passes in range(2):
            attr = "tail_head_vec" if passes == 0 else "normal"
            new = {}
            for lip in self._valid():
                mine = getattr(lip, attr)
                acc = mine.copy()
                for j in lip.patch_ids:
                    other = getattr(self.lipids[j], attr)
                    cosang = np.clip(
                        other @ mine / (np.linalg.norm(other) * np.linalg.norm(mine)),
                        -1,
                        1,
                    )
                    if np.arccos(cosang) <= np.pi / 2:
                        acc = acc + other
                new[lip.id] = acc / np.linalg.norm(acc)
            for lid, nv in new.items():
                self.lipids[lid].normal = nv

    def _smooth(self) -> None:
        box = self.system.state.require_box()
        saved = [l.head_marker.copy() for l in self.lipids]
        for lip in self.lipids:
            if not lip.valid:
                continue
            to_lab = lip.to_lab_transform()
            try:
                to_local = np.linalg.inv(to_lab)
            except np.linalg.LinAlgError:
                lip.valid = False
                continue
            p0 = lip.head_marker
            if not lip.patch_ids:
                lip.valid = False
                continue
            rel = np.asarray(
                [
                    box.shortest_vector((saved[j] - p0).astype(np.float32))
                    for j in lip.patch_ids
                ],
                dtype=np.float64,
            )
            local = rel @ to_local.T
            coefs = get_quad_coefs(local)
            if coefs is None:
                lip.valid = False
                continue
            vc = VoronoiCell(-10.0, 10.0, -10.0, 10.0)
            for j, p in zip(lip.patch_ids, local):
                vc.add_point(p[:2], j)
            verts = vc.vertices()
            lip.neib_ids = [i for _, i in verts if i >= 0]
            if len(lip.neib_ids) < len(verts):
                lip.valid = False  # patch touches the bounding wall
                continue
            lip.compute_curvature_and_normal(coefs, to_lab)
            voro = []
            for pos, _ in verts:
                x, y = pos
                voro.append(to_lab @ np.array([x, y, _z_surf(x, y, coefs)]))
            lip.voro_vertexes = voro
            n = len(voro)
            lip.area = sum(
                0.5 * np.linalg.norm(np.cross(voro[i], voro[(i + 1) % n]))
                for i in range(n)
            )
            lip.fitted_patch_points = [
                saved[j]
                + to_lab @ np.array([0.0, 0.0, _z_surf(p[0], p[1], coefs) - p[2]])
                for j, p in zip(lip.patch_ids, local)
            ]
            if abs(coefs[5]) > 0.5:
                lip.valid = False
                continue
            lip.head_marker = p0 + to_lab @ np.array([0.0, 0.0, coefs[5]])

        # marker smoothing over fitted patch projections
        smooth_n = np.ones(len(self.lipids))
        smooth_p = np.stack([l.head_marker for l in self.lipids])
        for lip in self._valid():
            for j, p in zip(lip.patch_ids, lip.fitted_patch_points):
                smooth_n[j] += 1
                smooth_p[j] = smooth_p[j] + p
        for lip in self._valid():
            lip.head_marker = smooth_p[lip.id] / smooth_n[lip.id]
        for lip in self._valid():
            lip.voro_vertexes = [v + lip.head_marker for v in lip.voro_vertexes]

    def _patches_from_nth_shell(self, n_neib: int) -> None:
        if n_neib < 1:
            return
        for lip in self._valid():
            shell = set(lip.neib_ids)
            for _ in range(2, n_neib + 1):
                for x in list(shell):
                    shell.update(self.lipids[x].neib_ids)
            lip.patch_ids = sorted(shell)

    def _smooth_curvature(self, n_neib: int) -> None:
        if n_neib < 1:
            return
        mean = [l.mean_curv for l in self.lipids]
        gauss = [l.gaussian_curv for l in self.lipids]
        for lip in self._valid():
            shell = set(lip.neib_ids)
            for _ in range(2, n_neib + 1):
                for x in list(shell):
                    shell.update(self.lipids[x].neib_ids)
            vals = [j for j in shell if self.lipids[j].valid]
            if vals:
                lip.mean_curv = (mean[lip.id] + sum(mean[j] for j in vals)) / (
                    len(vals) + 1
                )
                lip.gaussian_curv = (gauss[lip.id] + sum(gauss[j] for j in vals)) / (
                    len(vals) + 1
                )
