"""Incremental 2D Voronoi cell for one lipid's patch.

Mirrors the reference ``VoronoiCell`` (molar/src/voronoi_cell.rs): the cell of
the point at the ORIGIN, built by successively cutting a bounding rectangle
with the perpendicular bisector half-plane towards each neighbor (cutting line
``(p/2) . x <= |p/2|^2``). Every edge carries the id of the neighbor whose
bisector created it (negative ids = the initial rectangle sides), so direct
neighbors and the in-plane area fall out of the final polygon.
"""

from __future__ import annotations

import numpy as np

TOL = 1e-10


class VoronoiCell:
    def __init__(self, xmin: float, xmax: float, ymin: float, ymax: float):
        self.verts = [
            np.array([xmin, ymin]),
            np.array([xmax, ymin]),
            np.array([xmax, ymax]),
            np.array([xmin, ymax]),
        ]
        # edge_ids[i] = id of the edge from verts[i] to verts[i+1]
        self.edge_ids = [-1, -2, -3, -4]

    def add_point(self, point, neighbor_id: int) -> bool:
        """Cut with the bisector towards ``point``; True if the cell changed."""
        p = np.asarray(point, dtype=np.float64)
        n = 0.5 * p
        c = float(n @ n)
        if c < TOL:
            return False
        d = [float(n @ v) - c for v in self.verts]
        if all(di < TOL for di in d):
            return False  # all inside, no cut
        if all(di >= TOL for di in d):
            # Degenerate: whole cell clipped away (shouldn't happen for sane
            # patches); keep as-is.
            return False
        m = len(self.verts)
        out_v: list[np.ndarray] = []
        out_id: list[int] = []
        for i in range(m):
            a = self.verts[i]
            b = self.verts[(i + 1) % m]
            ia = self.edge_ids[i]
            da, db = d[i], d[(i + 1) % m]
            inside_a = da < TOL
            inside_b = db < TOL
            if inside_a:
                out_v.append(a)
                out_id.append(ia)
                if not inside_b:
                    t = da / (da - db)
                    out_v.append(a + t * (b - a))
                    out_id.append(neighbor_id)
            elif inside_b:
                t = da / (da - db)
                out_v.append(a + t * (b - a))
                out_id.append(ia)
        self.verts = out_v
        self.edge_ids = out_id
        return True

    def area(self) -> float:
        """Shoelace area of the cell polygon."""
        v = np.asarray(self.verts)
        if len(v) < 3:
            return 0.0
        x, y = v[:, 0], v[:, 1]
        return float(
            0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
        )

    def neighbor_ids(self) -> list[int]:
        """Ids of neighbors owning an edge of the final cell (direct
        neighbors); excludes the initial rectangle's negative ids."""
        return sorted({i for i in self.edge_ids if i >= 0})

    def vertices(self):
        """(position, outgoing edge id) pairs, counterclockwise."""
        return list(zip(self.verts, self.edge_ids))
