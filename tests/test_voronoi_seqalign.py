"""Direct unit tests: 2D Voronoi cell clipping (voronoi_cell.rs) and
affine-gap global alignment (seq_align.rs:48)."""

import numpy as np
import pytest

from molar_tpu.ops.seq_align import Op, global_align_affine, matching_atoms_by_name
from molar_tpu.ops.voronoi import VoronoiCell


def test_voronoi_square_lattice_cell():
    cell = VoronoiCell(-5, 5, -5, 5)
    # neighbors of a unit square lattice site, relative coordinates
    for nid, p in enumerate([(1, 0), (-1, 0), (0, 1), (0, -1)]):
        assert cell.add_point(p, nid)
    assert cell.area() == pytest.approx(1.0)
    assert cell.neighbor_ids() == [0, 1, 2, 3]


def test_voronoi_far_point_no_cut():
    cell = VoronoiCell(-1, 1, -1, 1)
    assert not cell.add_point((100.0, 0.0), 7)
    assert cell.area() == pytest.approx(4.0)
    assert cell.neighbor_ids() == []


def test_voronoi_hexagonal_cell():
    cell = VoronoiCell(-5, 5, -5, 5)
    ang = np.deg2rad(np.arange(0, 360, 60))
    for nid, a in enumerate(ang):
        cell.add_point((np.cos(a), np.sin(a)), nid)
    # regular hexagon with inradius 1/2: area = 2*sqrt(3)*r^2
    assert cell.area() == pytest.approx(2 * np.sqrt(3) * 0.25, rel=1e-6)
    assert len(cell.neighbor_ids()) == 6


def test_align_identical():
    aln = global_align_affine("ABCD", "ABCD", -10, -1, lambda a, b: 1 if a == b else -1)
    assert aln.score == 4
    assert all(op is Op.MATCH for op in aln.operations)


def test_align_with_gap():
    aln = global_align_affine(
        "ABCD", "ABD", -2, -1, lambda a, b: 1 if a == b else -1
    )
    ops = aln.operations
    assert ops.count(Op.INS) == 1  # C unmatched in x
    assert ops.count(Op.MATCH) == 3


def test_matching_atoms_by_name():
    n1 = ["N", "CA", "C", "O", "CB"]
    n2 = ["N", "CA", "C", "CB"]  # O missing
    mx, my = matching_atoms_by_name(n1, n2)
    assert [n1[i] for i in mx] == [n2[j] for j in my] == ["N", "CA", "C", "CB"]
