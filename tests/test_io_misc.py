"""SDF/ITP/NDX + unwrap tests."""

import numpy as np
import pytest

from molar_tpu import PBC_FULL, PeriodicBox, System
from molar_tpu.core import Atom, BondOrder, State, Topology
from molar_tpu.io import FileHandler, read_file
from molar_tpu.io.ndx import NdxFile

ETHENE = """ethene
  test

  6  5  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.3300    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5600    0.9300    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.5600   -0.9300    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
    1.8900    0.9300    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
    1.8900   -0.9300    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  2  0  0  0  0
  1  3  1  0  0  0  0
  1  4  1  0  0  0  0
  2  5  1  0  0  0  0
  2  6  1  0  0  0  0
M  CHG  1   1   1
M  END
$$$$
"""


def test_sdf_read(tmp_path):
    p = tmp_path / "e.sdf"
    p.write_text(ETHENE)
    top, st = read_file(str(p))
    assert top.n_atoms == 6
    assert top.atomic_number.tolist() == [6, 6, 1, 1, 1, 1]
    assert top.n_bonds == 5
    assert top.bond_orders is not None
    assert int(top.bond_orders[0]) == int(BondOrder.DOUBLE)
    assert top.formal_charge is not None
    assert top.formal_charge[0] == 1
    # Angstrom -> nm
    np.testing.assert_allclose(st.coords[1], [0.133, 0.0, 0.0], atol=1e-6)


def test_sdf_roundtrip(tmp_path):
    p = tmp_path / "e.sdf"
    p.write_text(ETHENE)
    top, st = read_file(str(p))
    out = tmp_path / "o.sdf"
    with FileHandler(str(out), "w") as fh:
        fh.write(top, st)
    top2, st2 = read_file(str(out))
    assert top2.n_atoms == 6
    assert top2.bonds.tolist() == top.bonds.tolist()
    assert top2.bond_orders.tolist() == top.bond_orders.tolist()
    assert top2.formal_charge.tolist() == top.formal_charge.tolist()
    np.testing.assert_allclose(st2.coords, st.coords, atol=1.1e-5)


def test_sdf_multi_record(tmp_path):
    p = tmp_path / "multi.sdf"
    p.write_text(ETHENE + ETHENE)
    fh = FileHandler(str(p))
    frames = list(fh.iter_states())
    assert len(frames) == 2
    fh.close()


ITP = """; test itp
[ moleculetype ]
MOL 3
[ atoms ]
     1   CT      1    LIG     C1      1    -0.10    12.011
     2   HC      1    LIG     H1      2     0.05     1.008
     3   HC      1    LIG     H2      3     0.05     1.008
[ bonds ]
    1    2    1
    1    3    1
"""


def test_itp_read(tmp_path):
    p = tmp_path / "m.itp"
    p.write_text(ITP)
    with FileHandler(str(p)) as fh:
        top = fh.read_topology()
    assert top.n_atoms == 3
    assert top.names().tolist() == ["C1", "H1", "H2"]
    assert top.type_names().tolist() == ["CT", "HC", "HC"]
    assert top.mass[0] == pytest.approx(12.011)
    assert top.charge[0] == pytest.approx(-0.10)
    assert top.atomic_number.tolist() == [6, 1, 1]
    assert top.bonds.tolist() == [[0, 1], [0, 2]]


def test_ndx_roundtrip(tmp_path):
    p = tmp_path / "g.ndx"
    p.write_text("[ Protein ]\n1 2 3 10\n11 12\n[ CA ]\n2 5\n")
    ndx = NdxFile.read(str(p))
    assert set(ndx) == {"Protein", "CA"}
    assert ndx["Protein"].tolist() == [0, 1, 2, 9, 10, 11]
    assert ndx["CA"].tolist() == [1, 4]
    out = tmp_path / "o.ndx"
    ndx.write(str(out))
    ndx2 = NdxFile.read(str(out))
    assert ndx2["Protein"].tolist() == ndx["Protein"].tolist()


def test_unwrap_connectivity():
    # Two molecules; one split across the periodic boundary.
    box = PeriodicBox(np.diag([3.0, 3.0, 3.0]))
    coords = np.array(
        [
            [0.05, 1.0, 1.0],   # mol A atom at left edge
            [2.95, 1.0, 1.0],   # mol A atom wrapped to right edge (true dist 0.1)
            [1.5, 1.5, 1.5],    # mol B
            [1.6, 1.5, 1.5],    # mol B
        ],
        dtype=np.float32,
    )
    atoms = [Atom(name="C", resid=i + 1).guess_element_and_mass() for i in range(4)]
    top = Topology.from_atoms(atoms)
    s = System(top, State(coords=coords, box=box))
    sel = s.select_all()
    pieces = sel.unwrap_connectivity(0.2)
    assert len(pieces) == 2
    assert sorted(len(p) for p in pieces) == [2, 2]
    # after unwrap, the split molecule is contiguous
    c = s.state.coords
    assert abs(np.linalg.norm(c[0] - c[1]) - 0.1) < 1e-5


def test_unwrap_simple():
    box = PeriodicBox(np.diag([3.0, 3.0, 3.0]))
    coords = np.array([[0.1, 1, 1], [2.9, 1, 1], [0.3, 1, 1]], dtype=np.float32)
    top = Topology.from_atoms(
        [Atom(name="C", resid=1).guess_element_and_mass() for _ in range(3)]
    )
    s = System(top, State(coords=coords, box=box))
    s.select_all().unwrap_simple()
    c = s.state.coords
    np.testing.assert_allclose(c[1], [-0.1, 1, 1], atol=1e-5)
