"""Topology / atom-model semantics tests."""

import numpy as np
import pytest

from molar_tpu.core import Atom, Topology
from molar_tpu.core.periodic_table import (
    atomic_number_from_symbol,
    guess_element_from_name,
    vdw_radius,
)


def make_top():
    atoms = [
        Atom(name="N", resname="ALA", resid=1).guess_element_and_mass(),
        Atom(name="CA", resname="ALA", resid=1).guess_element_and_mass(),
        Atom(name="C", resname="ALA", resid=1).guess_element_and_mass(),
        Atom(name="N", resname="GLY", resid=2).guess_element_and_mass(),
        Atom(name="CA", resname="GLY", resid=2).guess_element_and_mass(),
        Atom(name="OW", resname="SOL", resid=3).guess_element_and_mass(),
    ]
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    return top


def test_element_guessing():
    # "CA" in a protein residue is an alpha carbon, not calcium.
    assert guess_element_from_name("CA", "ALA") == 6
    # ...but a free CA ion (name == resname) is calcium.
    assert guess_element_from_name("CA", "CA") == 20
    assert guess_element_from_name("CL", "CL") == 17
    assert guess_element_from_name("SOD", "SOD") == 11
    assert guess_element_from_name("POT", "POT") == 19
    # Name guessing is ambiguous by design: "SG" two-letter-matches seaborgium
    # (reference: atom.rs:485-488); the PDB element column is what rescues
    # cysteine gamma sulfurs (io.rs:987-998).
    assert guess_element_from_name("SG", "CYS") == 106
    assert guess_element_from_name("FE", "HEM") == 26
    assert guess_element_from_name("1HB1", "ALA") == 1
    assert guess_element_from_name("OW", "SOL") == 8
    assert guess_element_from_name("123", "X") == 0


def test_explicit_symbol():
    assert atomic_number_from_symbol("Cl") == 17
    assert atomic_number_from_symbol("SE") == 34
    assert atomic_number_from_symbol(" c ") == 6
    assert atomic_number_from_symbol("") == 0
    assert atomic_number_from_symbol("Xx") == 0


def test_vdw_units():
    assert abs(vdw_radius(1) - 0.12) < 1e-6  # H: 1.2 A -> 0.12 nm
    assert abs(vdw_radius(0) - 0.15) < 1e-6  # unknown


def test_resindex_contiguous_runs():
    atoms = [
        Atom(resid=5),
        Atom(resid=5),
        Atom(resid=7),
        Atom(resid=5),  # resid 5 again: NEW resindex (contiguous runs, not unique ids)
        Atom(resid=-2),  # negative resid is legal
    ]
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    assert top.resindex.tolist() == [0, 0, 1, 2, 3]


def test_columns_and_pools():
    top = make_top()
    assert top.n_atoms == 6
    assert top.names().tolist() == ["N", "CA", "C", "N", "CA", "OW"]
    assert top.resnames()[0] == "ALA"
    assert top.atomic_number.tolist() == [7, 6, 6, 7, 6, 8]
    assert top.resindex.tolist() == [0, 0, 0, 1, 1, 2]
    assert top.mass[0] == pytest.approx(14.0067, abs=1e-4)


def test_optional_column_materialization():
    top = make_top()
    assert top.type_name is None
    col = top.ensure_type_name()
    assert col.shape == (6,)
    assert top.type_names()[0] == ""  # unset default


def test_bonds_renumbering_on_remove():
    top = make_top()
    top.set_bonds([[0, 1], [1, 2], [3, 4]])
    adj = top.adjacency
    assert adj.of(1).tolist() == [0, 2]
    out = top.remove_atoms([2])
    # bond (1,2) dies, (3,4) renumbers to (2,3)
    assert out.bonds.tolist() == [[0, 1], [2, 3]]
    assert out.n_atoms == 5


def test_bond_validation():
    top = make_top()
    with pytest.raises(Exception):
        top.set_bonds([[0, 99]])
    with pytest.raises(Exception):
        top.set_bonds([[1, 1]])


def test_subset_and_concat():
    top = make_top()
    top.set_bonds([[0, 1], [1, 2]])
    sub = top.subset(np.array([0, 1, 2]))
    assert sub.n_atoms == 3
    assert sub.bonds.tolist() == [[0, 1], [1, 2]]
    both = sub.concat(sub)
    assert both.n_atoms == 6
    assert both.bonds.tolist() == [[0, 1], [1, 2], [3, 4], [4, 5]]
    assert both.names().tolist() == ["N", "CA", "C", "N", "CA", "C"]


def test_adjacency_survives_order_write():
    top = make_top()
    top.set_bonds([[0, 1]])
    adj1 = top.adjacency
    top.set_bond_orders(np.array([2], np.uint8))
    assert top.adjacency is adj1  # cache kept
    top.add_bonds([[1, 2]])
    assert top.adjacency is not adj1  # structural change invalidates
