"""Ring/aromaticity/valence perception tests (mirrors perception.rs tests)."""

import numpy as np
import pytest

from molar_tpu.core import Atom, BondOrder, Topology
from molar_tpu.ops.perception import (
    Perception,
    implicit_hydrogens,
    perceive,
    sssr_rings,
)

S, D, T, A = (
    int(BondOrder.SINGLE),
    int(BondOrder.DOUBLE),
    int(BondOrder.TRIPLE),
    int(BondOrder.AROMATIC),
)


def topo(zs, bonds):
    top = Topology.from_atoms([Atom(name="X", atomic_number=z) for z in zs])
    if bonds:
        top.set_bonds([(i, j) for i, j, _ in bonds], [o for _, _, o in bonds])
    return top


def benzene():
    return topo(
        [6] * 6,
        [(0, 1, D), (1, 2, S), (2, 3, D), (3, 4, S), (4, 5, D), (5, 0, S)],
    )


def test_benzene_aromatic():
    t = benzene()
    p = perceive(t)
    assert len(p.rings) == 1
    assert len(p.aromatic_rings()) == 1
    assert all(o == A for o in t.bond_orders)
    assert all(f & 0x3 == 0x3 for f in t.flags)  # in-ring + aromatic


def test_cyclohexane_not_aromatic():
    t = topo([6] * 6, [(i, (i + 1) % 6, S) for i in range(6)])
    p = perceive(t)
    assert len(p.rings) == 1
    assert len(p.aromatic_rings()) == 0
    assert all(o == S for o in t.bond_orders)


def test_pyridine_pyrrole_furan():
    # pyridine: N with ring double -> aromatic
    t = topo([7, 6, 6, 6, 6, 6], [(0, 1, D), (1, 2, S), (2, 3, D), (3, 4, S), (4, 5, D), (5, 0, S)])
    assert len(perceive(t).aromatic_rings()) == 1
    # pyrrole: N lone pair, 5-ring
    t = topo([7, 6, 6, 6, 6], [(0, 1, S), (1, 2, D), (2, 3, S), (3, 4, D), (4, 0, S)])
    assert len(perceive(t).aromatic_rings()) == 1
    # furan
    t = topo([8, 6, 6, 6, 6], [(0, 1, S), (1, 2, D), (2, 3, S), (3, 4, D), (4, 0, S)])
    assert len(perceive(t).aromatic_rings()) == 1


def test_exocyclic_carbonyl_breaks_aromaticity():
    # cyclopentadienone-like: ring with exocyclic C=O
    t = topo(
        [6, 6, 6, 6, 6, 8],
        [(0, 1, D), (1, 2, S), (2, 3, D), (3, 4, S), (4, 0, S), (4, 5, D)],
    )
    assert len(perceive(t).aromatic_rings()) == 0


def test_naphthalene_two_rings():
    # fused 6-6: 10 atoms, 11 bonds -> 2 SSSR rings
    bonds = [
        (0, 1, D), (1, 2, S), (2, 3, D), (3, 4, S), (4, 5, D), (5, 0, S),
        (4, 6, S), (6, 7, D), (7, 8, S), (8, 9, D), (9, 5, S),
    ]
    t = topo([6] * 10, bonds)
    p = perceive(t)
    assert len(p.rings) == 2
    assert all(len(r) == 6 for r in p.rings)
    assert len(p.aromatic_rings()) == 2


def test_sssr_count_cyclomatic():
    # two disconnected triangles
    t = topo([6] * 6, [(0, 1, S), (1, 2, S), (2, 0, S), (3, 4, S), (4, 5, S), (5, 3, S)])
    rings = sssr_rings(6, t.bonds)
    assert len(rings) == 2


def test_implicit_hydrogens():
    # methane C: 4 implicit H
    t = topo([6], [])
    assert implicit_hydrogens(t).tolist() == [4]
    # ethene: each C has 2
    t = topo([6, 6], [(0, 1, D)])
    assert implicit_hydrogens(t).tolist() == [2, 2]
    # benzene (kekule): 1 each
    t = benzene()
    assert implicit_hydrogens(t).tolist() == [1] * 6
    # benzene aromatized: still 1 each
    perceive(t)
    assert implicit_hydrogens(t).tolist() == [1] * 6
    # ammonium N+ (formal charge +1): 4 H
    t = topo([7], [])
    t.ensure_formal_charge()[0] = 1
    assert implicit_hydrogens(t).tolist() == [4]
    # water O: 2
    t = topo([8], [])
    assert implicit_hydrogens(t).tolist() == [2]


def test_total_charge():
    t = topo([7, 8], [])
    t.ensure_formal_charge()[:] = [1, -1]
    assert perceive(t).total_charge == 0.0
