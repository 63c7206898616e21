"""GAFF typing tests: unit cases + the 597-molecule antechamber parity corpus."""

import json

import numpy as np
import pytest

from molar_tpu.ff import FFError, gaff_types
from molar_tpu.ff.gaff import aromatic, detect_rings, ring_property, _build_adj

TARGET = 0.995  # reference gaff_parity.rs threshold


def test_benzene_types():
    # benzene: 6 aromatic C (ca) + 6 H (ha)
    z = [6] * 6 + [1] * 6
    bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2), (5, 0, 1)]
    bonds += [(i, i + 6, 1) for i in range(6)]
    types = gaff_types(z, bonds)
    assert types[:6] == ["ca"] * 6
    assert types[6:] == ["ha"] * 6


def test_methane_ethanol():
    # methane: c3 + 4 hc
    types = gaff_types([6, 1, 1, 1, 1], [(0, k, 1) for k in range(1, 5)])
    assert types == ["c3", "hc", "hc", "hc", "hc"]
    # ethanol C-C-O-H: c3 c3 oh + h's
    z = [6, 6, 8, 1, 1, 1, 1, 1, 1]
    bonds = [(0, 1, 1), (1, 2, 1), (2, 3, 1)]
    bonds += [(0, 4, 1), (0, 5, 1), (0, 6, 1), (1, 7, 1), (1, 8, 1)]
    types = gaff_types(z, bonds)
    assert types[0] == "c3"
    assert types[1] == "c3"
    assert types[2] == "oh"
    assert types[3] == "ho"
    assert types[4] == "hc"
    assert types[7] == "h1"  # H on C bonded to electronegative O


def test_carbonyl():
    # acetone: C-C(=O)-C
    z = [6, 6, 8, 6] + [1] * 6
    bonds = [(0, 1, 1), (1, 2, 2), (1, 3, 1)]
    bonds += [(0, 4, 1), (0, 5, 1), (0, 6, 1), (3, 7, 1), (3, 8, 1), (3, 9, 1)]
    types = gaff_types(z, bonds)
    assert types[1] == "c"  # carbonyl carbon
    assert types[2] == "o"  # carbonyl oxygen


def test_ring_detection():
    # cyclohexane ring of sp3 carbons with H: eligible (connum>2 for C)
    z = [6] * 6 + [1] * 12
    bonds = [(i, (i + 1) % 6, 1) for i in range(6)]
    k = 6
    for i in range(6):
        bonds += [(i, k, 1), (i, k + 1, 1)]
        k += 2
    adj = _build_adj(len(z), bonds)
    rings = detect_rings(z, adj)
    assert len(rings) == 1 and len(rings[0]) == 6
    rg = ring_property(len(z), rings)
    assert rg[0][6] == 1
    ar, ewd, nr = aromatic(z, adj, bonds, rings, rg)
    assert ar[0][5] == 1  # AR5 aliphatic


def test_element_fallback_rules():
    # The DEF ends with per-element fallback rules, so exotic elements get
    # their symbol as the type (antechamber behavior) rather than an error.
    assert gaff_types([99], []) == ["Es"]
    assert gaff_types([2], []) == ["He"]


@pytest.mark.parametrize("ff,refjson", [("gaff", "references.json"),
                                        ("gaff2", "references_gaff2.json")])
def test_antechamber_corpus_parity(ref_data, ff, refjson):
    """Per-atom accuracy >= 0.995 on the full committed corpus
    (reference molar_ff/tests/gaff_parity.rs)."""
    import pathlib

    base = pathlib.Path("/root/reference/molar_ff/tests/data/gaff_ref")
    if not base.is_dir():
        pytest.skip("gaff corpus not available")
    from molar_tpu import System
    from molar_tpu.ff import apply_ff

    refs = json.loads((base / refjson).read_text())
    atoms = matched = 0
    for mol in refs["molecules"]:
        sys = System.from_file(str(base / "sdf" / f"{mol['name']}.sdf"))
        types = apply_ff(sys, ff)
        for i, a in enumerate(mol["atoms"]):
            atoms += 1
            matched += types[i] == a.get("gaff2", a.get("gaff"))
    acc = matched / atoms
    assert acc >= TARGET, f"{ff} accuracy {acc:.4f} < {TARGET}"
