"""Selection language tests: parser, evaluator, subset semantics.

Oracle strategy: independent numpy predicates recomputed directly from
topology columns (not through the selection engine), on the reference's
protein.pdb fixture, plus hand-built micro-systems for bond-graph and
coordinate cases. If a developer drops the reference's albumin.pdb into
tests/, the committed VMD/Pteros parity fixtures also run (see
test_vmd_pteros_parity).
"""

import re

import numpy as np
import pytest

import molar_tpu as mt
from molar_tpu import SelectionExpr, SelectionSyntaxError, System
from molar_tpu.selection.evaluator import PROTEIN_RESNAMES, WATER_RESNAMES


@pytest.fixture(scope="module")
def protein(ref_data):
    return System.from_file(str(ref_data / "protein.pdb"))


def idx(sys, text):
    return SelectionExpr(text).apply(sys.topology, sys.state).tolist()


# -- parser ----------------------------------------------------------------


def test_parse_errors():
    # NOTE: "name CA andresid 1" is VALID — barewords starting with and/or are
    # str values unless followed by a word boundary (grammar.rs str_value,
    # reference test "name android orbital").
    for bad in ["", "nme CA", "name", "resid 1:", "(name CA",
                "backboneand protein", "x", "protein and"]:
        with pytest.raises(SelectionSyntaxError):
            SelectionExpr(bad)


def test_parse_ok():
    for good in [
        "name CA",
        "name CA CB /C.*/",
        "resid 1:5 7 -3:-1",
        "resindex 0:10",
        "index 5 8",
        "chain A B",
        "protein and not name CA",
        "backbone or water",
        "same residue as (name CA and resid 10)",
        "within 0.5 pbc of resname LIG",
        "within 0.5 pbc yyn self of protein",
        "within 0.5 of com of protein",
        "x < 5.0",
        "mass > 12 and charge < 0",
        "0 <= x <= 3.5",
        "sqrt(x^2 + y^2) < 2",
        "occ >= 0.5 and beta < 30",
        "dist point 1 2 3 < 0.5",
        "dist pbc plane 0 0 0 1 0 0 0 1 0 > 1",
        "not (protein or water)",
        "all",
        "name android orbital",  # barewords starting with and/or are values
        "-x + 2 > 1",
    ]:
        SelectionExpr(good)


def test_word_boundary():
    with pytest.raises(SelectionSyntaxError):
        SelectionExpr("proteinand water")


# -- keyword evaluation on the protein fixture ------------------------------


def test_name_keyword(protein):
    want = np.nonzero(protein.topology.names() == "CA")[0].tolist()
    assert idx(protein, "name CA") == want


def test_multi_name_and_regex(protein):
    names = protein.topology.names()
    want = np.nonzero(np.isin(names, ["CA", "CB"]))[0].tolist()
    assert idx(protein, "name CA CB") == want
    rx = np.array([bool(re.fullmatch("C.*", s)) for s in names])
    assert idx(protein, "name /C.*/") == np.nonzero(rx)[0].tolist()


def test_resid_and_ranges(protein):
    resid = protein.topology.resid
    lo, hi = int(resid.min()), int(resid.min()) + 2
    other = int(resid.max())
    want = np.nonzero((resid >= lo) & (resid <= hi) | (resid == other))[0]
    assert len(want) > 0
    assert idx(protein, f"resid {lo}:{hi} {other}") == want.tolist()


def test_index_resindex(protein):
    assert idx(protein, "index 0 5 7") == [0, 5, 7]
    ri = protein.topology.resindex
    assert idx(protein, "resindex 3") == np.nonzero(ri == 3)[0].tolist()


def test_chain(protein):
    chains = protein.topology.chain
    vals = np.unique(chains)
    c = str(vals[0])
    if c.strip():
        assert idx(protein, f"chain {c}") == np.nonzero(chains == c)[0].tolist()


def test_compounds(protein):
    resnames = protein.topology.resnames()
    names = protein.topology.names()
    prot = np.isin(resnames, sorted(PROTEIN_RESNAMES))
    assert idx(protein, "protein") == np.nonzero(prot)[0].tolist()
    bb = prot & np.isin(names, ["C", "N", "O", "CA"])
    assert idx(protein, "backbone") == np.nonzero(bb)[0].tolist()
    assert idx(protein, "sidechain") == np.nonzero(prot & ~bb)[0].tolist()
    wat = np.isin(resnames, sorted(WATER_RESNAMES))
    assert idx(protein, "water") == np.nonzero(wat)[0].tolist()
    assert idx(protein, "now") == np.nonzero(~wat)[0].tolist()

    def first_alpha_h(s):
        for ch in s:
            if ch.isalpha():
                return ch == "H"
        return False

    hyd = np.array([first_alpha_h(s) for s in names])
    assert idx(protein, "hydrogen") == np.nonzero(hyd)[0].tolist()
    assert idx(protein, "noh") == np.nonzero(~hyd)[0].tolist()


def test_logic(protein):
    names = protein.topology.names()
    resid = protein.topology.resid
    a = np.isin(names, ["CA"])
    b = resid < 100
    assert idx(protein, "name CA and resid -999:99") == np.nonzero(a & b)[0].tolist()
    assert idx(protein, "name CA or name CB") == np.nonzero(
        np.isin(names, ["CA", "CB"])
    )[0].tolist()
    assert idx(protein, "protein and not name CA") == [
        i for i in idx(protein, "protein") if names[i] != "CA"
    ]


def test_and_or_same_precedence_left_assoc(protein):
    # "a or b and c" == "(a or b) and c" (grammar precedence parity)
    got = idx(protein, "name CA or name CB and resid 1:50")
    names = protein.topology.names()
    resid = protein.topology.resid
    want = np.nonzero(
        (np.isin(names, ["CA", "CB"])) & ((resid >= 1) & (resid <= 50))
    )[0].tolist()
    assert got == want


def test_same_residue(protein):
    got = idx(protein, "same residue as name SG")
    ri = protein.topology.resindex
    names = protein.topology.names()
    targets = np.unique(ri[names == "SG"])
    assert got == np.nonzero(np.isin(ri, targets))[0].tolist()


def test_math_comparisons(protein):
    c = protein.state.coords
    m = protein.topology.mass
    assert idx(protein, "x < 4.0") == np.nonzero(c[:, 0] < 4.0)[0].tolist()
    assert idx(protein, "mass > 13") == np.nonzero(m > 13)[0].tolist()
    want = np.nonzero((c[:, 0] + c[:, 1] > 10.0))[0].tolist()
    assert idx(protein, "x + y > 10.0") == want
    want = np.nonzero((2.0 < c[:, 2]) & (c[:, 2] <= 4.0))[0].tolist()
    assert idx(protein, "2.0 < z <= 4.0") == want
    r = np.sqrt(c[:, 0] ** 2 + c[:, 1] ** 2)
    assert idx(protein, "sqrt(x^2 + y^2) < 5") == np.nonzero(r < 5)[0].tolist()


def test_dist_point(protein):
    c = protein.state.coords.astype(np.float64)
    p = np.array([4.0, 4.0, 4.0])
    d = np.linalg.norm(c - p, axis=1)
    assert idx(protein, "dist point 4 4 4 < 1.0") == np.nonzero(d < 1.0)[0].tolist()


def test_within_point_and_sel(protein):
    c = protein.state.coords.astype(np.float64)
    p = np.array([4.0, 4.0, 4.0])
    d2 = np.sum((c - p) ** 2, axis=1)
    assert idx(protein, "within 1.0 of 4.0 4.0 4.0") == np.nonzero(d2 <= 1.0)[0].tolist()
    # within of selection, non-pbc; includes the target atoms themselves (d=0)
    rid = int(protein.topology.resid[len(protein.topology.resid) // 2])
    got = idx(protein, f"within 0.5 of resid {rid}")
    tgt = np.nonzero(protein.topology.resid == rid)[0]
    dmin = np.min(
        np.linalg.norm(c[:, None, :] - c[tgt][None, :, :], axis=2), axis=1
    )
    want = np.nonzero(dmin <= 0.5)[0].tolist()
    assert got == want


def test_within_pbc(protein):
    rid = int(protein.topology.resid[0])
    got = idx(protein, f"within 0.5 pbc of resid {rid}")
    box = protein.state.box
    c = protein.state.coords
    tgt = np.nonzero(protein.topology.resid == rid)[0]
    assert len(tgt) > 0
    hits = []
    for i in range(len(c)):
        sv = box.shortest_vector(c[tgt] - c[i])
        if (np.sum(sv * sv, axis=1) <= 0.25).any():
            hits.append(i)
    assert got == hits


def test_within_self_flag(protein):
    base = set(idx(protein, "within 0.5 of name SG"))
    with_self = set(idx(protein, "within 0.5 self of name SG"))
    sg = set(np.nonzero(protein.topology.names() == "SG")[0].tolist())
    # plain within already contains the inner atoms (d=0 self-match)
    assert sg <= base
    assert with_self == base | sg


def test_com_cog_vectors(protein):
    ca = protein.select("name CA")
    com = protein.select("protein").com()
    got = idx(protein, "within 1.0 of com of protein")
    c = protein.state.coords.astype(np.float64)
    d2 = np.sum((c - com) ** 2, axis=1)
    assert got == np.nonzero(d2 <= 1.0)[0].tolist()


def test_all(protein):
    assert idx(protein, "all") == list(range(protein.n_atoms))


def test_subselection_semantics(protein):
    sel = protein.select("protein")
    sub = sel.select("name CA")
    assert np.array_equal(
        sub.indices, protein.select("protein and name CA").indices
    )
    # local integer sub-selection maps to global
    sub2 = sel.select([0, 1, 2])
    assert np.array_equal(sub2.indices, sel.indices[:3])


def test_set_ops(protein):
    ca = protein.select("name CA")
    cb = protein.select("name CB")
    both = ca | cb
    assert len(both) == len(ca) + len(cb)
    assert len(ca & both) == len(ca)
    assert np.array_equal((both - cb).indices, ca.indices)
    inv = ~ca
    assert len(inv) == protein.n_atoms - len(ca)


def test_empty_selection_is_error(protein):
    with pytest.raises(mt.SelectionError):
        protein.select("resname NOSUCHRES")


def test_splits(protein):
    sel = protein.select("protein")
    parts = sel.split_resindex()
    assert sum(len(p) for p in parts) == len(sel)
    ri = protein.topology.resindex
    for p in parts:
        assert len(np.unique(ri[p.indices])) == 1
    seg = sel.segment_ids()
    assert seg[0] == 0 and seg[-1] == len(parts) - 1


def test_per_frame_reapply_caches_static(protein):
    # Static expr: second apply must hit the cache (same result object).
    e = SelectionExpr("protein and name CA")
    r1 = e.apply(protein.topology, protein.state)
    r2 = e.apply(protein.topology, protein.state)
    assert np.array_equal(r1, r2)
    # Dynamic expr recomputes with moved coords.
    e2 = SelectionExpr("name CA and x < 4.0")
    a = e2.apply(protein.topology, protein.state)
    st2 = protein.state.copy()
    st2.coords = st2.coords + np.float32(100.0)
    b = e2.apply(protein.topology, st2)
    assert len(a) > 0 and len(b) == 0


def test_velocities_required(protein):
    with pytest.raises(Exception):
        idx(protein, "vx > 0")


def test_division_by_zero(protein):
    with pytest.raises(Exception):
        idx(protein, "x / (y - y) > 1")


def test_vmd_pteros_parity(ref_data):
    """Runs the committed VMD/Pteros fixtures when albumin.pdb is provided
    (same contract as the reference tests: large file not committed)."""
    albumin = ref_data / "albumin.pdb"
    if not albumin.exists():
        pytest.skip("albumin.pdb not provided")
    sys = System.from_file(str(albumin))
    pat = re.compile(
        r'"((?:\d+ )*\d+)"\s*\n\s*\.split.*?get_selection_index\("(.*?)"\)', re.S
    )
    for fixture in ("generated_vmd_tests.in", "generated_pteros_tests.in"):
        text = (ref_data / fixture).read_text()
        for numbers, sel in pat.findall(text):
            want = [int(x) for x in numbers.split()]
            got = idx(sys, sel)
            assert got == want, f"{fixture}: {sel}"


def test_reference_readme_example_block(protein):
    """Every selection string in the reference README's "Complete examples"
    block (README.md:330-355) parses and evaluates here — including
    `10 < resid < 20`, which the reference grammar itself cannot parse
    (no int-attribute math operands) despite its README advertising it."""
    import numpy as np

    from molar_tpu.selection import SelectionExpr

    top, st = protein.topology, protein.state
    cases = [
        "name CA", "resname ALA", "chain A",
        "protein and backbone", "not water and not hydrogen",
        "(resname ALA or resname GLY) and backbone",
        "x < 0 and y < 0", "10 < resid < 20",
        "within 5.0 of [0, 0, 0]",
        "within 3.0 pbc of com of protein",
        "backbone and chain A and resid 1:50",
        "(protein or water) and within 10.0 of com of protein",
    ]
    for c in cases:
        SelectionExpr(c).apply(top, st, None)  # must not raise
    # the int-attribute comparison agrees with the keyword range form
    a = SelectionExpr("545 <= resid <= 550").apply(top, st, None)
    b = SelectionExpr("resid 545:550").apply(top, st, None)
    np.testing.assert_array_equal(a, b)
    assert len(SelectionExpr("index < 10").apply(top, st, None)) == 10
