"""Drop-in parity with the reference Python bindings' surface.

The contract is pymolar's type stubs
(/root/reference/molar_python/python/pymolar/molar.pyi): every public
symbol there must exist here, either natively or as a documented alias
(SURVEY §2.5). The AnalysisTask-compat surface is covered in test_tasks.py.
"""

import numpy as np
import pytest

import molar_tpu as mt
from molar_tpu import PBC_FULL, PeriodicBox, State, System
from molar_tpu.io import FileHandler
from molar_tpu.io.ndx import NdxFile


@pytest.fixture()
def sysb(tmp_path):
    path = tmp_path / "s.pdb"
    lines = []
    rng = np.random.default_rng(0)
    for i in range(24):
        x, y, z = rng.uniform(2, 8, 3) * 10  # Å
        resid = i // 4 + 1
        lines.append(
            f"ATOM  {i+1:5d}  CA  ALA A{resid:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
    lines.append("END")
    path.write_text("\n".join(lines) + "\n")
    s = System.from_file(str(path))
    s.state.box = PeriodicBox(np.diag([10.0, 10.0, 10.0]).astype(np.float32))
    return s


def test_iterators(sysb):
    pos = list(sysb.iter_pos())
    assert len(pos) == 24 and pos[0].shape == (3,)
    atoms = list(sysb.iter_atoms())
    assert atoms[3].name == "CA" and atoms[3].resid == 1
    sel = sysb("resid 2")
    assert len(list(sel.iter_pos())) == 4
    assert [a.resid for a in sel.iter_atoms()] == [2, 2, 2, 2]


def test_sel_setters_and_aliases(sysb):
    sel = sysb("resid 3")
    sel.set_same_resid(99)
    assert len(sysb("resid 99")) == 4
    sel.set_same_bfactor(42.0)
    assert np.allclose(sysb.topology.bfactor[sel.indices], 42.0)

    g, gp = sel.gyration(), sel.gyration_pbc()
    assert g > 0 and gp > 0
    assert np.allclose(sel.inertia_pbc()[0], sel.inertia(pbc=PBC_FULL)[0])
    assert sel.principal_transform_pbc() is not None

    st2 = sysb.state.copy()
    st2.coords = st2.coords + 1.0
    st2.time = 50.0
    t1 = sysb.state.time
    sel.replace_state_deep(st2)  # contents exchange: system observes it
    assert sysb.state.time == 50.0 and st2.time == t1


def test_sel_state_rebind_isolated(sysb):
    """molar_python/tests/test_2.py: sel.state = st rebinds only that
    selection; system and sibling selections keep theirs."""
    st1 = sysb.state
    t1 = st1.time
    st2 = sysb.state.copy()
    st2.time = 100.0
    sel1 = sysb("resid 1")
    sel2 = sysb("resid 2")
    old = sel1.state
    sel1.state = st2
    assert sysb.state.time == t1
    assert sel1.time == 100.0
    assert sel2.time == t1
    assert old.time == t1
    assert st1.time != st2.time


def test_system_call_variants(sysb):
    """molar.pyi:117: None/no-arg = all; 2-tuple = index range; list =
    explicit indices."""
    assert len(sysb(None)) == sysb.n_atoms
    assert len(sysb()) == sysb.n_atoms
    assert len(sysb((0, 10))) == 10  # half-open [start, stop)
    assert len(sysb([1, 3, 4, 5, 6, 7])) == 6


def test_box_from_and_getters(sysb):
    other = System(sysb.topology, sysb.state.copy())
    other.state.box = PeriodicBox(np.diag([7.0, 8.0, 9.0]).astype(np.float32))
    sysb("all").set_box_from(other)
    assert np.allclose(sysb.state.box.matrix, other.state.box.matrix)
    st = sysb.state
    st.set_box_from(other)
    assert np.allclose(st.box.matrix, other.state.box.matrix)

    b = st.box
    assert np.array_equal(b.get_matrix(), b.matrix)
    assert np.array_equal(b.get_box_extents(), b.box_extents())
    assert np.array_equal(b.get_lab_extents(), b.lab_extents())


def test_filehandler_part_writes(sysb, tmp_path):
    p = str(tmp_path / "out.pdb")
    with FileHandler(p, "w") as fh:
        fh.write_topology(sysb)
    assert System.from_file(p).n_atoms == 24

    x = str(tmp_path / "out.xtc")
    with FileHandler(x, "w") as fh:
        fh.write_state(sysb.state)
        fh.write_state(sysb)  # System form
    frames = list(FileHandler(x).iter_states())
    assert len(frames) == 2
    np.testing.assert_allclose(
        frames[0].coords, sysb.state.coords, atol=1e-3
    )


def test_write_topology_bare_topology(sysb, tmp_path):
    """molar.pyi:95 accepts a bare Topology: coordinates are faked
    (make_fake_state) since structure formats must write positions."""
    p = str(tmp_path / "topo.pdb")
    with FileHandler(p, "w") as fh:
        fh.write_topology(sysb.topology)
    re = System(p)
    assert re.n_atoms == sysb.n_atoms
    assert list(re("all").names[:1]) == ["CA"]


def test_ndx_roundtrip_through_selection(sysb, tmp_path):
    p = str(tmp_path / "rt.ndx")
    sel = sysb("resid 2 4")
    (tmp_path / "rt.ndx").write_text(sel.to_gromacs_ndx("pair"))
    got = NdxFile(p).get_group_as_sel("pair", sysb)
    np.testing.assert_array_equal(got.indices, sel.indices)


def test_ndx_path_ctor_and_group_sel(sysb, tmp_path):
    p = str(tmp_path / "ix.ndx")
    ndx = NdxFile({"grp": np.array([0, 5, 7])})
    ndx.write(p)
    loaded = NdxFile(p)  # pymolar path-constructor form
    sel = loaded.get_group_as_sel("grp", sysb)
    assert sorted(sel.indices.tolist()) == [0, 5, 7]


def test_system_ctor_overloads(tmp_path, sysb):
    """molar.pyi:110-114: System(), System(fname), System(top, state)."""
    p = str(tmp_path / "ctor.pdb")
    sysb.save(p)
    s = System(p)
    assert s.n_atoms == sysb.n_atoms
    assert System().n_atoms == 0
    assert System(sysb.topology, sysb.state).n_atoms == sysb.n_atoms


def test_coord_column_layout_and_box_two_arg(sysb):
    """pymolar test.py test7/test9: get_coord/set_coord use the (3, n)
    column layout; PeriodicBox accepts (vectors, angles)."""
    sel = sysb("resid 1")
    crd = sel.get_coord()
    assert crd.shape == (3, len(sel))
    crd[0, 0] = 4.2
    sel.set_coord(crd)
    assert sel[0].pos[0] == pytest.approx(4.2)
    sel.set_coord(np.zeros((3, len(sel)), np.float32))
    assert np.allclose(sel[0].pos, 0.0)

    b = PeriodicBox([1.0, 2.0, 3.0], [90.0, 90.0, 90.0])
    assert np.allclose(np.diag(b.matrix), [1.0, 2.0, 3.0])
    v, a = b.to_vectors_angles()
    assert np.allclose(a, 90.0)


def test_split_by_predicate(sysb):
    """README 'Parallel splits': split_par's closure contract — None drops
    the atom, distinct values make distinct selections."""
    parts = sysb("all").split_by(
        lambda p: p.resid if p.resid % 2 == 0 else None
    )
    assert len(parts) == 3  # resids 2, 4, 6 of the 6 residues
    assert all(len(s) == 4 for s in parts)
    assert sorted(s[0].resid for s in parts) == [2, 4, 6]


def test_particles_follow_rebound_state(sysb):
    """Particles from a rebound selection read/write the REBOUND state
    (round-4 review: they bypassed it to the system state)."""
    sel = sysb("resid 1")
    st2 = sysb.state.copy()
    st2.coords = st2.coords + 100.0
    sel.state = st2
    np.testing.assert_allclose(sel[0].pos, sel.coords[0])
    assert sel[0].x == pytest.approx(float(st2.coords[sel.indices[0], 0]))
    sel[0].x = -5.0
    assert st2.coords[sel.indices[0], 0] == pytest.approx(-5.0)
    assert sysb.state.coords[sel.indices[0], 0] != pytest.approx(-5.0)
    for p in sel:
        assert p.pos[1] == pytest.approx(st2.coords[p.index, 1])


def test_tuple_range_in_subselection_and_bool_exclusion(sysb):
    sel = sysb("all")
    assert len(sel((0, 10))) == 10  # local range, like the System form
    # bools are NOT range endpoints
    assert len(sysb((True, 3))) == 2  # index pair {0 (True), 3} -> 2 atoms
    with pytest.raises(Exception):
        System(sysb.topology, None)


def test_mixed_state_neighbor_search(sysb):
    """within_of/distance_search take each selection's rows from its own
    viewed state (round-4 review: the other side's rows came from self's
    state)."""
    import molar_tpu as mt

    a = sysb("resid 1")
    b = sysb("resid 2")
    st2 = sysb.state.copy()
    st2.coords = st2.coords.copy()
    # park b's atoms right on top of a's in the rebound state only
    st2.coords[b.indices] = sysb.state.coords[a.indices][: len(b)]
    b.state = st2
    near = a.within_of(0.01, b)
    assert len(near) == len(a)  # b (rebound) sits exactly on a
    pairs, dist = mt.distance_search(0.01, a, b)
    assert len(pairs) >= len(a)
    # overlapping selections whose states DISAGREE on shared atoms are
    # ambiguous (shared atoms that agree are fine, tested above)
    st3 = sysb.state.copy()
    st3.coords = st3.coords + 1.0  # every row moved, incl. the overlap
    b_overlap = sysb("resid 1 2")
    b_overlap.state = st3
    with pytest.raises(Exception, match="ambiguous"):
        a.within_of(0.01, b_overlap)


def test_write_state_bare_state_to_structure_format_errors(sysb, tmp_path):
    from molar_tpu.io import FileIoError

    with FileHandler(str(tmp_path / "x.gro"), "w") as fh:
        with pytest.raises(FileIoError, match="topology"):
            fh.write_state(sysb.state)


def test_set_box_from_never_aliases(sysb):
    other = System(sysb.topology, sysb.state.copy())
    other.state.box = PeriodicBox(np.diag([7.0, 8.0, 9.0]).astype(np.float32))
    sysb("all").set_box_from(other)
    assert sysb.state.box is not other.state.box
    st = sysb.state.copy()
    st.set_box_from(other)
    assert st.box is not other.state.box


def test_module_level_functions(sysb):
    a = sysb("resid 1")
    b = sysb("resid 2")
    r, t = mt.fit_transform(a, b)
    assert np.asarray(r).shape == (3, 3)
    assert mt.rmsd_py(a, b) >= 0
    assert mt.rmsd_mw(a, b) >= 0
    r2, t2, _pairs = (*mt.fit_transform_matching(a, a), None)[:3]
    mt.greeting("compat-test")
