"""Particle per-atom views (reference particle.rs:4-17)."""

import numpy as np
import pytest

from molar_tpu import Particle, System


@pytest.fixture()
def sys_(ref_data):
    return System.from_file(str(ref_data / "protein.pdb"))


def test_iteration_and_indexing(sys_):
    sel = sys_("resid 545:547")
    parts = list(sel)
    assert len(parts) == len(sel)
    assert isinstance(parts[0], Particle)
    assert parts[0].id == sel.indices[0]
    assert sel[2].id == sel.indices[2]
    # reads agree with the column API
    assert [p.name for p in parts[:3]] == list(sel.names[:3])
    assert parts[0].resid == sel.resids[0]


def test_particle_reads(sys_):
    p = sys_.select_all()[0]
    a = p.atom
    assert a.name == p.name and a.resid == p.resid
    np.testing.assert_array_equal(p.pos, sys_.state.coords[0])
    assert p.mass > 0 and p.atomic_number > 0


def test_particle_writes_hit_columns(sys_):
    p = sys_.select_all()[5]
    p.name = "QQ7"
    p.resname = "ZZZ"
    p.charge = -0.25
    p.pos = [1.0, 2.0, 3.0]
    top = sys_.topology
    assert top.names([5])[0] == "QQ7"
    assert top.resnames([5])[0] == "ZZZ"
    assert top.charge[5] == pytest.approx(-0.25)
    np.testing.assert_allclose(sys_.state.coords[5], [1.0, 2.0, 3.0])
    # and the selection layer sees it
    assert sys_("name QQ7").indices.tolist() == [5]


def test_to_system_and_append_from_self(sys_):
    import numpy as np

    n0 = sys_.n_atoms
    sel = sys_("resid 545:547")
    sub = sel.to_system()
    assert sub.n_atoms == len(sel)
    np.testing.assert_array_equal(sub.state.coords, sys_.state.coords[sel.indices])
    assert sub.state.box is not None and sub.state.box is not sys_.state.box
    sys_.append(sel)  # append_from_self (system.rs:272)
    assert sys_.n_atoms == n0 + len(sel)
    np.testing.assert_array_equal(sys_.state.coords[n0:], sub.state.coords)


def test_rshift_rebind(sys_, ref_data):
    from molar_tpu import System

    other = System.from_file(str(ref_data / "protein.pdb"))
    sel = sys_("name CA")
    sel2 = sel >> other  # system.rs:422-435 Shr sugar
    assert sel2.system is other
    assert len(sel2) == len(sel)


def test_particle_xyz_and_negative_index(sys_):
    sel = sys_("resid 545:600")
    p = sel[-5]  # negative indexing (pymolar test5)
    assert p.id == sel.indices[-5]
    x0 = p.x
    p.x = 42.0
    assert sel[-5].x == pytest.approx(42.0) and sel[-5].x != x0
    # pos returns a live view (pymolar test2)
    pos = sel[0].pos
    pos[1] += 1.0
    assert sys_.state.coords[sel.indices[0], 1] == pytest.approx(pos[1])


def test_sel_set_state(sys_, ref_data):
    from molar_tpu.io import FileHandler

    st2 = FileHandler(str(ref_data / "protein.pdb")).read_state()
    st2.time = 100.0
    sel = sys_("name CA")
    old = sel.set_state(st2)
    assert old.time != 100.0
    # The reference contract (molar_python/tests/test_2.py): rebinding a
    # selection's state leaves the SYSTEM and sibling selections untouched.
    assert sel.time == 100.0
    assert sys_.state.time == old.time
    assert sys_("name CB").state.time == old.time


def test_state_property_setter_and_replace_deep(sys_, ref_data):
    from molar_tpu.io import FileHandler

    st2 = FileHandler(str(ref_data / "protein.pdb")).read_state()
    st2.time = 100.0
    st1 = sys_.state
    t1 = st1.time
    sel1 = sys_("name CA")
    sel1.state = st2  # property assignment rebinds THIS selection only
    assert sel1.time == 100.0
    assert sys_.state.time == t1 and st1.time == t1  # system + st1 untouched

    # replace_state_deep swaps CONTENTS: old references observe the change
    st3 = FileHandler(str(ref_data / "protein.pdb")).read_state()
    st3.time = 777.0
    held = sys_.state
    sys_.replace_state_deep(st3)
    assert held.time == 777.0  # the held object itself changed
    assert sys_.state is held
    assert st3.time == t1  # and got the old contents
