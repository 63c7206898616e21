"""Free-function distance_search (molar_python/src/lib.rs:239-376)."""

import numpy as np
import pytest

from molar_tpu import PBC_FULL, PBC_NONE, System, distance_search
from molar_tpu.core.pbc import PeriodicBox
from molar_tpu.core.state import State
from molar_tpu.core.topology import Topology
from molar_tpu.core.atom import Atom


@pytest.fixture()
def sys_():
    rng = np.random.default_rng(0)
    n = 120
    atoms = [
        Atom(name="C", resname="X", resid=i + 1, atomic_number=6, mass=12.0)
        for i in range(n)
    ]
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(
        coords=rng.uniform(0, 3, (n, 3)).astype(np.float32),
        box=PeriodicBox(np.diag([3.0, 3.0, 3.0]).astype(np.float32)),
    )
    return System(top, st)


def _brute(coords, idx1, idx2, cutoff, box=None):
    out = set()
    for a in idx1:
        for b in idx2:
            if a == b:
                continue
            d = coords[a] - coords[b]
            if box is not None:
                d = d - np.round(d / 3.0) * 3.0
            if np.linalg.norm(d) <= cutoff:
                out.add((min(a, b), max(a, b)))
    return out


def test_single_selection_pairs(sys_):
    sel = sys_.select_all()
    pairs, dists = distance_search(0.5, sel)
    got = {(min(a, b), max(a, b)) for a, b in pairs}
    want = _brute(sys_.state.coords, sel.indices, sel.indices, 0.5)
    assert got == want
    np.testing.assert_allclose(
        dists,
        np.linalg.norm(
            sys_.state.coords[pairs[:, 0]] - sys_.state.coords[pairs[:, 1]], axis=1
        ),
        atol=1e-5,
    )


def test_two_selections_pbc(sys_):
    s1 = sys_(range(0, 60))
    s2 = sys_(range(60, 120))
    pairs, dists = distance_search(0.6, s1, s2, pbc=PBC_FULL)
    got = {(min(a, b), max(a, b)) for a, b in pairs}
    want = _brute(sys_.state.coords, s1.indices, s2.indices, 0.6, box=True)
    assert got == want


def test_vdw_cutoff(sys_):
    sel = sys_.select_all()
    pairs, dists = distance_search("vdw", sel)
    vdw = sys_.topology.vdw()
    # every returned pair satisfies d <= vdw_i + vdw_j
    assert (dists <= vdw[pairs[:, 0]] + vdw[pairs[:, 1]] + 1e-6).all()
    # and matches brute force
    got = {(min(a, b), max(a, b)) for a, b in pairs}
    want = set()
    c = sys_.state.coords
    for a in range(len(sel)):
        for b in range(a + 1, len(sel)):
            if np.linalg.norm(c[a] - c[b]) <= vdw[a] + vdw[b]:
                want.add((a, b))
    assert got == want


def test_bad_cutoff_string(sys_):
    with pytest.raises(Exception):
        distance_search("nope", sys_.select_all())
