"""System editing semantics: tiling resindex, append padding (ADVICE r1).

Reference anchors: system.rs:272 (append), system.rs:312-340
(multiply_periodically calls assign_resindex after tiling).
"""

import numpy as np

from molar_tpu import Atom, PeriodicBox, State, System, Topology


def _tiny_system(n_res=3, atoms_per_res=2, side=2.0):
    atoms = []
    coords = []
    for r in range(n_res):
        for a in range(atoms_per_res):
            atoms.append(
                Atom(name=f"C{a}", resname="LIG", resid=r + 1).guess_element_and_mass()
            )
            coords.append([0.3 * r + 0.1 * a + 0.1, 0.5, 0.5])
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(
        coords=np.asarray(coords, np.float32),
        box=PeriodicBox(np.diag([side] * 3)),
    )
    return System(top, st)


def test_multiply_periodically_reassigns_resindex():
    sys_ = _tiny_system(n_res=3)
    sys_.multiply_periodically(2, 1, 2)
    ri = sys_.topology.resindex
    # 4 tiles x 3 residues; resid runs restart at tile boundaries (1,2,3 |
    # 1,2,3 | ...) so every tile's residues get fresh contiguous resindex.
    assert ri.min() == 0
    assert ri.max() == 4 * 3 - 1
    # Each residue keeps its 2 atoms under a unique resindex.
    _, counts = np.unique(ri, return_counts=True)
    assert (counts == 2).all()


def test_multiply_periodically_tiles_coords_and_box():
    sys_ = _tiny_system(n_res=1, atoms_per_res=1, side=2.0)
    base = sys_.state.coords.copy()
    sys_.multiply_periodically(2, 1, 1)
    assert sys_.n_atoms == 2
    np.testing.assert_allclose(sys_.state.coords[1], base[0] + [2.0, 0, 0])
    np.testing.assert_allclose(np.diag(sys_.box.matrix), [4.0, 2.0, 2.0])


def test_append_system_pads_missing_velocities_and_forces():
    a = _tiny_system(n_res=1)
    a.state.velocities = np.ones_like(a.state.coords)
    a.state.forces = 2 * np.ones_like(a.state.coords)
    b = _tiny_system(n_res=1)  # no velocities/forces
    a.append_system(b)
    assert a.state.velocities is not None and a.state.forces is not None
    assert a.state.velocities.shape == (4, 3)
    assert a.state.forces.shape == (4, 3)
    np.testing.assert_allclose(a.state.velocities[:2], 1.0)
    np.testing.assert_allclose(a.state.velocities[2:], 0.0)
    np.testing.assert_allclose(a.state.forces[2:], 0.0)
    # remove() on the appended system must not misalign per-atom arrays.
    a.remove([0])
    assert a.state.forces.shape == (3, 3)


def test_append_system_without_own_velocities_keeps_none():
    a = _tiny_system(n_res=1)
    b = _tiny_system(n_res=1)
    b.state.velocities = np.ones_like(b.state.coords)
    a.append_system(b)
    assert a.state.velocities is None


def test_append_atoms_pads_forces():
    a = _tiny_system(n_res=1)
    a.state.forces = np.ones_like(a.state.coords)
    new = [Atom(name="O", resname="WAT", resid=9).guess_element_and_mass()]
    a.append_atoms(new, np.array([[1.0, 1.0, 1.0]], np.float32))
    assert a.state.forces.shape == (3, 3)
    np.testing.assert_allclose(a.state.forces[-1], 0.0)
