"""PDB/GRO/XYZ IO tests: reference-fixture reads + round-trips."""

import numpy as np
import pytest

from molar_tpu.io import EmptyFileError, FileHandler, FileIoError, read_file


def test_read_protein_pdb(ref_data):
    top, st = read_file(str(ref_data / "protein.pdb"))
    assert top.n_atoms == st.n_atoms > 0
    # All protein: standard resnames, guessed elements present
    assert set(np.unique(top.atomic_number)) <= {1, 6, 7, 8, 16}
    assert top.resindex[0] == 0
    assert (np.diff(top.resindex) >= 0).all()
    # PDB coords are Angstrom on disk, nm in memory: a folded protein spans a
    # few nm, not tens of nm.
    span = st.coords.max(axis=0) - st.coords.min(axis=0)
    assert (span < 20.0).all() and (span > 0.5).all()


def test_read_2lao_pdb_element_column(ref_data):
    top, st = read_file(str(ref_data / "2lao.pdb"))
    names = top.names()
    sg = np.nonzero(names == "SG")[0]
    if len(sg):
        # Element column beats name guessing: gamma sulfur, not seaborgium
        # (reference test io.rs:989).
        assert (top.atomic_number[sg] == 16).all()


def test_conect_after_ter(ref_data):
    top, st = read_file(str(ref_data / "conect_after_ter.pdb"))
    assert top.n_bonds > 0
    # CONECT serials must be resolved via the serial map (TER consumes a
    # serial), so all bonds must be within range and non-self.
    assert top.bonds.max() < top.n_atoms
    assert (top.bonds[:, 0] != top.bonds[:, 1]).all()


def test_multi_gro_frames(ref_data):
    fh = FileHandler(str(ref_data / "multi.gro"))
    top = fh.read_topology()
    frames = list(fh.iter_states())
    assert len(frames) >= 1
    for st in frames:
        assert st.n_atoms == top.n_atoms
    fh.close()


def test_read_xyz(ref_data):
    top, st = read_file(str(ref_data / "test.xyz"))
    assert top.n_atoms == st.n_atoms > 0
    assert top.resnames()[0] == "MOL"


def test_pdb_roundtrip(tmp_path, ref_data):
    top, st = read_file(str(ref_data / "protein.pdb"))
    out = tmp_path / "out.pdb"
    with FileHandler(str(out), "w") as fh:
        fh.write(top, st)
    top2, st2 = read_file(str(out))
    assert top2.n_atoms == top.n_atoms
    assert (top2.names() == top.names()).all()
    assert (top2.resid == top.resid).all()
    assert (top2.atomic_number == top.atomic_number).all()
    np.testing.assert_allclose(st2.coords, st.coords, atol=1.01e-4)  # 3 decimals in A
    if st.box is not None:
        np.testing.assert_allclose(st2.box.matrix, st.box.matrix, atol=2e-4)


def test_gro_roundtrip_with_velocities(tmp_path):
    from molar_tpu.core import Atom, PeriodicBox, State, Topology

    rng = np.random.default_rng(1)
    n = 17
    atoms = [
        Atom(name=f"C{i%9}", resname="LIG", resid=1 + i // 5).guess_element_and_mass()
        for i in range(n)
    ]
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(
        coords=rng.uniform(0, 5, (n, 3)).astype(np.float32),
        velocities=rng.normal(0, 1, (n, 3)).astype(np.float32),
        time=12.5,
        box=PeriodicBox(np.diag([5.0, 5.0, 5.0])),
    )
    out = tmp_path / "out.gro"
    with FileHandler(str(out), "w") as fh:
        fh.write(top, st)
    top2, st2 = read_file(str(out))
    assert top2.n_atoms == n
    assert st2.time == pytest.approx(12.5)
    assert st2.velocities is not None
    np.testing.assert_allclose(st2.coords, st.coords, atol=5.01e-4)
    np.testing.assert_allclose(st2.velocities, st.velocities, atol=5.01e-5)
    np.testing.assert_allclose(st2.box.matrix, st.box.matrix, atol=1e-4)


def test_gro_triclinic_box_roundtrip(tmp_path):
    from molar_tpu.core import Atom, PeriodicBox, State, Topology

    top = Topology.from_atoms([Atom(name="C").guess_element_and_mass()])
    box = PeriodicBox.from_vectors_angles(5.0, 6.0, 7.0, 75.0, 80.0, 85.0)
    st = State(coords=np.zeros((1, 3), np.float32), box=box)
    out = tmp_path / "tric.gro"
    with FileHandler(str(out), "w") as fh:
        fh.write(top, st)
    _, st2 = read_file(str(out))
    np.testing.assert_allclose(st2.box.matrix, box.matrix, atol=1e-4)


def test_xyz_roundtrip(tmp_path, ref_data):
    top, st = read_file(str(ref_data / "test.xyz"))
    out = tmp_path / "o.xyz"
    with FileHandler(str(out), "w") as fh:
        fh.write(top, st)
    top2, st2 = read_file(str(out))
    assert top2.n_atoms == top.n_atoms
    np.testing.assert_allclose(st2.coords, st.coords, atol=1e-6)


def test_write_selection_indices(tmp_path, ref_data):
    top, st = read_file(str(ref_data / "protein.pdb"))
    ca = np.nonzero(top.names() == "CA")[0]
    out = tmp_path / "ca.pdb"
    with FileHandler(str(out), "w") as fh:
        fh.write(top, st, indices=ca)
    top2, st2 = read_file(str(out))
    assert top2.n_atoms == len(ca)
    assert (top2.names() == "CA").all()


def test_unknown_extension(tmp_path):
    with pytest.raises(FileIoError):
        FileHandler(str(tmp_path / "x.foo"))


def test_empty_pdb(tmp_path):
    p = tmp_path / "empty.pdb"
    p.write_text("")
    with pytest.raises(EmptyFileError):
        read_file(str(p))


def test_multimodel_pdb(tmp_path):
    p = tmp_path / "mm.pdb"
    p.write_text(
        "MODEL     1\n"
        "ATOM      1  CA  ALA A   1       1.000   2.000   3.000  1.00  0.00           C\n"
        "ENDMDL\n"
        "MODEL     2\n"
        "ATOM      1  CA  ALA A   1       4.000   5.000   6.000  1.00  0.00           C\n"
        "ENDMDL\n"
    )
    fh = FileHandler(str(p))
    frames = list(fh.iter_states())
    assert len(frames) == 2
    np.testing.assert_allclose(frames[0].coords[0], [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(frames[1].coords[0], [0.4, 0.5, 0.6], atol=1e-6)


def test_multimodel_pdb_without_endmdl(tmp_path):
    # MODEL records without ENDMDL: new MODEL line terminates previous model.
    p = tmp_path / "mm2.pdb"
    p.write_text(
        "MODEL     1\n"
        "ATOM      1  CA  ALA A   1       1.000   2.000   3.000  1.00  0.00           C\n"
        "MODEL     2\n"
        "ATOM      1  CA  ALA A   1       4.000   5.000   6.000  1.00  0.00           C\n"
    )
    fh = FileHandler(str(p))
    frames = list(fh.iter_states())
    assert len(frames) == 2
    np.testing.assert_allclose(frames[1].coords[0], [0.4, 0.5, 0.6], atol=1e-6)
