"""CLI subcommand tests (last / rearrange / solvate / tip3to4)."""

import numpy as np
import pytest

from molar_tpu import PeriodicBox, System
from molar_tpu.cli import main
from molar_tpu.core import Atom, State, Topology
from molar_tpu.io import read_file


def test_last(tmp_path, ref_data):
    out = tmp_path / "last.gro"
    rc = main(
        [
            "last",
            "-f",
            str(ref_data / "benzene.pdb"),
            str(ref_data / "benzene.xtc"),
            "-o",
            str(out),
        ]
    )
    assert rc == 0
    top, st = read_file(str(out))
    assert top.n_atoms == 12
    from molar_tpu.io.xtc import XtcHandler

    h = XtcHandler(str(ref_data / "benzene.xtc"))
    last = h.read_frame(h.n_frames - 1)
    np.testing.assert_allclose(st.coords, last.coords, atol=5.1e-4)


def test_rearrange(tmp_path, ref_data):
    out = tmp_path / "re.pdb"
    rc = main(
        [
            "rearrange",
            "-f",
            str(ref_data / "protein.pdb"),
            "-o",
            str(out),
            "-b",
            "name CA",
            "-e",
            "hydrogen",
        ]
    )
    assert rc == 0
    top, st = read_file(str(out))
    orig = System.from_file(str(ref_data / "protein.pdb"))
    n_ca = len(orig("name CA"))
    assert (top.names()[:n_ca] == "CA").all()
    names = top.names()
    n_h = len(orig("hydrogen"))
    assert all(n.startswith(("H", "1H", "2H", "3H")) for n in names[-n_h:])
    assert top.n_atoms == orig.n_atoms


def test_rearrange_overlap_error(tmp_path, ref_data):
    rc = main(
        [
            "rearrange",
            "-f",
            str(ref_data / "protein.pdb"),
            "-o",
            str(tmp_path / "x.pdb"),
            "-b",
            "name CA",
            "-e",
            "name CA",
        ]
    )
    assert rc == 1


def _make_water_box(path, side=1.86, n_per_dim=4):
    """Tiny SPC-like water box."""
    atoms = []
    coords = []
    spacing = side / n_per_dim
    rid = 0
    for i in range(n_per_dim):
        for j in range(n_per_dim):
            for k in range(n_per_dim):
                rid += 1
                base = np.array([i, j, k]) * spacing + spacing / 4
                for name, off in (
                    ("OW", [0, 0, 0]),
                    ("HW1", [0.095, 0, 0]),
                    ("HW2", [-0.024, 0.092, 0]),
                ):
                    atoms.append(
                        Atom(name=name, resname="SOL", resid=rid).guess_element_and_mass()
                    )
                    coords.append(base + off)
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(
        coords=np.asarray(coords, np.float32),
        box=PeriodicBox(np.diag([side] * 3)),
    )
    System(top, st).save(str(path))


def test_solvate(tmp_path):
    solvent = tmp_path / "water.gro"
    _make_water_box(solvent)
    # Solute: a couple of big atoms mid-box.
    atoms = [Atom(name="C", resname="LIG", resid=1).guess_element_and_mass() for _ in range(4)]
    top = Topology.from_atoms(atoms)
    st = State(
        coords=np.array(
            [[1.5, 1.5, 1.5], [1.6, 1.5, 1.5], [1.5, 1.6, 1.5], [1.5, 1.5, 1.6]],
            np.float32,
        ),
        box=PeriodicBox(np.diag([3.0, 3.0, 3.0])),
    )
    solute = tmp_path / "lig.gro"
    System(top, st).save(str(solute))
    out = tmp_path / "solvated.gro"
    rc = main(
        ["solvate", "-f", str(solute), "-o", str(out), "-s", str(solvent)]
    )
    assert rc == 0
    solvated = System.from_file(str(out))
    assert solvated.n_atoms > 4
    # Independently compute the expected water count: brute-force replicate
    # the two solvate filters (whole residue inside box; no vdW overlap with
    # the solute, min-image) over the tiled candidates. Catches the
    # multiply_periodically resindex bug (repeated resindex values deleted
    # each bad residue's counterpart in EVERY tile).
    wat = System.from_file(str(solvent))
    lig_sys = System.from_file(str(solute))
    side_w, side_l = 1.86, 3.0
    vdw_w = wat.topology.vdw()
    vdw_l = lig_sys.topology.vdw()
    expected = 0
    for i in range(2):
        for j in range(2):
            for k in range(2):
                shift = np.array([i, j, k]) * side_w
                c = wat.state.coords + shift
                for r in np.unique(wat.topology.resindex):
                    rc_ = c[wat.topology.resindex == r]
                    frac = rc_ / side_l
                    if not ((frac >= 0) & (frac < 1)).all():
                        continue
                    d = rc_[:, None, :] - lig_sys.state.coords[None, :, :]
                    d -= side_l * np.round(d / side_l)
                    dist = np.sqrt((d**2).sum(-1))
                    lim = (
                        vdw_w[wat.topology.resindex == r][:, None] + vdw_l[None, :]
                    )
                    if (dist <= lim + 1e-6).any():
                        continue
                    expected += 1
    n_waters = len(np.unique(solvated("resname SOL").resindices))
    assert n_waters == expected
    assert expected > 100  # sanity: most of the 512 candidates survive
    # Waters exist, none vdw-overlap the solute.
    w = solvated("resname SOL")
    lig = solvated("resname LIG")
    from molar_tpu.ops import neighbor_host
    from molar_tpu import PBC_FULL

    vdw = solvated.topology.vdw()
    pairs, _ = neighbor_host.search_pairs(
        float(2 * vdw.max() + 1e-6),
        solvated.state.coords,
        w.indices,
        lig.indices,
        solvated.box,
        PBC_FULL,
        vdw=vdw,
    )
    assert len(pairs) == 0


def test_tip3to4(tmp_path):
    atoms = []
    coords = []
    for rid in (1, 2):
        base = np.array([rid * 0.5, 0.5, 0.5])
        for name, off in (
            ("OH2", [0, 0, 0]),
            ("H1", [0.095, 0, 0]),
            ("H2", [-0.024, 0.092, 0]),
        ):
            atoms.append(Atom(name=name, resname="TIP3", resid=rid).guess_element_and_mass())
            coords.append(base + off)
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(
        coords=np.asarray(coords, np.float32), box=PeriodicBox(np.diag([3.0] * 3))
    )
    inp = tmp_path / "tip3.gro"
    System(top, st).save(str(inp))
    out = tmp_path / "tip4.gro"
    rc = main(["tip3to4", "-f", str(inp), "-o", str(out)])
    assert rc == 0
    conv = System.from_file(str(out))
    assert conv.n_atoms == 8  # 2 waters x 4 atoms
    assert (conv.topology.resnames() == "TIP4").all()
    m = conv("name M")
    assert len(m) == 2
    # M sits 0.01546 nm from O towards the H midpoint (GRO stores 3 decimals
    # -> up to ~1.2e-3 nm quantization on the distance).
    o = conv("name OH2")
    d = np.linalg.norm(m.coords[0] - o.coords[0])
    assert abs(d - 0.01546) < 2e-3
