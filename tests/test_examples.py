"""Smoke tests: the example scripts run end-to-end (CPU, tiny inputs)."""

import runpy
import sys

import numpy as np
import pytest


def _run(script, argv):
    old = sys.argv
    sys.argv = [script, *argv]
    try:
        with pytest.raises(SystemExit) as e:
            runpy.run_path(script, run_name="__main__")
        assert e.value.code in (0, None)
    finally:
        sys.argv = old


@pytest.fixture()
def small_traj(tmp_path, ref_data):
    """protein.pdb + a 6-frame jittered XTC of it."""
    from molar_tpu import System
    from molar_tpu.io.xtc import XtcHandler

    sys_ = System.from_file(str(ref_data / "protein.pdb"))
    rng = np.random.default_rng(0)
    p = tmp_path / "t.xtc"
    w = XtcHandler(str(p), "w")
    for k in range(6):
        c = sys_.state.coords + rng.normal(0, 0.002, sys_.state.coords.shape).astype(
            np.float32
        )
        w.write_raw(c, sys_.state.box.matrix, step=k, time=float(k))
    w.close()
    return str(ref_data / "protein.pdb"), str(p)


def test_structure_report(ref_data, tmp_path, capsys):
    obj = tmp_path / "m.obj"
    _run(
        "examples/structure_report.py",
        [str(ref_data / "protein.pdb"), "--sel", "resid 545:560", "--obj", str(obj)],
    )
    out = capsys.readouterr().out
    assert "SASA:" in out and "DSSP:" in out
    assert obj.exists() and obj.read_text().startswith("# molar_tpu")


def test_rmsd_trajectory(small_traj, capsys):
    pdb, xtc = small_traj
    _run(
        "examples/rmsd_trajectory.py",
        ["-f", pdb, xtc, "--sel", "name CA", "--window", "4"],
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 6
    rmsds = [float(l.split("\t")[1]) for l in lines]
    assert all(0 <= r < 0.05 for r in rmsds)  # tiny jitter -> tiny rmsd


def test_contacts(small_traj, capsys):
    pdb, xtc = small_traj
    _run(
        "examples/contacts.py",
        ["-f", pdb, xtc, "--target", "resid 545:547", "--cutoff", "0.5",
         "--window", "4"],
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 6
    assert all(int(l.split("\t")[1]) > 0 for l in lines)


def test_membrane_example(tmp_path, capsys):
    from test_membrane import make_bilayer

    from molar_tpu.io.xtc import XtcHandler

    sys_ = make_bilayer()
    # GRO keeps names only; rename the glycerol bead so masses re-guess from
    # element names on reload (G guesses nothing -> zero mass).
    sys_("name G").set_same_name("CG")
    gro = tmp_path / "bilayer.gro"
    sys_.save(str(gro))
    xtc = tmp_path / "t.xtc"
    w = XtcHandler(str(xtc), "w")
    rng = np.random.default_rng(0)
    for k in range(3):
        c = sys_.state.coords + rng.normal(0, 0.01, sys_.state.coords.shape).astype(
            np.float32
        )
        w.write_raw(c, sys_.state.box.matrix, step=k, time=float(k))
    w.close()
    out = tmp_path / "out"
    out.mkdir()
    toml = tmp_path / "m.toml"
    toml.write_text(
        f"""
sel = "all"
cutoff = 2.0
order_type = "scdcorr"
output_dir = "{out}"
groups = ["all"]

[lipids.LIP]
whole = "resname LIP"
head = "name P"
mid = "name CG"
tails = ["C1-C2-C3-C4"]
"""
    )
    _run(
        "examples/membrane_curvature.py",
        ["-f", str(gro), str(xtc), "--options", str(toml)],
    )
    assert "3 frames" in capsys.readouterr().out


def test_tip3to4_tutorial(tmp_path, capsys):
    """The README-tutorial port converts a TIP3 box and keeps non-water."""
    from molar_tpu import PeriodicBox, System
    from molar_tpu.core.atom import Atom
    from molar_tpu.core.state import State
    from molar_tpu.core.topology import Topology

    atoms, coords = [], []
    rng = np.random.default_rng(0)
    # two protein-ish atoms + three TIP3 waters
    for k in range(2):
        atoms.append(Atom(name="CA", resname="ALA", resid=k + 1,
                          atomic_number=6, mass=12.0))
        coords.append(rng.uniform(0, 3, 3))
    for w in range(3):
        base = rng.uniform(0, 3, 3)
        for nm, z, off in (("OW", 8, [0, 0, 0]),
                           ("HW1", 1, [0.0957, 0, 0]),
                           ("HW2", 1, [-0.024, 0.0927, 0])):
            atoms.append(Atom(name=nm, resname="TIP3", resid=10 + w,
                              atomic_number=z, mass=float(z)))
            coords.append(base + off)
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(coords=np.asarray(coords, np.float32),
               box=PeriodicBox(np.diag([3.0, 3.0, 3.0]).astype(np.float32)))
    inp = tmp_path / "in.gro"
    System(top, st).save(str(inp))
    outp = tmp_path / "out.gro"
    _run("examples/tip3to4_tutorial.py", [str(inp), str(outp)])
    assert "3 waters converted" in capsys.readouterr().out
    out = System(str(outp))
    assert out.n_atoms == 2 + 3 * 4
    m = out("name M")
    assert len(m) == 3 and set(m.resnames) == {"TIP4"}
    # M sits 0.01546 nm from its oxygen on the H-O-H bisector
    o = out("resname TIP4 and name OW")
    d = np.linalg.norm(m.coords - o.coords, axis=1)
    np.testing.assert_allclose(d, 0.01546, atol=1e-3)


def test_assign_ff_example(ref_data, capsys):
    sdf = (
        ref_data.parent.parent
        / "molar_ff" / "tests" / "data" / "gaff_ref" / "sdf"
        / "2-Hydroxyvaleric_acid.sdf"
    )
    if not sdf.exists():
        import pytest

        pytest.skip("gaff corpus not mounted")
    _run("examples/assign_ff.py", [str(sdf)])
    out = capsys.readouterr().out
    assert "rings" in out and " oh " not in out.split("\n")[0]
    assert any(" ho " in l for l in out.splitlines())
