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
