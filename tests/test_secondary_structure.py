"""DSSP / dss golden tests against the reference's committed fixtures."""

import pytest

from molar_tpu import System

PYMOL_2LAO = (
    "~~~~EEEEEE~~~~~~~~EEE~~EEEE~HHHHHHHHHHHHH~~EEEEEE~~HHHHHHHHHH~~~~EEE~~~~~~"
    "HHHHHH~~~~~~~~~~~EEEEEE~~~~~~~~HHHH~~~EEEEE~~~HHHHHHHHHHHHH~~EEEEE~~"
    "HHHHHHHHHH~~~~EEEEEHHHHHHH~~~~HHHH~EEE~~~~~~~HHHH~~~~~~~~~~~~"
    "HHHHHHHHHHHHHHHHH~HHHHHHHHH~~~~~~~~"
)


def _accuracy(got: str, expected: str) -> float:
    assert len(got) == len(expected), (len(got), len(expected))
    return sum(a == b for a, b in zip(got, expected)) / len(got)


@pytest.mark.parametrize(
    "pdb,dat,threshold,strip",
    [
        ("protein.pdb", "protein_dssp.dat", 0.98, False),
        ("2lao.pdb", "2lao_dssp.dat", 0.95, False),
        ("7pbd.pdb", "7pbd_dssp.dat", 0.95, True),
    ],
)
def test_dssp_gmx_golden(ref_data, pdb, dat, threshold, strip):
    sys = System.from_file(str(ref_data / pdb))
    got = sys("protein").dssp("gmx")
    expected = (ref_data / dat).read_text().strip()
    if strip:
        expected = expected.replace("=", "")
    acc = _accuracy(got, expected)
    assert acc >= threshold, f"{pdb}: accuracy {acc:.3f} < {threshold}"


def test_dssp_vanilla_does_not_overextend_2lao(ref_data):
    # The motivating vanilla-vs-gmx case (dssp.rs:699-705): canonical DSSP
    # must not range-fill the strand the way gmx does.
    sys = System.from_file(str(ref_data / "2lao.pdb"))
    vanilla = sys("protein").dssp("vanilla")
    gmx = sys("protein").dssp("gmx")
    assert vanilla != gmx  # flavors genuinely differ
    assert len(vanilla) == len(gmx)


def test_dss_pymol_2lao(ref_data):
    sys = System.from_file(str(ref_data / "2lao.pdb"))
    got = sys("protein").dss()
    acc = _accuracy(got, PYMOL_2LAO)
    assert acc >= 0.98, f"dss agreement {acc:.3f}"
    assert got[177:188] == "EEE~~~~~~~H"  # short strand, not over-extended


def test_ss_compute_dispatch(ref_data):
    sys = System.from_file(str(ref_data / "protein.pdb"))
    sel = sys("protein")
    assert len(sel.ss_compute("dssp")) == len(sel.ss_compute("dss"))
    with pytest.raises(ValueError):
        sel.ss_compute("nope")
