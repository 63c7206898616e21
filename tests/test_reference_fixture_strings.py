"""The reference's EXACT cross-tool fixture selection strings, executed.

The reference validates its selection engine against VMD and Pteros on
``albumin.pdb`` (molar/tests/generated_{vmd,pteros}_tests.in, included by
selection_expr.rs:302-310). That structure is absent from this snapshot and
from the whole machine (``find / -name 'albumin*'`` is empty; neither VMD,
Pteros, nor any third-party MD package is installed), so executing the
committed index lists is impossible here — ``test_vmd_pteros_parity`` stays
gated on the file appearing.

This module does the two things that ARE possible with the committed corpus:

1. every selection string extracted from both fixture files must PARSE
   (grammar-compatibility with the generated corpora, including quirks like
   ``x<4`` and ``dist point 4.1 3.9 5.1<0.4`` with no spaces);
2. every string is EXECUTED against protein.pdb and compared to an
   independent naive numpy evaluator (tests/tools/gen_selection_golden.py),
   including the strings whose targets are empty on this structure (resid
   10/20 do not exist in protein.pdb) — the engine must return empty, not
   crash.
"""

import pathlib
import re
import sys

import numpy as np
import pytest

from molar_tpu import System
from molar_tpu.selection.parser import parse

TOOLS = pathlib.Path(__file__).parent / "tools"
sys.path.insert(0, str(TOOLS))

from gen_selection_golden import Naive  # noqa: E402


def _fixture_strings(ref_data):
    pat = re.compile(r'get_selection_index2?\("(.*?)"\)')
    out = []
    for fixture in ("generated_vmd_tests.in", "generated_pteros_tests.in"):
        out.extend(pat.findall((ref_data / fixture).read_text()))
    return out


def test_all_fixture_strings_parse(ref_data):
    strings = _fixture_strings(ref_data)
    assert len(strings) == 13
    for s in strings:
        parse(s)  # must not raise


@pytest.fixture(scope="module")
def protein(ref_data):
    return System.from_file(str(ref_data / "protein.pdb"))


@pytest.fixture(scope="module")
def naive(protein):
    return Naive(protein)


def _expected(nv: Naive):
    ca = nv.names == "CA"

    def r(n):
        return nv.resid == n

    return {
        "name CA": ca,
        "resid 10": r(10),
        "same residue as (name CA and resid 10)": nv.same_residue(ca & r(10)),
        "within 0.5 of resid 10": nv.within(0.5, r(10)),
        "within 0.3 of resid 20": nv.within(0.3, r(20)),
        "name CA and within 0.3 of resid 20": ca & nv.within(0.3, r(20)),
        "resid 555": r(555),
        "same residue as (name CA and resid 555)": nv.same_residue(
            ca & r(555)
        ),
        "within 0.5 of resid 555": nv.within(0.5, r(555)),
        "within 0.5 pbc yyy of resid 555": nv.within(0.5, r(555), pbc=True),
        "x<4": nv.x < 4,
        "dist point 4.1 3.9 5.1<0.4": np.linalg.norm(
            nv.coords - [4.1, 3.9, 5.1], axis=1
        )
        < 0.4,
    }


def test_fixture_strings_execute_vs_naive(ref_data, protein, naive):
    from molar_tpu.core.system import SelectionError

    exp = _expected(naive)
    strings = _fixture_strings(ref_data)
    assert set(strings) == set(exp), "fixture drift: update _expected"
    nonempty = 0
    for s in strings:
        want = np.nonzero(exp[s])[0].tolist()
        if not want:
            # resid 10/20 do not exist in protein.pdb; creating an empty Sel
            # is an error in the reference (sel.rs) and here.
            with pytest.raises(SelectionError):
                protein.select(s)
            continue
        got = protein.select(s).indices.tolist()
        assert got == want, s
        nonempty += 1
    # resid 555 exists in protein.pdb, resid 10/20 do not: both classes ran.
    assert nonempty >= 6
