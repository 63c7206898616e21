"""FileHandler.from_reader (io.rs:396-422) and the startup banner."""

import io

import numpy as np
import pytest

from molar_tpu.io import FileHandler, FileIoError
from molar_tpu.utils import greeting


def test_from_reader_pdb(ref_data):
    data = (ref_data / "protein.pdb").read_bytes()
    fh = FileHandler.from_reader(io.BytesIO(data), "pdb")
    top, st = fh.read()
    with FileHandler(str(ref_data / "protein.pdb")) as ref:
        rtop, rst = ref.read()
    assert top.n_atoms == rtop.n_atoms
    np.testing.assert_array_equal(st.coords, rst.coords)


def test_from_reader_binary_xtc(ref_data):
    # binary + mmap path; the temp spool file is unlinked before reading
    data = (ref_data / "benzene.xtc").read_bytes()
    fh = FileHandler.from_reader(io.BytesIO(data), "xtc")
    n = 0
    while fh.read_state() is not None:
        n += 1
    with FileHandler(str(ref_data / "benzene.xtc")) as ref:
        m = 0
        while ref.read_state() is not None:
            m += 1
    assert n == m > 0


def test_from_reader_str_source(ref_data):
    text = (ref_data / "protein.pdb").read_text()
    fh = FileHandler.from_reader(io.StringIO(text), "pdb")
    assert fh.read_topology().n_atoms > 0


def test_from_reader_unknown_format():
    with pytest.raises(FileIoError):
        FileHandler.from_reader(io.BytesIO(b"xx"), "nope")


def test_greeting_banner(capsys):
    out = greeting("bench")
    assert "molar_tpu v" in out
    assert "tool: bench" in out
    # boxed: all lines same width
    lines = out.splitlines()
    assert len({len(l) for l in lines} ) == 1
    assert capsys.readouterr().err.strip() == out
