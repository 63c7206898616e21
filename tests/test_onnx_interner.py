"""Direct tests: minimal ONNX wire parser and the string interner."""

import pathlib

import numpy as np
import pytest

from molar_tpu.core.interner import NamePool
from molar_tpu.ff.onnx_mini import load_model

ONNX = pathlib.Path(__file__).parent.parent / "molar_tpu" / "ff" / "espaloma_charge.onnx"


def test_load_bundled_model():
    g = load_model(str(ONNX))
    assert len(g.nodes) > 0
    assert len(g.initializers) > 0
    ops = {n.op_type for n in g.nodes}
    # the espaloma charge head is a small MLP-over-graph: matmuls + adds
    assert "MatMul" in ops or "Gemm" in ops
    # every initializer parsed into a concrete numpy array
    for name, arr in g.initializers.items():
        assert isinstance(arr, np.ndarray) and arr.size >= 1
    assert g.outputs, "graph outputs parsed"


def test_interner_roundtrip_and_matching():
    pool = NamePool()
    codes = pool.intern_all(["CA", "CB", "CA", "N"])
    assert codes[0] == codes[2] != codes[1]
    assert pool.lookup(int(codes[3])) == "N"
    np.testing.assert_array_equal(pool.decode(codes), ["CA", "CB", "CA", "N"])
    assert pool.codes_equal("CB") == codes[1]
    assert set(pool.codes_matching(["CA", "N", "ZZ"])) == {codes[0], codes[3]}
    assert set(pool.codes_matching_regex("C.*")) == {codes[0], codes[1]}
    assert "CA" in pool and "ZZ" not in pool
