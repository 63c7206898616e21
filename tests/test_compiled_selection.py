"""Device-compiled selections vs the host evaluator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molar_tpu import SelectionExpr, System
from molar_tpu.selection.compiled import CompileUnsupported


@pytest.fixture(scope="module")
def protein(ref_data):
    return System.from_file(str(ref_data / "protein.pdb"))


def _check(sys, text, needs_box=False, **kw):
    expr = SelectionExpr(text)
    want = expr.apply(sys.topology, sys.state)
    comp = expr.compile_device(sys.topology, sys.state, kw or None)
    box = jnp.asarray(sys.state.box.matrix) if sys.state.box else None
    inv = jnp.asarray(sys.state.box.inv) if sys.state.box else None
    mask = comp(jnp.asarray(sys.state.coords), box, inv)
    got = np.nonzero(np.asarray(mask))[0]
    assert np.array_equal(got, want), (text, len(got), len(want))
    return comp


def test_static_constant(protein):
    _check(protein, "protein and name CA")


def test_coordinate_comparison(protein):
    _check(protein, "x < 4.0")
    _check(protein, "name CA and x + y > 8.5")
    _check(protein, "2.0 < z <= 4.0")
    _check(protein, "sqrt(x^2 + y^2) < 5 and mass > 2")


def test_within_static_inner(protein):
    rid = int(protein.topology.resid[0])
    _check(protein, f"within 0.5 pbc of resid {rid}")
    _check(protein, f"name CA and within 0.7 pbc of resid {rid}")
    _check(protein, f"within 0.5 pbc self of resid {rid}")


def test_within_point(protein):
    _check(protein, "within 1.0 pbc of 4.0 4.0 4.0")


def test_jit_and_per_frame_reeval(protein):
    expr = SelectionExpr("name CA and x < 4.0")
    comp = expr.compile_device(protein.topology, protein.state)
    f = jax.jit(lambda c: comp(c))
    m1 = np.asarray(f(jnp.asarray(protein.state.coords)))
    m2 = np.asarray(f(jnp.asarray(protein.state.coords + np.float32(100.0))))
    assert m1.sum() > 0 and m2.sum() == 0


def test_unsupported_raises(protein):
    expr = SelectionExpr("vx > 0")
    with pytest.raises(CompileUnsupported):
        expr.compile_device(protein.topology, protein.state)
    expr = SelectionExpr("within 0.5 pbc of x < 4")
    with pytest.raises(CompileUnsupported):
        expr.compile_device(protein.topology, protein.state)
