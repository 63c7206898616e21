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


def test_triclinic_npt_rescaled_frames():
    """Correction candidates must follow the per-frame box: a compiled
    'within pbc' selection evaluated on an NPT-rescaled triclinic frame has
    to match the host evaluator for THAT frame, not the compile-time box."""
    import jax.numpy as jnp

    from molar_tpu.core.pbc import PeriodicBox
    from molar_tpu.core.state import State
    from molar_tpu.selection.compiled import compile_selection
    from molar_tpu.selection.parser import parse
    from molar_tpu.core.system import System
    from molar_tpu.core.topology import Topology
    from molar_tpu.core.atom import Atom

    rng = np.random.default_rng(13)
    n = 240
    box0 = PeriodicBox.from_vectors_angles(3.0, 3.1, 3.2, 75.0, 82.0, 70.0)
    coords = (rng.uniform(0, 1, (n, 3)) @ box0.matrix.T).astype(np.float32)
    atoms = [Atom(name="C", resname="X", resid=i + 1) for i in range(n)]
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    sysr = System(top, State(coords=coords.copy(), box=box0))
    sel = "within 0.55 pbc of index 0:19"
    cs = compile_selection(parse(sel), sysr.topology, sysr.state)

    # NPT step: shrink the box 5%, rescale coordinates affinely.
    m1 = (box0.matrix * 0.95).astype(np.float32)
    box1 = PeriodicBox(m1)
    coords1 = (coords * 0.95).astype(np.float32)
    got = np.nonzero(
        np.asarray(
            cs(
                jnp.asarray(coords1),
                jnp.asarray(box1.matrix),
                jnp.asarray(box1.inv),
            )
        )
    )[0]
    from molar_tpu.ops import neighbor_host
    from molar_tpu.core.pbc import PBC_FULL

    want = neighbor_host.search_within(
        0.55, coords1, np.arange(n), np.arange(20), box1, PBC_FULL
    )
    np.testing.assert_array_equal(got, want)
