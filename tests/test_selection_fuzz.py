"""Property-based selection fuzzing: compiled vs host evaluator.

The fixed golden battery (test_selection_golden.py) covers each grammar
production once; the grammar's CROSS-PRODUCT space — nested not/same/within
over compound keywords and math, to depth ~4 — is where subset-semantics
bugs hide (reference contract: molar/src/selection/ast.rs:539-635). This
module generates hundreds of random *valid* expressions from a
grammar-directed generator and checks, on several random frames each:

1. the expression parses and evaluates without crashing;
2. where the device compiler supports the expression, the compiled mask
   equals the host evaluator's index set EXACTLY — modulo provable float
   boundary ties, which are re-examined in f64 and tolerated only when the
   compared quantity sits within epsilon of the threshold (f32-vs-f64
   rounding on an exact tie is not a semantics bug).

Seeded RNG -> deterministic suite; bump N_EXPR locally for deeper sweeps.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from molar_tpu import SelectionExpr, System
from molar_tpu.core.pbc import PeriodicBox
from molar_tpu.core.state import State
from molar_tpu.selection.compiled import CompileUnsupported

N_EXPR = 500
FRAMES_PER_EXPR = 2
BOX_SIDE = 4.0


# ---------------------------------------------------------------------------
# Synthetic system: 3 chains, protein + water + ligand residues, realistic
# names so compound keywords (protein/water/backbone/hydrogen) all have
# non-trivial extents.
# ---------------------------------------------------------------------------


def _build_system(tmp_path_factory) -> System:
    rng = np.random.default_rng(1234)
    lines = ["CRYST1   40.000   40.000   40.000  90.00  90.00  90.00 P 1"]
    serial = 0
    resid = 0
    protein_res = [
        ("ALA", ["N", "CA", "C", "O", "CB", "HB1"]),
        ("GLY", ["N", "CA", "C", "O", "HA2"]),
        ("LYS", ["N", "CA", "C", "O", "CB", "NZ", "HZ1"]),
    ]
    for chain in "AB":
        for _ in range(18):
            resname, names = protein_res[rng.integers(len(protein_res))]
            resid += 1
            base = rng.uniform(2.0, 38.0, 3)
            for nm in names:
                serial += 1
                x, y, z = base + rng.uniform(-1.5, 1.5, 3)
                el = nm[0] if nm[0] in "NCOH" else "C"
                lines.append(
                    f"ATOM  {serial:5d} {nm:<4s}{resname:<4s}{chain}{resid:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}{rng.uniform(0, 1):6.2f}"
                    f"{rng.uniform(0, 99):6.2f}          {el:>2s}"
                )
    for _ in range(30):  # water, chain W
        resid += 1
        base = rng.uniform(1.0, 39.0, 3)
        for nm, el in (("OW", "O"), ("HW1", "H"), ("HW2", "H")):
            serial += 1
            x, y, z = base + rng.uniform(-0.5, 0.5, 3)
            lines.append(
                f"ATOM  {serial:5d} {nm:<4s}{'SOL':<4s}W{resid:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {el:>2s}"
            )
    for _ in range(4):  # ligand, chain L
        resid += 1
        base = rng.uniform(5.0, 35.0, 3)
        for nm, el in (("C1", "C"), ("C2", "C"), ("O1", "O"), ("H1", "H")):
            serial += 1
            x, y, z = base + rng.uniform(-1.0, 1.0, 3)
            lines.append(
                f"HETATM{serial:5d} {nm:<4s}{'LIG':<4s}L{resid:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{0.5:6.2f}{10.0:6.2f}          {el:>2s}"
            )
    lines.append("END")
    p = tmp_path_factory.mktemp("fuzz") / "fuzz.pdb"
    p.write_text("\n".join(lines) + "\n")
    return System.from_file(str(p))


@pytest.fixture(scope="module")
def fuzz_system(tmp_path_factory):
    return _build_system(tmp_path_factory)


# ---------------------------------------------------------------------------
# Grammar-directed expression generator
# ---------------------------------------------------------------------------

NAMES = ["CA", "N", "C", "O", "CB", "OW", "HW1", "C1", "XX"]
RESNAMES = ["ALA", "GLY", "LYS", "SOL", "LIG", "ZZZ"]
KEYWORDS = ["protein", "water", "backbone", "sidechain", "hydrogen", "noh", "all"]
# grammar math vars (grammar.rs set + the README-promised int attributes
# resid/resindex/index this grammar additionally supports as operands)
MATH_VARS = ["x", "y", "z", "mass", "occupancy", "beta", "resid", "index"]


def _gen_leaf(rng) -> str:
    k = rng.integers(8)
    if k == 0:
        vals = " ".join(rng.choice(NAMES, size=rng.integers(1, 3), replace=False))
        return f"name {vals}"
    if k == 1:
        vals = " ".join(rng.choice(RESNAMES, size=rng.integers(1, 3), replace=False))
        return f"resname {vals}"
    if k == 2:
        a = int(rng.integers(1, 70))
        b = a + int(rng.integers(0, 20))
        return rng.choice([f"resid {a}", f"resid {a}:{b}"])
    if k == 3:
        a = int(rng.integers(0, 500))
        b = a + int(rng.integers(1, 120))
        return f"index {a}:{b}"
    if k == 4:
        return f"chain {rng.choice(['A', 'B', 'W', 'L'])}"
    if k == 5:
        return str(rng.choice(KEYWORDS))
    if k == 6:
        return _gen_comparison(rng)
    # chained comparison
    v = rng.choice(["x", "y", "z"])
    lo = round(float(rng.uniform(0.0, 2.0)), 3)
    hi = round(lo + float(rng.uniform(0.3, 2.0)), 3)
    return f"{lo} < {v} <= {hi}"


def _gen_math(rng, depth=0) -> str:
    if depth >= 2 or rng.random() < 0.5:
        if rng.random() < 0.75:
            return str(rng.choice(MATH_VARS))
        return str(round(float(rng.uniform(0.1, 4.0)), 3))
    op = rng.choice(["+", "-", "*"])
    a = _gen_math(rng, depth + 1)
    b = _gen_math(rng, depth + 1)
    if rng.random() < 0.25:
        return f"abs({a} {op} {b})"
    return f"({a} {op} {b})"


def _gen_comparison(rng) -> str:
    lhs = _gen_math(rng)
    op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
    rhs = round(float(rng.uniform(0.0, 4.0)), 3)
    return f"{lhs} {op} {rhs}"


def _gen_expr(rng, depth=0) -> str:
    if depth >= 4:
        return _gen_leaf(rng)
    k = rng.integers(10)
    if k <= 3:
        return _gen_leaf(rng)
    if k <= 5:
        a = _gen_expr(rng, depth + 1)
        b = _gen_expr(rng, depth + 1)
        op = rng.choice(["and", "or"])
        return f"({a} {op} {b})"
    if k == 6:
        return f"not ({_gen_expr(rng, depth + 1)})"
    if k == 7:
        kind = rng.choice(["residue", "chain"])
        return f"same {kind} as ({_gen_expr(rng, depth + 1)})"
    if k == 8:
        r = round(float(rng.uniform(0.3, 1.2)), 3)
        pbc = rng.choice(["", " pbc", " nopbc"])
        slf = rng.choice(["", " self"])
        return f"within {r}{pbc}{slf} of ({_gen_expr(rng, depth + 1)})"
    # point-within
    r = round(float(rng.uniform(0.5, 2.0)), 3)
    px, py, pz = (round(float(rng.uniform(0, 4.0)), 2) for _ in range(3))
    return f"within {r} pbc of {px} {py} {pz}"


# ---------------------------------------------------------------------------
# Boundary-tie oracle: a compiled-vs-host disagreement is only a bug if it
# cannot be explained by an exact float tie on some comparison/cutoff.
# ---------------------------------------------------------------------------


def _expression_thresholds(text: str) -> list[float]:
    import re

    return [float(m.group(0)) for m in re.finditer(r"\d+\.\d+", text)]


def _is_boundary_tie(sys_, text, atom_idx, coords) -> bool:
    """True if every disagreeing atom sits within epsilon of some numeric
    threshold of the expression along some compared quantity — i.e. the
    disagreement is f32-vs-f64 rounding of an exact tie, not semantics."""
    ths = _expression_thresholds(text)
    if not ths:
        return False
    c = np.asarray(coords, np.float64)
    eps = 2e-4
    for a in atom_idx:
        vals = [c[a, 0], c[a, 1], c[a, 2]]
        # distances to every other atom (covers within cutooffs)
        d = np.linalg.norm(c - c[a], axis=1)
        near_any = False
        for t in ths:
            if any(abs(v - t) < eps for v in vals):
                near_any = True
                break
            if np.any(np.abs(d - t) < eps):
                near_any = True
                break
            # PBC-folded distance (orthorhombic)
            dd = c - c[a]
            dd -= BOX_SIDE * np.round(dd / BOX_SIDE)
            if np.any(np.abs(np.linalg.norm(dd, axis=1) - t) < eps):
                near_any = True
                break
        if not near_any:
            return False
    return True


def test_selection_fuzz_compiled_vs_evaluator(fuzz_system):
    sys_ = fuzz_system
    rng = np.random.default_rng(20260817)
    n = sys_.n_atoms
    box = sys_.state.box
    bj = jnp.asarray(box.matrix)
    ij = jnp.asarray(box.inv)

    n_checked = 0
    n_compiled = 0
    n_ties = 0
    failures = []
    for t in range(N_EXPR):
        text = _gen_expr(rng)
        try:
            expr = SelectionExpr(text)
        except Exception as e:  # the generator must only emit valid strings
            failures.append((text, f"parse failed: {e}"))
            continue

        frames = [sys_.state.coords]
        for _ in range(FRAMES_PER_EXPR - 1):
            frames.append(
                (
                    sys_.state.coords
                    + rng.normal(0, 0.3, (n, 3)).astype(np.float32)
                )
                % np.float32(BOX_SIDE)
            )

        comp = None
        try:
            comp = expr.compile_device(sys_.topology, sys_.state)
            n_compiled += 1
        except CompileUnsupported:
            pass
        except Exception as e:
            failures.append((text, f"compile crashed: {e}"))
            continue

        for coords in frames:
            st = State(coords=coords, box=box, time=0.0)
            try:
                want = expr.apply(sys_.topology, st)
            except Exception as e:
                failures.append((text, f"evaluator crashed: {e}"))
                break
            n_checked += 1
            if comp is None:
                continue
            got = np.nonzero(np.asarray(comp(jnp.asarray(coords), bj, ij)))[0]
            if np.array_equal(got, want):
                continue
            diff = np.setxor1d(got, want)
            if _is_boundary_tie(sys_, text, diff, coords):
                n_ties += 1
                continue
            failures.append(
                (text, f"compiled {len(got)} vs host {len(want)}; "
                       f"diff atoms {diff[:8].tolist()}")
            )
            break

    assert not failures, failures[:5]
    # the sweep must actually exercise the compiled path broadly
    assert n_compiled > N_EXPR // 4, (n_compiled, N_EXPR)
    assert n_checked >= N_EXPR
