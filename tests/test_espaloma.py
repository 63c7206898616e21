"""espaloma charge tests: fixture parity + corpus spot checks."""

import json
import pathlib

import numpy as np
import pytest

from molar_tpu.ff.espaloma import (
    _use_jax,
    equilibrate,
    featurize,
    run_gnn,
    run_gnn_jax,
)

FIXTURE = pathlib.Path("/root/reference/molar_ff/tests/data/espaloma_fixture.json")
CORPUS = pathlib.Path("/root/reference/molar_ff/tests/data/gaff_ref")


def test_gnn_matches_python_fixture():
    if not FIXTURE.exists():
        pytest.skip("fixture not available")
    fx = json.loads(FIXTURE.read_text())
    feats = np.asarray(fx["features"], np.float32)
    adj = np.asarray(fx["adjacency_mean"], np.float32)
    e, s = run_gnn(feats, adj)
    np.testing.assert_allclose(e, fx["e"], atol=1e-5)
    q = equilibrate(e, s)
    np.testing.assert_allclose(q, fx["charges"], atol=1e-5)
    assert abs(q.sum()) < 1e-5  # charges sum to zero


def test_equilibrate_closed_form():
    e = np.array([1.0, 2.0, 3.0])
    s = np.array([2.0, 2.0, 2.0])
    q = equilibrate(e, s)
    assert abs(q.sum()) < 1e-12
    # symmetric hardness: charge ordering opposite of electronegativity
    assert q[0] > q[1] > q[2]


def test_featurize_benzene():
    z = [6] * 6 + [1] * 6
    bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2), (5, 0, 1)]
    bonds += [(i, i + 6, 1) for i in range(6)]
    fc = [0] * 12
    feat, adj = featurize(z, fc, bonds)
    assert feat.shape == (12, 116)
    # carbons: one-hot at 6, aromatic flag, ring-6 bit, SP2 hybridization
    for i in range(6):
        assert feat[i, 6] == 1.0
        assert feat[i, 103] == 1.0  # aromatic
        assert feat[i, 105 + 3] == 1.0  # ring size 6 (105 + (6-3))
        assert feat[i, 112] == 1.0  # SP2
    # hydrogens: no hybridization one-hot
    assert feat[6, 111:116].sum() == 0.0
    # adjacency row-normalized
    np.testing.assert_allclose(adj.sum(axis=1), 1.0, atol=1e-6)


def test_gnn_jax_parity():
    """Jitted-jax forward matches the numpy walk on real molecules.

    Exercises two pad buckets (benzene n=12 -> 16; a 40-atom random graph
    -> 48) so the padding argument in run_gnn_jax's docstring is tested,
    not assumed."""
    rng = np.random.default_rng(7)
    cases = []
    # benzene featurization (real features incl. aromatic flags)
    z = [6] * 6 + [1] * 6
    bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2), (5, 0, 1)]
    bonds += [(i, i + 6, 1) for i in range(6)]
    cases.append(featurize(z, [0] * 12, bonds))
    # synthetic 40-atom molecule-shaped input (chain adjacency, random feats)
    n = 40
    feat = rng.standard_normal((n, 116)).astype(np.float32)
    adj = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1.0
    adj /= adj.sum(axis=1, keepdims=True)
    cases.append((feat, adj))
    for feat, adj in cases:
        e0, s0 = run_gnn(feat, adj)
        e1, s1 = run_gnn_jax(feat, adj)
        np.testing.assert_allclose(e1, e0, atol=1e-5)
        np.testing.assert_allclose(s1, s0, atol=1e-5)
        q0, q1 = equilibrate(e0, s0), equilibrate(e1, s1)
        np.testing.assert_allclose(q1, q0, atol=1e-4)


def test_backend_dispatch(monkeypatch):
    # explicit override wins both ways; auto keys on an imported jax
    monkeypatch.setenv("MOLAR_ESPALOMA_BACKEND", "numpy")
    assert _use_jax() is False
    monkeypatch.setenv("MOLAR_ESPALOMA_BACKEND", "jax")
    assert _use_jax() is True
    monkeypatch.setenv("MOLAR_ESPALOMA_BACKEND", "auto")
    import sys

    assert _use_jax() is ("jax" in sys.modules)


def test_corpus_spot_checks():
    if not CORPUS.is_dir():
        pytest.skip("corpus not available")
    import jax

    from molar_tpu import System
    from molar_tpu.ff.espaloma import apply_charges

    refs = json.loads((CORPUS / "references_espaloma.json").read_text())
    for m in refs["molecules"][:25]:
        sys = System.from_file(str(CORPUS / "sdf" / f"{m['name']}.sdf"))
        q = apply_charges(sys)
        rmse = float(np.sqrt(np.mean((q - np.asarray(m["charges"])) ** 2)))
        assert rmse < 1e-3, (m["name"], rmse)
        # charge column written back
        np.testing.assert_allclose(sys.topology.charge, q, atol=1e-5)
