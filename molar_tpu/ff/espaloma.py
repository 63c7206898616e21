"""espaloma-charge partial charges via the bundled ONNX GNN.

Parity with the reference (molar_ff/src/charge.rs): per-atom features
``[n, 116]`` (element one-hot, degree/valence, RDKit-style Hueckel
aromaticity over individual + fused ring systems, mass, ring-size bits 3..8,
hybridization one-hot with neighbor-conjugation SP2 promotion) and a
row-mean-normalized adjacency feed a small GNN producing electronegativity/
hardness, followed by the closed-form equilibration
``q_i = -e_i/s_i + (1/s_i) (sum e_j/s_j)/(sum 1/s_j)`` (total charge 0).

The ONNX graph (MatMul/Add/Relu/Tanh/Gather only) is executed by a ~40-line
interpreter over the parsed graph (:mod:`molar_tpu.ff.onnx_mini`) in numpy —
n is tiny (one molecule), so the host path is the right one; the math is jax-
compatible if batched evaluation is ever needed.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from ..ops.perception import sssr_rings
from .onnx_mini import Graph, load_model

MODEL_PATH_CANDIDATES = [
    os.path.join(os.path.dirname(__file__), "espaloma_charge.onnx"),
    "/root/reference/molar_ff/assets/espaloma_charge.onnx",
]

_MASS = {1: 1.008, 6: 12.011, 7: 14.007, 8: 15.999, 9: 18.998,
         15: 30.974, 16: 32.06, 17: 35.45, 35: 79.904, 53: 126.904}
_OUTER = {1: 1, 6: 4, 7: 5, 8: 6, 9: 7, 15: 5, 16: 6, 17: 7, 35: 7, 53: 7}
_EN = {1: 2.20, 6: 2.55, 7: 3.04, 8: 3.44, 9: 3.98, 15: 2.19, 16: 2.58,
       17: 3.16, 35: 2.96, 53: 2.66}


class EspalomaError(RuntimeError):
    pass


@lru_cache(maxsize=1)
def _graph() -> Graph:
    for p in MODEL_PATH_CANDIDATES:
        if os.path.exists(p):
            return load_model(p)
    raise EspalomaError(
        "espaloma_charge.onnx not found; place it next to molar_tpu/ff/ or "
        "set MOLAR_ESPALOMA_MODEL"
    )


def run_gnn(features: np.ndarray, adj_mean: np.ndarray):
    """Execute the parsed graph -> (e, s) per atom."""
    g = _graph()
    env: dict[str, np.ndarray] = dict(g.initializers)
    env["features"] = features.astype(np.float32)
    env["adjacency_mean"] = adj_mean.astype(np.float32)
    for node in g.nodes:
        ins = [env[i] for i in node.inputs]
        op = node.op_type
        if op == "MatMul":
            out = ins[0] @ ins[1]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Tanh":
            out = np.tanh(ins[0])
        elif op == "Gather":
            axis = node.attrs.get("axis")
            ax = axis.i if axis is not None and axis.i is not None else 0
            out = np.take(ins[0], ins[1], axis=ax)
        else:
            raise EspalomaError(f"unsupported op {op}")
        env[node.outputs[0]] = out
    e = np.asarray(env[g.outputs[0]]).reshape(-1)
    s = np.asarray(env[g.outputs[1]]).reshape(-1)
    return e, s


# ---------------------------------------------------------------------------
# Featurization
# ---------------------------------------------------------------------------


def _hybridization(z, degree, n_double, n_triple, aromatic, neighbor_conj):
    if z == 1:
        return None
    if aromatic:
        return 1
    if degree >= 6:
        return 4
    if degree == 5:
        return 3
    if degree == 4:
        return 2
    if n_triple >= 1 or n_double >= 2:
        return 0
    if n_double == 1:
        return 1
    if neighbor_conj and ((z == 7 and degree == 3) or (z == 8 and degree <= 2)):
        return 1
    return 2


def _aromatic_atoms(z, fc, bonds, rings):
    n = len(z)
    inc: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for i, j, o in bonds:
        inc[i].append((j, o))
        inc[j].append((i, o))
    in_ring = np.zeros(n, dtype=bool)
    for r in rings:
        in_ring[r] = True

    contrib: list = []
    for a in range(n):
        sigma = len(inc[a])
        if sigma >= 4 or any(o == 3 and in_ring[j] for j, o in inc[a]):
            contrib.append(None)
            continue
        exocyclic_zero = False
        broken = False
        for j, o in inc[a]:
            if o >= 2 and not in_ring[j]:
                if _EN.get(int(z[j]), 0.0) > _EN.get(int(z[a]), 0.0):
                    exocyclic_zero = True
                else:
                    broken = True
                    break
        if broken:
            contrib.append(None)
            continue
        if exocyclic_zero:
            contrib.append(0)
            continue
        avail = _OUTER.get(int(z[a]), 0) - int(fc[a]) - sigma
        contrib.append(0 if avail <= 0 else (1 if avail % 2 == 1 else 2))

    def huckel(atoms):
        pi = 0
        for a in atoms:
            if contrib[a] is None:
                return False
            pi += contrib[a]
        return pi % 4 == 2

    arom = np.zeros(n, dtype=bool)
    for ring in rings:
        if huckel(ring):
            arom[ring] = True
    # Maximal fused systems (rings sharing >= 2 atoms), union-find.
    parent = list(range(len(rings)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            if len(set(rings[i]) & set(rings[j])) >= 2:
                parent[find(i)] = find(j)
    systems: dict[int, set] = {}
    for i in range(len(rings)):
        systems.setdefault(find(i), set()).update(rings[i])
    for atoms in systems.values():
        atoms = sorted(atoms)
        if huckel(atoms):
            arom[atoms] = True
    return arom


def featurize(z, fc, bonds):
    """(features [n,116], adjacency_mean [n,n]) per charge.rs:213-290."""
    n = len(z)
    rings = sssr_rings(n, np.asarray([(i, j) for i, j, _ in bonds]).reshape(-1, 2))
    rg = np.zeros((n, 11), dtype=bool)
    for r in rings:
        sz = min(len(r), 10)
        rg[r, sz] = True
    nd = np.zeros(n, np.int64)
    nt = np.zeros(n, np.int64)
    val = np.zeros(n, np.int64)
    deg = np.zeros(n, np.int64)
    for i, j, o in bonds:
        val[i] += o
        val[j] += o
        deg[i] += 1
        deg[j] += 1
        if o == 2:
            nd[i] += 1
            nd[j] += 1
        elif o == 3:
            nt[i] += 1
            nt[j] += 1
    aromatic = _aromatic_atoms(z, fc, bonds, rings)
    adjlist: list[list[int]] = [[] for _ in range(n)]
    for i, j, _ in bonds:
        adjlist[i].append(j)
        adjlist[j].append(i)
    neighbor_conj = np.array(
        [
            any(
                aromatic[j] or ((nd[j] > 0 or nt[j] > 0) and int(z[j]) in (6, 7))
                for j in adjlist[i]
            )
            for i in range(n)
        ]
    )
    feat = np.zeros((n, 116), dtype=np.float32)
    for i in range(n):
        zi = int(z[i])
        if zi < 100:
            feat[i, zi] = 1.0
        feat[i, 100] = deg[i]
        feat[i, 101] = val[i]
        feat[i, 102] = val[i]
        feat[i, 103] = 1.0 if aromatic[i] else 0.0
        feat[i, 104] = _MASS.get(zi, 0.0)
        for k, sz in enumerate(range(3, 9)):
            feat[i, 105 + k] = 1.0 if rg[i, sz] else 0.0
        h = _hybridization(zi, int(deg[i]), int(nd[i]), int(nt[i]),
                           bool(aromatic[i]), bool(neighbor_conj[i]))
        if h is not None:
            feat[i, 111 + h] = 1.0
    adj = np.zeros((n, n), dtype=np.float32)
    for i, j, _ in bonds:
        adj[i, j] = 1.0
        adj[j, i] = 1.0
    rowsum = adj.sum(axis=1, keepdims=True)
    adj = np.divide(adj, rowsum, out=adj, where=rowsum > 0)
    return feat, adj


def equilibrate(e: np.ndarray, s: np.ndarray) -> np.ndarray:
    """q_i = -e_i/s_i + (1/s_i) (sum e/s)/(sum 1/s); total charge 0."""
    inv = 1.0 / s
    lam = float((e * inv).sum() / inv.sum())
    return -e * inv + inv * lam


def espaloma_charges(z, fc, bonds) -> np.ndarray:
    feat, adj = featurize(z, fc, bonds)
    e, s = run_gnn(feat, adj)
    return equilibrate(e, s)


def apply_charges(sel_or_system) -> np.ndarray:
    """Compute espaloma charges for a Sel/System and write the charge column
    (reference SystemPy.apply_charges)."""
    from ..core.system import Sel, System

    if isinstance(sel_or_system, System):
        sel = sel_or_system.select_all()
    else:
        sel = sel_or_system
    top = sel.topology
    idx = sel.indices
    local = {int(g): k for k, g in enumerate(idx)}
    z = top.atomic_number[idx]
    fc = (
        top.formal_charge[idx]
        if top.formal_charge is not None
        else np.zeros(len(idx), np.int64)
    )
    bonds = []
    orders = top.bond_orders
    in_sel = np.zeros(top.n_atoms, dtype=bool)
    in_sel[idx] = True
    for bi in range(top.n_bonds):
        a, b = int(top.bonds[bi, 0]), int(top.bonds[bi, 1])
        if not (in_sel[a] and in_sel[b]):
            continue
        o = int(orders[bi]) if orders is not None else 1
        bonds.append((local[a], local[b], max(o, 1)))
    q = espaloma_charges(z, fc, bonds)
    top.charge[idx] = q.astype(top.charge.dtype)
    return q
