"""GAFF / GAFF2 atom typing (antechamber-compatible).

Pipeline parity with the reference molar_ff (molar_ff/src/gaff*.rs), validated
against the 597-molecule antechamber corpus at the >= 0.995 per-atom accuracy
bar (gaff_parity.rs:23-24):

1. ring perception: all chordless simple rings of size 3..10 over
   ring-eligible atoms (positional neighbor caps at 4 preserved), per-atom
   ring-size counts;
2. GAFF ring classes AR1..AR5 + electron-withdrawing + non-ring flags
   (element+connectivity heuristic, not Hueckel);
3. per-atom property counts (coordination, attached H, EW neighbors,
   single/double/triple bond counts — Kekule input);
4. the rule matcher over the structured ATOMTYPE_GFF(2).DEF tables: scalar
   fields, atomic-property [..] constraints (AND of OR-groups, with
   bond-to-predecessor quote codes), chemical-environment (..) chains matched
   by DFS path enumeration + the cross-branch distinctness check;
5. the conjugation parity split (cc->cd, ce->cf, ... and cp->cq 2-coloring).

Rule tables: the antechamber ``ATOMTYPE_GFF.DEF``/``ATOMTYPE_GFF2.DEF`` data
files (public AmberTools data) are parsed by :func:`parse_def` — this module's
own implementation of the DEF grammar, including the stateful chemical-
environment walk with its per-token ``cesname`` branch ids. The parsed rules
ship as ``gaff_rules.json``/``gaff2_rules.json`` next to this file (regenerate
with ``python -m molar_tpu.ff.gaff <DEF> <out.json>``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)

RING_MAP = {"RG": 0, "RG3": 3, "RG4": 4, "RG5": 5, "RG6": 6,
            "RG7": 7, "RG8": 8, "RG9": 9, "RG10": 10}
AROM_MAP = {"AR1": 1, "AR2": 2, "AR3": 3, "AR4": 4, "AR5": 5}
WILD_NAMES = ["XX", "XA", "XB", "XC", "XD"]

_SYMBOLS = [
    "", "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg", "Al",
    "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn", "Fe",
    "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr",
    "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd", "Pm", "Sm",
    "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb", "Lu", "Hf", "Ta", "W",
    "Re", "Os", "Ir", "Pt", "Au", "Hg", "Tl", "Pb", "Bi", "Po", "At", "Rn",
    "Fr", "Ra", "Ac", "Th", "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf",
    "Es", "Fm", "Md", "No", "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds",
    "Rg", "Cn", "Nh", "Fl", "Mc", "Lv", "Ts", "Og",
]
_SYM2Z = {s: i for i, s in enumerate(_SYMBOLS) if s}


class FFError(RuntimeError):
    pass


# ===========================================================================
# DEF parsing (rule-table generation)
# ===========================================================================


def _parse_unit(unit: str):
    """One property token (`RG6`, `1RG6`, `AR2`, `sb'`, `0DL`) ->
    {n, p: ('ring',k)|('arom',k)|'nr'|'sb'|'db'|'tb'|'dl'|'ab', q}."""
    i = 0
    while i < len(unit) and unit[i].isdigit():
        i += 1
    n = int(unit[:i]) if i > 0 else None
    name = unit[i:]
    if name in RING_MAP:
        return {"n": n, "p": ["ring", RING_MAP[name]], "q": 0}
    if name in AROM_MAP:
        return {"n": n, "p": ["arom", AROM_MAP[name]], "q": 0}
    if name == "NR":
        return {"n": n, "p": "nr", "q": 0}
    if len(name) < 2:
        raise FFError(f"unrecognised property unit {unit!r}")
    two = name[:2]
    variant = {
        "SB": "sb", "sb": "sb", "DB": "db", "db": "db",
        "TB": "tb", "tb": "tb", "DL": "dl", "AB": "ab",
    }.get(two)
    if variant is None:
        raise FFError(f"unrecognised property unit {unit!r}")
    q = 0
    if len(name) > 2 and name[2] == "'":
        q = 2 if len(name) > 3 and name[3] == "'" else 1
    return {"n": n, "p": variant, "q": q}


def _parse_prop(s: Optional[str]):
    """`[...]` field -> AND-list of OR-groups of predicate units."""
    if not s or s == "*":
        return []
    constraints, units, cur = [], [], ""
    for ch in s:
        if ch == "[":
            continue
        if ch == "]":
            units.append(cur)
            cur = ""
            constraints.append(units)
            units = []
            break
        if ch == ".":
            units.append(cur)
            cur = ""
        elif ch == ",":
            units.append(cur)
            cur = ""
            constraints.append(units)
            units = []
        else:
            cur += ch
    return [[_parse_unit(u) for u in g] for g in constraints]


def _parse_cenv(keyword: Optional[str]):
    """`(...)` field -> list of chains of beads, reproducing antechamber's
    stateful walk (two-letter tokens, [..] bead props, <..> names skipped,
    chain emission on ','/')' unless right after ')', incrementing cesname)."""
    if not keyword or keyword == "*":
        return []
    kw = keyword
    n = len(kw)

    def get(i):
        return kw[i] if 0 <= i < n else "\0"

    def getm(i):
        return get(i - 1) if i != 0 else "\0"

    def is_alpha(c):
        return c.isascii() and c.isalpha()

    SZ = 64
    atname = [""] * SZ
    atconnum = [0] * SZ
    apindex = [False] * SZ
    ap = [""] * SZ
    cesname = [0] * SZ

    chains = []
    layer = 0
    index0 = False
    tmpapindex = False
    tmpap = ""
    cesname_index = False
    cea_id = 1

    def make_bead(j):
        name = atname[j]
        if name == "EW":
            atom = ["ew"]
        elif name in WILD_NAMES:
            atom = ["wild", WILD_NAMES.index(name)]
        else:
            z = _SYM2Z.get(name)
            if z is None:
                raise FFError(f"unknown atom token {name!r}")
            atom = ["z", z]
        return {
            "atom": atom,
            "n": atconnum[j] if atconnum[j] != 0 else None,
            "prop": _parse_prop(ap[j]) if apindex[j] and ap[j] else [],
            "cesname": cesname[j],
        }

    for i in range(n):
        c = kw[i]
        if (not tmpapindex) and (not cesname_index) and is_alpha(c) and is_alpha(get(i + 1)):
            continue
        if c == "(":
            layer += 1
        if c == ")":
            layer = max(0, layer - 1)
        if (not tmpapindex) and c == "[":
            tmpapindex = True
            tmpap = "["
            continue
        if tmpapindex and c == "]":
            apindex[layer] = True
            tmpap += "]"
            ap[layer] = tmpap
            tmpapindex = False
            continue
        if tmpapindex:
            tmpap += c
            continue
        if (not cesname_index) and c == "<":
            cesname_index = True
            continue
        if cesname_index and c == ">":
            cesname_index = False
            continue
        if cesname_index:
            continue
        if c == "," and getm(i) != ")":
            chains.append([make_bead(j + 1) for j in range(layer)])
        if c == ")" and getm(i) != ")":
            chains.append([make_bead(j + 1) for j in range(layer + 1)])
        if is_alpha(c) and is_alpha(get(i + 1)):
            continue
        if is_alpha(c):
            index0 = True
            atname[layer] = (getm(i) + c) if is_alpha(getm(i)) else c
            ap[layer] = ""
            apindex[layer] = False
            cesname[layer] = cea_id
            cea_id += 1
        if c.isdigit():
            atconnum[layer] = int(c)
        elif index0:
            atconnum[layer] = 0
            index0 = False
    return chains


def parse_def(text: str):
    """Parse an ATOMTYPE_*.DEF file into (rules, wildatoms).

    Rules are in file order (first match wins); wildatoms map wildcard names
    to (z, connum) pair lists (connum 0 = any).
    """
    rules = []
    wildatoms = {w: [] for w in WILD_NAMES}
    for line in text.splitlines():
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "WILDATOM" and len(toks) >= 3:
            name = toks[1]
            pairs = []
            for t in toks[2:]:
                # symbol with optional trailing digit for connum (e.g. "N3")
                sym = t.rstrip("0123456789")
                cn = t[len(sym):]
                z = _SYM2Z.get(sym)
                if z is None:
                    raise FFError(f"unknown wildatom element {t!r}")
                pairs.append([z, int(cn) if cn else 0])
            wildatoms[name] = pairs
            continue
        if toks[0] != "ATD":
            continue
        name = toks[1]
        vals = []
        for t in toks[2:]:
            if t == "&":
                break
            vals.append(t)
        while len(vals) < 7:
            vals.append("*")
        _f3, f4, f5, f6, f7, f8, f9 = vals[:7]

        def scal(x):
            return None if x == "*" else int(x)

        rules.append(
            {
                "name": name,
                "z": scal(f4),
                "connum": scal(f5),
                "nh": scal(f6),
                "ew": scal(f7),
                "prop": _parse_prop(f8),
                "env": _parse_cenv(f9),
            }
        )
    return rules, [wildatoms[w] for w in WILD_NAMES]


_TABLES: dict[str, tuple] = {}


def _load_tables(ff: str):
    if ff not in _TABLES:
        path = os.path.join(_DIR, f"{ff}_rules.json")
        with open(path) as fh:
            data = json.load(fh)
        _TABLES[ff] = (data["rules"], data["wildatoms"])
    return _TABLES[ff]


# ===========================================================================
# Ring perception (all chordless simple rings, size 3..10)
# ===========================================================================


def _build_adj(n: int, bonds) -> list[list[int]]:
    """Neighbor lists in input-bond order (positional truncation depends on it)."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for i, j, _o in bonds:
        adj[i].append(j)
        adj[j].append(i)
    return adj


def _ring_eligible(z: int, connum: int) -> bool:
    if z == 6:
        return connum > 2
    if z in (7, 15):
        return True
    if z in (8, 16):
        return connum != 1
    return False


def detect_rings(z, adj) -> list[list[int]]:
    n = len(z)
    raw: list[list[int]] = []

    def walk(cur, path):
        path.append(cur)
        sn = len(path)
        if sn <= 10:
            a0 = path[0]
            for start in adj[cur][:4]:
                if not _ring_eligible(z[start], len(adj[start])):
                    continue
                if start in path:
                    continue
                if 2 <= sn <= 9 and start in adj[a0][:4]:
                    raw.append(path + [start])
                walk(start, path)
        path.pop()

    for i in range(n):
        if _ring_eligible(z[i], len(adj[i])):
            walk(i, [])

    unique: list[list[int]] = []
    seen = set()
    for r in raw:
        key = tuple(sorted(r))
        if key not in seen:
            seen.add(key)
            unique.append(sorted(r))
    out = []
    for r in unique:
        rset = set(r)
        if any(sum(nb in rset for nb in adj[m]) == 3 for m in r):
            continue  # chord (fused-ring envelope)
        out.append(r)
    return out


def ring_property(n: int, rings) -> list[list[int]]:
    rg = [[0] * 11 for _ in range(n)]
    for r in rings:
        sz = len(r)
        for m in r:
            rg[m][0] += 1
            if sz <= 10:
                rg[m][sz] += 1
    return rg


# ===========================================================================
# AR1..AR5 aromaticity classes + EW + non-ring
# ===========================================================================


def _init_arom(z: int, connum: int) -> int:
    if z == 6:
        return 2 if connum == 3 else (-2 if connum == 4 else 0)
    if z == 7:
        return 2 if connum <= 3 else 0
    if z == 8:
        return 1 if connum == 2 else 0
    if z == 15:
        if connum == 2:
            return 2
        if connum == 3:
            return 1
        return -1 if connum >= 4 else 0
    if z == 16:
        if connum == 2:
            return 1
        return -1 if connum >= 3 else 0
    return 0


def _ewd_flag(z: int) -> int:
    return 1 if z in (7, 8, 16, 9, 17, 35, 53) else 0


def aromatic(z, adj, bonds, rings, rg):
    n = len(z)
    initarom = [_init_arom(z[i], len(adj[i])) for i in range(n)]
    ewd = [_ewd_flag(z[i]) for i in range(n)]
    ar = [[0] * 6 for _ in range(n)]
    nr = [True] * n

    for r in rings:
        num = len(r)
        rset = set(r)
        tmpint = sum(initarom[m] for m in r)
        if tmpint == -2 * num:
            for m in r:
                ar[m][5] += 1
            continue
        if any(initarom[m] < 0 for m in r):
            for m in r:
                ar[m][4] += 1
            continue
        if num <= tmpint <= 2 * num:
            found = False
            for i, j, o in bonds:
                index = 0
                if i in rset and rg[j][0] == 0:
                    index += 1
                if j in rset and rg[i][0] == 0:
                    index += 1
                if index == 1 and o in (2, 8):
                    found = True
                    break
            if found:
                for m in r:
                    ar[m][3] += 1
                continue
        if tmpint == 12 and num == 6:
            bad = False
            for m in r:
                if z[m] in (7, 15):
                    has_pi = any(
                        (i == m or j == m) and o in (8, 2, 10) for i, j, o in bonds
                    )
                    if not has_pi:
                        bad = True
            if not bad:
                for m in r:
                    ar[m][1] += 1
                continue
        if tmpint >= num + 3:
            for m in r:
                ar[m][2] += 1
            continue
        for m in r:
            ar[m][4] += 1

    for i in range(n):
        if any(ar[i][k] > 0 for k in range(1, 6)):
            nr[i] = False
    return ar, ewd, nr


# ===========================================================================
# Per-atom property counts
# ===========================================================================

MAX_CON = 6


def compute_props(z, adj, bonds, ewd):
    n = len(z)
    connum = [len(adj[i]) for i in range(n)]
    nh = [sum(1 for nb in adj[i][:MAX_CON] if z[nb] == 1) for i in range(n)]
    ewd_neigh = [sum(1 for nb in adj[i][:MAX_CON] if ewd[nb] == 1) for i in range(n)]
    sb = [0] * n
    db = [0] * n
    tb = [0] * n
    for i, j, o in bonds:
        if o == 1:
            sb[i] += 1
            sb[j] += 1
        elif o == 2:
            db[i] += 1
            db[j] += 1
        elif o == 3:
            tb[i] += 1
            tb[j] += 1
    return {
        "connum": connum, "nh": nh, "ewd_neigh": ewd_neigh,
        "sb": sb, "db": db, "tb": tb,
    }


# ===========================================================================
# Rule matcher
# ===========================================================================


class _Ctx:
    def __init__(self, z, adj, bonds, props, rg, ar, nr, ewd, rules, wildatoms):
        self.z = z
        self.adj = adj
        self.props = props
        self.rg = rg
        self.ar = ar
        self.nr = nr
        self.ewd = ewd
        self.rules = rules
        self.wildatoms = wildatoms
        self.bond_order = {}
        for i, j, o in bonds:
            self.bond_order[(min(i, j), max(i, j))] = o

    def bond_is(self, a, b, order):
        if order == 0:
            return False
        return self.bond_order.get((min(a, b), max(a, b))) == order

    # -- atomic properties ---------------------------------------------------

    def apcheck(self, atmid, pre, prop):
        return all(
            any(self.pred_ok(atmid, pre, p) for p in group) for group in prop
        )

    def pred_ok(self, atmid, pre, pred):
        n = pred["n"]
        p = pred["p"]
        q = pred["q"]

        def cnt_ok(val):
            return val > 0 if n is None else val == n

        def bond_quote(order):
            if q == 0:
                return True
            if pre is None:
                return False
            hit = self.bond_is(atmid, pre, order)
            return hit if q == 1 else not hit

        if isinstance(p, list):
            kind, k = p
            if kind == "ring":
                return cnt_ok(self.rg[atmid][k])
            if kind == "arom":
                return cnt_ok(self.ar[atmid][k])
            raise FFError(p)
        if p == "nr":
            return cnt_ok(1 if self.nr[atmid] else 0)
        if p == "sb":
            return cnt_ok(self.props["sb"][atmid]) and bond_quote(1)
        if p == "db":
            return cnt_ok(self.props["db"][atmid]) and bond_quote(2)
        if p == "tb":
            return cnt_ok(self.props["tb"][atmid]) and bond_quote(3)
        if p in ("dl", "ab"):
            return cnt_ok(0)
        raise FFError(p)

    def wild_ok(self, w, a):
        for anum, cnum in self.wildatoms[w]:
            if self.z[a] == anum and (cnum == 0 or self.props["connum"][a] == cnum):
                return True
        return False

    # -- chemical environment ------------------------------------------------

    def cematch(self, caid, chains, maxchain, path, startnum, cesindex, schains):
        path.append(startnum)
        selectnum = len(path)
        for k, ch in enumerate(chains):
            if selectnum - 1 == len(ch) and self.match_chain(caid, path, ch):
                cesindex[k] += 1
                schains.append((k, list(path[1:])))
        if selectnum <= maxchain:
            for nb in self.adj[startnum][:6]:
                if nb in path:
                    continue
                self.cematch(caid, chains, maxchain, path, nb, cesindex, schains)
        path.pop()

    def match_chain(self, caid, path, ch):
        for b, bead in enumerate(ch):
            a = path[b + 1]
            if bead["n"] is not None and self.props["connum"][a] != bead["n"]:
                return False
            atom = bead["atom"]
            if atom[0] == "z":
                if self.z[a] != atom[1]:
                    return False
            elif atom[0] == "wild":
                if not self.wild_ok(atom[1], a):
                    return False
            else:  # ew
                if self.ewd[a] != 1:
                    return False
            if bead["prop"]:
                pred = caid if b == 0 else path[b]
                if not self.apcheck(a, pred, bead["prop"]):
                    return False
        return True

    def dccheck(self, slot, chain_count, schains, sci, chains):
        for i, (cid, _at) in enumerate(schains):
            if cid != slot:
                continue
            sci[slot] = i
            if slot + 1 == chain_count:
                done = self.chain_check(sci, schains, chains, chain_count)
            else:
                done = self.dccheck(slot + 1, chain_count, schains, sci, chains)
            if done:
                return True
        return False

    def chain_check(self, sci, schains, chains, chain_count):
        for i in range(chain_count):
            for j in range(i + 1, chain_count):
                si, sj = sci[i], sci[j]
                if si == sj:
                    return False
                a = schains[si][1]
                b = schains[sj][1]
                m = min(len(a), len(b))
                if not any(a[k] != b[k] for k in range(m)):
                    return False  # one path is a prefix of the other
                for k in range(m):
                    ci = chains[i][k]["cesname"]
                    cj = chains[j][k]["cesname"]
                    if a[k] == b[k] and ci != cj:
                        return False
                    if a[k] != b[k] and ci == cj:
                        return False
        return True

    def jatspecial(self, atomno, env):
        if not env:
            return False
        maxchain = max(len(c) for c in env)
        cesindex = [0] * len(env)
        schains: list = []
        self.cematch(atomno, env, maxchain, [], atomno, cesindex, schains)
        if any(c == 0 for c in cesindex):
            return False
        sci = [0] * len(env)
        return self.dccheck(0, len(env), schains, sci, env)

    # -- top level -------------------------------------------------------------

    def try_rule(self, i, rule):
        if rule["z"] is not None and rule["z"] != self.z[i]:
            return None
        if rule["connum"] is not None and rule["connum"] != self.props["connum"][i]:
            return None
        if rule["nh"] is not None and rule["nh"] != self.props["nh"][i]:
            return None
        if rule["ew"] is not None:
            nbrs = self.adj[i]
            first = nbrs[0] if nbrs else i
            if rule["ew"] != self.props["ewd_neigh"][first]:
                return None
        if rule["prop"] and not self.apcheck(i, None, rule["prop"]):
            return None
        if rule["env"] and not self.jatspecial(i, rule["env"]):
            return None
        return rule["name"]

    def type_atom(self, i):
        for rule in self.rules:
            name = self.try_rule(i, rule)
            if name is not None:
                return name
        return None


# ===========================================================================
# Conjugation parity split
# ===========================================================================

_AT_ADJUST = {"cc": "cd", "ce": "cf", "cg": "ch", "pc": "pd",
              "pe": "pf", "nc": "nd", "ne": "nf"}


def _atadjust(types, bonds):
    n = len(types)
    index1 = [0] * n
    index2 = [False] * n
    seeded = False
    num = 0
    for i in range(n):
        if types[i] in _AT_ADJUST:
            index2[i] = True
            if not seeded:
                index1[i] = 1
                seeded = True
            num += 1
    if num == 0:
        return
    for _ in range(num - 1):
        flag = False
        for bi, bj, o in bonds:
            if not (index2[bi] and index2[bj]):
                continue
            if not flag and index1[bi] == 0 and index1[bj] == 0:
                index1[bi] = 1
            if index1[bi] == 0 and index1[bj] != 0:
                flag = True
                index1[bi] = index1[bj] if o == 1 else -index1[bj]
            if index1[bj] == 0 and index1[bi] != 0:
                flag = True
                index1[bj] = index1[bi] if o == 1 else -index1[bi]
    for i in range(n):
        if index1[i] == -1 and types[i] in _AT_ADJUST:
            types[i] = _AT_ADJUST[types[i]]


def _cpadjust(types, bonds):
    n = len(types)
    index1 = [0] * n
    index2 = [False] * n
    seeded = False
    num = 0
    for i in range(n):
        if types[i] == "cp":
            index2[i] = True
            if not seeded:
                index1[i] = 1
                seeded = True
            num += 1
    if num == 0:
        return
    for _ in range(num - 1):
        for bi, bj, o in bonds:
            if not (index2[bi] and index2[bj]):
                continue
            if index1[bi] == 0 and index1[bj] != 0:
                index1[bi] = index1[bj] if o == 1 else -index1[bj]
            if index1[bj] == 0 and index1[bi] != 0:
                index1[bj] = index1[bi] if o == 1 else -index1[bi]
    for i in range(n):
        if index1[i] == -1 and types[i] == "cp":
            types[i] = "cq"


# ===========================================================================
# Public API
# ===========================================================================


def gaff_types(z, bonds, ff: str = "gaff") -> list[str]:
    """Type every atom. ``z``: local atomic numbers; ``bonds``: (i, j, order)
    with Kekule orders 1/2/3; ``ff``: 'gaff' | 'gaff2'."""
    rules, wildatoms = _load_tables(ff)
    z = [int(v) for v in z]
    bonds = [(int(i), int(j), int(o)) for i, j, o in bonds]
    adj = _build_adj(len(z), bonds)
    rings = detect_rings(z, adj)
    rg = ring_property(len(z), rings)
    ar, ewd, nr = aromatic(z, adj, bonds, rings, rg)
    props = compute_props(z, adj, bonds, ewd)
    ctx = _Ctx(z, adj, bonds, props, rg, ar, nr, ewd, rules, wildatoms)
    types = []
    for i in range(len(z)):
        t = ctx.type_atom(i)
        if t is None:
            raise FFError(f"could not assign a {ff} type to atom {i} (Z={z[i]})")
        types.append(t)
    _atadjust(types, bonds)
    _cpadjust(types, bonds)
    return types


def apply_ff(sel_or_system, ff: str = "gaff") -> list[str]:
    """Assign GAFF types to a Sel/System, writing ``type_name``
    (reference ApplyFF, molar_ff/src/lib.rs:79-150). The selection must be
    bond-complete (no bonds crossing its boundary)."""
    from ..core.system import Sel, System

    if isinstance(sel_or_system, System):
        sel = sel_or_system.select_all()
    else:
        sel = sel_or_system
    top = sel.topology
    idx = sel.indices
    local = {int(g): k for k, g in enumerate(idx)}
    in_sel = np.zeros(top.n_atoms, dtype=bool)
    in_sel[idx] = True
    z = top.atomic_number[idx]
    bonds = []
    orders = top.bond_orders
    for bi in range(top.n_bonds):
        a, b = int(top.bonds[bi, 0]), int(top.bonds[bi, 1])
        if in_sel[a] != in_sel[b]:
            raise FFError(
                f"selection is not bond-complete: bond {a}-{b} crosses its boundary"
            )
        if not in_sel[a]:
            continue
        o = int(orders[bi]) if orders is not None else 1
        if o == 0:
            o = 1  # unspecified counts as single
        if o == 4:
            raise FFError(
                "aromatic bond orders in input: GAFF typing needs a Kekule structure"
            )
        bonds.append((local[a], local[b], o))
    types = gaff_types(z, bonds, ff)
    col = top.ensure_type_name()
    col[idx] = top.type_pool.intern_all(types)
    return types


def _main():  # regeneration CLI
    import sys

    def_path, out_path = sys.argv[1], sys.argv[2]
    rules, wildatoms = parse_def(open(def_path).read())
    with open(out_path, "w") as fh:
        json.dump({"rules": rules, "wildatoms": wildatoms}, fh)
    print(f"wrote {len(rules)} rules to {out_path}")


if __name__ == "__main__":
    _main()
