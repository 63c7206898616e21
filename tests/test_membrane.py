"""Membrane analysis pipeline test on a synthetic flat bilayer."""

import numpy as np
import pytest

from molar_tpu import PeriodicBox, System
from molar_tpu.core import Atom, State, Topology
from molar_tpu.membrane import Membrane

TOML = """
sel = "all"
cutoff = 2.0
max_smooth_iter = 1
order_type = "scdcorr"
output_dir = "{out}"
groups = ["upper", "lower"]

[lipids.LIP]
whole = "resname LIP"
head = "name P"
mid = "name G"
tails = ["C1-C2-C3-C4"]
"""


def make_bilayer(nx=6, ny=6, spacing=0.8, z_mid=3.0):
    """Flat bilayer of 6-bead lipids (P-G-C1..C4) on a square lattice."""
    atoms = []
    coords = []
    rid = 0
    rng = np.random.default_rng(0)
    for leaf, sign in (("up", 1.0), ("dn", -1.0)):
        for i in range(nx):
            for j in range(ny):
                rid += 1
                x = (i + 0.5) * spacing + rng.normal(0, 0.01)
                y = (j + 0.5) * spacing + rng.normal(0, 0.01)
                beads = [
                    ("P", 1.6),
                    ("G", 1.2),
                    ("C1", 0.9),
                    ("C2", 0.6),
                    ("C3", 0.3),
                    ("C4", 0.05),
                ]
                for name, h in beads:
                    atoms.append(
                        Atom(name=name, resname="LIP", resid=rid, mass=14.0)
                    )
                    coords.append([x, y, z_mid + sign * h])
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    side = nx * spacing
    st = State(
        coords=np.asarray(coords, np.float32),
        box=PeriodicBox(np.diag([side, side, 8.0])),
    )
    return System(top, st)


def test_flat_bilayer_pipeline(tmp_path):
    sys = make_bilayer()
    memb = Membrane(sys, TOML.format(out=tmp_path))
    n_per_leaf = 36
    assert len(memb.lipids) == 2 * n_per_leaf

    # split leaflets by head z
    for lip in memb.lipids:
        lip.update_markers(sys)
    upper = [l.id for l in memb.lipids if l.head_marker[2] > 3.0]
    lower = [l.id for l in memb.lipids if l.head_marker[2] <= 3.0]
    assert len(upper) == len(lower) == n_per_leaf
    memb.add_ids_to_group("upper", upper)
    memb.add_ids_to_group("lower", lower)

    memb.compute()

    valid = [l for l in memb.lipids if l.valid]
    assert len(valid) > n_per_leaf  # most lipids valid

    for lip in valid:
        # Normals on a flat bilayer are +-z.
        assert abs(abs(lip.normal[2]) / np.linalg.norm(lip.normal)) > 0.95, lip.normal
        # Curvature ~ 0.
        assert abs(lip.mean_curv) < 0.2
        assert abs(lip.gaussian_curv) < 0.2
        # Area ~ lattice cell (0.64 nm^2).
        assert 0.3 < lip.area < 1.2
        # Order computed for the single tail: perfect straight tail -> |order| bounded
        assert lip.order[0].shape == (2,)

    memb.finalize()
    assert (tmp_path / "stats_upper.dat").exists()
    assert (tmp_path / "order_upper_LIP.dat").exists()
    text = (tmp_path / "stats_upper.dat").read_text()
    assert "LIP" in text


def test_group_api(tmp_path):
    sys = make_bilayer(4, 4)
    memb = Membrane(sys, TOML.format(out=tmp_path))
    with pytest.raises(Exception):
        memb.add_ids_to_group("nope", [0])
    memb.add_ids_to_group("upper", [0, 1])
    assert memb.groups["upper"].lipid_ids == [0, 1]
    memb.reset_groups()
    assert memb.groups["upper"].lipid_ids == []


def test_histogram1d(tmp_path):
    """Fixed-range histogram (reference stats.rs:14-54)."""
    from molar_tpu.membrane.vmd_visual import Histogram1D

    h = Histogram1D(0.0, 1.0, 10)
    h.add([0.05, 0.15, 0.15, 0.999, -0.1, 1.5])  # out-of-range dropped
    assert h.bins.tolist() == [1, 2, 0, 0, 0, 0, 0, 0, 0, 1]
    assert h.centers()[0] == pytest.approx(0.05)
    h.normalize_density()
    assert h.bins.sum() * 0.1 == pytest.approx(1.0)
    p = tmp_path / "h.dat"
    h.save(str(p))
    assert len(p.read_text().splitlines()) == 10


def test_running_stats_welford():
    from molar_tpu.membrane.membrane import _RunningStats

    rng = np.random.default_rng(0)
    xs = rng.normal(3.0, 2.0, 500)
    st = _RunningStats()
    for x in xs:
        st.add(x)
    assert st.mean == pytest.approx(xs.mean(), rel=1e-9)
    assert st.std == pytest.approx(xs.std(), rel=1e-6)  # population std


def test_vmd_visualization_export(tmp_path):
    """TCL export of markers/normals/Voronoi (reference vmd_visual.rs)."""
    sys = make_bilayer()
    toml = TOML.format(out=tmp_path)
    from molar_tpu.membrane import Membrane

    memb = Membrane(sys, toml)
    n = len(memb.lipids)
    memb.add_ids_to_group("upper", [i for i in range(n // 2)])
    memb.add_ids_to_group("lower", [i for i in range(n // 2, n)])
    memb.compute()
    p = tmp_path / "vis.tcl"
    memb.write_vmd_visualization(str(p))
    txt = p.read_text()
    assert "draw sphere" in txt and "draw cylinder" in txt
    assert txt.count("draw sphere") >= n


def test_merge_stats_matches_single_run(tmp_path):
    """Frame-sharded execution (BASELINE membrane multi-chip config): two
    Membranes each consuming half the frames, merged, must equal one
    Membrane consuming all frames (Welford merge is exact)."""
    rng = np.random.default_rng(7)
    base = make_bilayer()
    frames = [
        base.state.coords + rng.normal(0, 0.01, base.state.coords.shape).astype(
            np.float32
        )
        for _ in range(6)
    ]

    def run(frame_list):
        sys = make_bilayer()
        memb = Membrane(sys, TOML.format(out=tmp_path))
        memb.add_ids_to_group("upper", range(len(memb.lipids)))
        for c in frame_list:
            sys.state.coords = c
            memb.compute()
        return memb

    whole = run(frames)
    shard_a = run(frames[:3])
    shard_b = run(frames[3:])
    shard_a.merge_stats_from(shard_b)

    for name, gr in whole.groups.items():
        mgr = shard_a.groups[name]
        for sp in gr.species_names:
            st, mst = gr.per_species[sp], mgr.per_species[sp]
            for key in ("count", "area", "tilt", "mean_curv", "gauss_curv",
                        "n_neighbors"):
                assert mst[key].n == st[key].n
                np.testing.assert_allclose(
                    mst[key].mean, st[key].mean, rtol=1e-10, atol=1e-12
                )
                np.testing.assert_allclose(
                    mst[key].std, st[key].std, rtol=1e-8, atol=1e-10
                )
            if st["order"] is not None:
                for k, acc in enumerate(st["order"]):
                    np.testing.assert_allclose(
                        mst["order"][k].mean, acc.mean, rtol=1e-10, atol=1e-12
                    )


def test_lipid_tail_order_batch_matches_scalar():
    """lipid_tail_order_batch == per-lipid lipid_tail_order for every order
    type, incl. a double-bonded tail (bond order 2 branch)."""
    from molar_tpu.ops import measure_host

    rng = np.random.default_rng(11)
    L, n = 7, 8
    coords = np.cumsum(rng.normal(0.1, 0.05, (L, n, 3)), axis=1)
    normals = measure_host_unit(rng.normal(size=(L, 3)))
    for bond_orders in (
        np.ones(n - 1, dtype=int),
        np.array([1, 1, 2, 1, 1, 2, 1]),
    ):
        for order_type in ("sz", "scd", "scdcorr"):
            batch = measure_host.lipid_tail_order_batch(
                order_type, coords, normals, bond_orders
            )
            for l in range(L):
                single = measure_host.lipid_tail_order(
                    order_type, coords[l], normals[l].reshape(1, 3), bond_orders
                )
                np.testing.assert_allclose(batch[l], single, atol=1e-12)
    # global normal broadcast form
    g = np.array([[0.0, 0.0, 1.0]])
    batch = measure_host.lipid_tail_order_batch(
        "scdcorr", coords, g, np.ones(n - 1, dtype=int)
    )
    for l in range(L):
        single = measure_host.lipid_tail_order(
            "scdcorr", coords[l], g, np.ones(n - 1, dtype=int)
        )
        np.testing.assert_allclose(batch[l], single, atol=1e-12)


def measure_host_unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)
