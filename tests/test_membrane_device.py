"""Device (jitted, window-batched) membrane pipeline vs the host pipeline.

The device path computes in f32 (the reference's Float build) while the host
path is numpy f64, so parity is tolerance-based, not bitwise: per-frame
per-lipid quantities agree to ~1e-3 relative (curvatures are second
derivatives of an LSQ fit — the loosest), areas/orders/normals tighter.
"""

import numpy as np
import pytest

from molar_tpu import PeriodicBox, System
from molar_tpu.core.atom import Atom
from molar_tpu.core.state import State
from molar_tpu.core.topology import Topology
from molar_tpu.membrane import Membrane
from molar_tpu.membrane.device import MembraneDevice


def make_bilayer(nx=5, ny=5, bend=0.15, seed=0, tilt=0.0):
    # Head planes 3.0 nm apart (> the 2.0 nm patch cutoff): patches stay
    # in-leaflet. A closer spacing puts opposite-leaflet heads inside the
    # cutoff and the |f|>0.5 fit sanity check correctly invalidates every
    # lipid (empty stats) — the original round-3 workload geometry had
    # exactly that bug.
    spacing, z_mid = 0.8, 3.0
    atoms, coords = [], []
    rid = 0
    for leaflet, zdir in ((0, 1.0), (1, -1.0)):
        for i in range(nx):
            for j in range(ny):
                rid += 1
                x, y = i * spacing, j * spacing
                # gentle curvature so mean/gaussian aren't trivially zero
                zb = bend * np.sin(2 * np.pi * x / (nx * spacing))
                for k, nm in enumerate(["P", "G", "C1", "C2", "C3", "C4"]):
                    atoms.append(Atom(name=nm, resname="LIP", resid=rid,
                                      atomic_number=6, mass=12.0))
                    coords.append([x, y, z_mid + zb + zdir * (1.5 - 0.3 * k)])
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    box_mat = np.diag([nx * spacing, ny * spacing, 6.0]).astype(np.float32)
    if tilt:
        # b vector gains an x-component: min image across the y boundary
        # now needs the lattice-correction candidates, not just the
        # componentwise round (the device triclinic path's raison d'être)
        box_mat[0, 1] = tilt
    st = State(
        coords=np.asarray(coords, np.float32),
        box=PeriodicBox(box_mat),
    )
    return System(top, st)


TOML = """
sel = "all"
cutoff = 2.0
order_type = "scdcorr"
output_dir = "{out}"
groups = ["all"]
{extra}
[lipids.LIP]
whole = "resname LIP"
head = "name P"
mid = "name G"
tails = ["C1-C2-C3-C4"]
"""


def run_both(tmp_path, n_frames=4, toml_extra="", sigma=0.01, tilt=0.0):
    sys_h = make_bilayer(tilt=tilt)
    toml = TOML.format(out=str(tmp_path / "host"), extra=toml_extra)
    memb_h = Membrane(sys_h, toml)
    memb_h.add_ids_to_group("all", range(len(memb_h.lipids)))

    sys_d = make_bilayer(tilt=tilt)
    memb_d = Membrane(sys_d, TOML.format(out=str(tmp_path / "dev"), extra=toml_extra))
    memb_d.add_ids_to_group("all", range(len(memb_d.lipids)))
    dev = MembraneDevice(memb_d)

    rng = np.random.default_rng(3)
    base = sys_h.state.coords.copy()
    frames = [
        base + rng.normal(0, sigma, base.shape).astype(np.float32)
        for _ in range(n_frames)
    ]
    host_per_frame = []
    for c in frames:
        sys_h.state.coords = c.copy()
        memb_h.compute()
        host_per_frame.append(
            {
                "valid": np.array([l.valid for l in memb_h.lipids]),
                "area": np.array([l.area for l in memb_h.lipids]),
                "mean": np.array([l.mean_curv for l in memb_h.lipids]),
                "gauss": np.array([l.gaussian_curv for l in memb_h.lipids]),
                "nneib": np.array([len(l.neib_ids) for l in memb_h.lipids]),
                "neib": [sorted(l.neib_ids) for l in memb_h.lipids],
                "order": [np.array(l.order[0]) for l in memb_h.lipids],
            }
        )

    window = np.stack([c[dev.subset] for c in frames])
    outs = dev.compute_window(window.astype(np.float32))
    dev.accumulate(outs)
    return memb_h, memb_d, dev, host_per_frame, outs


def test_device_matches_host_per_lipid(tmp_path):
    memb_h, memb_d, dev, host, outs = run_both(tmp_path)
    for fr, h in enumerate(host):
        np.testing.assert_array_equal(outs["valid"][fr], h["valid"],
                                      err_msg=f"valid flags frame {fr}")
        v = h["valid"]
        np.testing.assert_allclose(outs["area"][fr][v], h["area"][v],
                                   rtol=2e-3, err_msg=f"areas frame {fr}")
        np.testing.assert_allclose(outs["mean_curv"][fr][v], h["mean"][v],
                                   rtol=0.05, atol=5e-4,
                                   err_msg=f"mean curvature frame {fr}")
        np.testing.assert_allclose(outs["gauss_curv"][fr][v], h["gauss"][v],
                                   rtol=0.05, atol=5e-4,
                                   err_msg=f"gaussian curvature frame {fr}")
        np.testing.assert_array_equal(outs["n_neighbors"][fr][v],
                                      h["nneib"][v])
        for i in np.nonzero(v)[0]:
            ids = outs["nb_ids"][fr][i][outs["nb_mask"][fr][i]]
            assert sorted(ids) == h["neib"][i]


def test_device_matches_host_order(tmp_path):
    memb_h, memb_d, dev, host, outs = run_both(tmp_path)
    sp_l = dev._sp_lipids["LIP"]
    for fr, h in enumerate(host):
        dev_order = outs["order"]["LIP"][0][fr]  # (L, n-2)
        for r, lid in enumerate(sp_l):
            if h["valid"][lid]:
                np.testing.assert_allclose(
                    dev_order[r], h["order"][lid], rtol=1e-3, atol=1e-4,
                    err_msg=f"order frame {fr} lipid {lid}")


def test_device_group_stats_match(tmp_path):
    memb_h, memb_d, dev, host, outs = run_both(tmp_path)
    for name, gh in memb_h.groups.items():
        gd = memb_d.groups[name]
        for sp in gh.species_names:
            sth, std_ = gh.per_species[sp], gd.per_species[sp]
            for key in ("count", "area", "tilt", "mean_curv", "gauss_curv",
                        "n_neighbors"):
                np.testing.assert_allclose(
                    std_[key].mean, sth[key].mean, rtol=0.05, atol=2e-3,
                    err_msg=f"group stat {key}")
            for s, acc in sth["neib_fractions"].items():
                np.testing.assert_allclose(
                    std_["neib_fractions"][s].mean, acc.mean, atol=1e-6)
            assert (std_["order"] is None) == (sth["order"] is None)
            if sth["order"] is not None:
                for a, b in zip(std_["order"], sth["order"]):
                    np.testing.assert_allclose(a.mean, b.mean,
                                               rtol=1e-3, atol=1e-4)


def test_device_curvature_smoothing(tmp_path):
    memb_h, memb_d, dev, host, outs = run_both(
        tmp_path, toml_extra="n_shells_smoothing = 1")
    for fr, h in enumerate(host):
        v = h["valid"]
        np.testing.assert_allclose(outs["mean_curv"][fr][v], h["mean"][v],
                                   rtol=0.05, atol=5e-4)


def test_device_matches_host_two_smooth_passes(tmp_path):
    """max_smooth_iter=2: pass-2 fits consume pass-1 markers — invalidated
    lipids' markers must FREEZE (host `continue`s before the update), or
    their garbage fit offset teleports them into valid neighbors' pass-2
    patches (round-4 self-review finding)."""
    memb_h, memb_d, dev, host, outs = run_both(
        tmp_path, toml_extra="max_smooth_iter = 2")
    for fr, h in enumerate(host):
        np.testing.assert_array_equal(outs["valid"][fr], h["valid"],
                                      err_msg=f"valid flags frame {fr}")
        v = h["valid"]
        np.testing.assert_allclose(outs["area"][fr][v], h["area"][v],
                                   rtol=2e-3, err_msg=f"areas frame {fr}")
        np.testing.assert_allclose(outs["mean_curv"][fr][v], h["mean"][v],
                                   rtol=0.05, atol=5e-4)


def test_device_small_membrane_patch_cap_clamps(tmp_path):
    """A tiny membrane (L < the 8-multiple cap floor) must build and run:
    lax.top_k needs k <= L (round-4 self-review finding)."""
    sys_h = make_bilayer(nx=2, ny=2)
    memb = Membrane(sys_h, TOML.format(out=str(tmp_path), extra=""))
    memb.add_ids_to_group("all", range(len(memb.lipids)))
    dev = MembraneDevice(memb)
    assert dev.patch_cap <= dev.n_lipids == 8
    window = np.stack([sys_h.state.coords[dev.subset]])
    outs = dev.compute_window(window.astype(np.float32))
    assert outs["valid"].shape == (1, 8)


def test_device_matches_host_triclinic(tmp_path):
    """Triclinic build box: the device pipeline compiles the fractional-
    round + 26-candidate min-image path; parity vs the host pipeline
    (box.shortest_vector) to the same tolerances as the orthorhombic
    cases. The 0.9 nm b-vector tilt vs a 2.0 nm cutoff makes the
    cross-boundary patch adjacency genuinely correction-dependent."""
    memb_h, memb_d, dev, host, outs = run_both(tmp_path, tilt=0.9)
    assert dev._triclinic
    for fr, h in enumerate(host):
        np.testing.assert_array_equal(outs["valid"][fr], h["valid"],
                                      err_msg=f"valid flags frame {fr}")
        v = h["valid"]
        np.testing.assert_allclose(outs["area"][fr][v], h["area"][v],
                                   rtol=2e-3, err_msg=f"areas frame {fr}")
        np.testing.assert_allclose(outs["mean_curv"][fr][v], h["mean"][v],
                                   rtol=0.05, atol=5e-4)
        np.testing.assert_array_equal(outs["n_neighbors"][fr][v],
                                      h["nneib"][v])
        for i in np.nonzero(v)[0]:
            ids = outs["nb_ids"][fr][i][outs["nb_mask"][fr][i]]
            assert sorted(ids) == h["neib"][i], f"frame {fr} lipid {i}"


def test_device_triclinic_per_frame_boxes(tmp_path):
    """NPT analogue: per-frame triclinic boxes (slightly rescaled each
    frame) flow through compute_window(boxes=) and match the host run
    with the same per-frame boxes."""
    from molar_tpu.membrane import Membrane as M

    sys_h = make_bilayer(tilt=0.9)
    memb_h = M(sys_h, TOML.format(out=str(tmp_path / "h"), extra=""))
    memb_h.add_ids_to_group("all", range(len(memb_h.lipids)))
    sys_d = make_bilayer(tilt=0.9)
    memb_d = M(sys_d, TOML.format(out=str(tmp_path / "d"), extra=""))
    memb_d.add_ids_to_group("all", range(len(memb_d.lipids)))
    dev = MembraneDevice(memb_d)

    rng = np.random.default_rng(7)
    base = sys_h.state.coords.copy()
    base_box = np.asarray(sys_h.state.box.matrix, np.float64)
    frames, boxes = [], []
    for k in range(3):
        s = 1.0 + 0.01 * k
        frames.append(
            (base * s + rng.normal(0, 0.01, base.shape)).astype(np.float32)
        )
        boxes.append(base_box * s)

    host = []
    for c, b in zip(frames, boxes):
        sys_h.state.coords = c.copy()
        sys_h.state.box = PeriodicBox(b.astype(np.float32))
        memb_h.compute()
        host.append(
            {
                "valid": np.array([l.valid for l in memb_h.lipids]),
                "area": np.array([l.area for l in memb_h.lipids]),
            }
        )

    window = np.stack([c[dev.subset] for c in frames])
    outs = dev.compute_window(window, boxes=np.stack(boxes))
    for fr, h in enumerate(host):
        np.testing.assert_array_equal(outs["valid"][fr], h["valid"])
        v = h["valid"]
        np.testing.assert_allclose(outs["area"][fr][v], h["area"][v],
                                   rtol=2e-3)


def test_device_rejects_triclinic_frame_box(tmp_path):
    sys_h = make_bilayer()
    memb = Membrane(sys_h, TOML.format(out=str(tmp_path), extra=""))
    memb.add_ids_to_group("all", range(len(memb.lipids)))
    dev = MembraneDevice(memb)
    window = np.stack([sys_h.state.coords[dev.subset]]).astype(np.float32)
    tri = np.asarray(sys_h.state.box.matrix).copy()
    tri[0, 2] = 1.0  # tilt the cell
    with pytest.raises(Exception, match="orthorhombic"):
        dev.compute_window(window, boxes=tri[None])


def test_device_rejects_unsupported(tmp_path):
    sys_h = make_bilayer()
    memb = Membrane(
        sys_h, TOML.format(out=str(tmp_path), extra="n_shells_patch = 1")
    )
    with pytest.raises(Exception):
        MembraneDevice(memb)
