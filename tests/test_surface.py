"""SAS/SES triangle meshes (reference powersasa meshes, sasa.rs:14-122)."""

import numpy as np
import pytest

from molar_tpu.ops.surface import (
    dedupe_mesh,
    marching_tetrahedra,
    mesh_area,
    mesh_volume,
    sas_mesh,
    ses_mesh,
    write_obj,
)

R, PROBE = 0.19, 0.14


def test_sas_sphere_area_and_volume():
    v, t = sas_mesh(np.array([[1.0, 1.0, 1.0]]), np.array([R]), probe=PROBE, spacing=0.02)
    r = R + PROBE
    assert mesh_area(v, t) == pytest.approx(4 * np.pi * r**2, rel=0.01)
    assert mesh_volume(v, t) == pytest.approx(4 / 3 * np.pi * r**3, rel=0.01)


def test_ses_sphere_is_vdw_sphere():
    # rolling the probe over a lone sphere gives back the vdW sphere
    v, t = ses_mesh(np.array([[0.0, 0.0, 0.0]]), np.array([R]), probe=PROBE, spacing=0.02)
    assert mesh_area(v, t) == pytest.approx(4 * np.pi * R**2, rel=0.05)


def test_two_distant_spheres_additive():
    c = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
    v, t = sas_mesh(c, np.array([R, R]), probe=PROBE, spacing=0.02)
    assert mesh_area(v, t) == pytest.approx(8 * np.pi * (R + PROBE) ** 2, rel=0.01)


def test_fused_spheres_less_than_additive():
    # overlapping spheres bury surface
    c = np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0]])
    v, t = sas_mesh(c, np.array([R, R]), probe=PROBE, spacing=0.02)
    assert mesh_area(v, t) < 0.8 * 8 * np.pi * (R + PROBE) ** 2
    # and the fused surface is one closed blob: volume below 2 spheres
    assert mesh_volume(v, t) < 2 * 4 / 3 * np.pi * (R + PROBE) ** 3


def test_dedupe_and_obj(tmp_path):
    v, t = sas_mesh(np.array([[0.0, 0.0, 0.0]]), np.array([R]), spacing=0.04)
    dv, dt = dedupe_mesh(v, t)
    assert dv.shape[0] < v.shape[0]
    assert mesh_area(dv, dt) == pytest.approx(mesh_area(v, t), rel=1e-9)
    p = tmp_path / "m.obj"
    write_obj(str(p), dv, dt)
    txt = p.read_text().splitlines()
    assert sum(1 for l in txt if l.startswith("v ")) == dv.shape[0]
    assert sum(1 for l in txt if l.startswith("f ")) == dt.shape[0]


def test_marching_tetrahedra_empty_cases():
    vals = np.ones((4, 4, 4))  # all outside
    v, t = marching_tetrahedra(vals, np.zeros(3), 0.1)
    assert v.shape == (0, 3) and t.shape == (0, 3)
    v, t = marching_tetrahedra(-vals, np.zeros(3), 0.1)  # all inside
    assert v.shape == (0, 3)


def test_sel_mesh_api(ref_data):
    from molar_tpu import System

    sys_ = System.from_file(str(ref_data / "protein.pdb"))
    sel = sys_("resid 545:550")
    v, t = sel.sas_mesh(spacing=0.1)
    assert v.shape[0] > 0 and t.shape[0] > 0
    assert mesh_area(v, t) > 0
