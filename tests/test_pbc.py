"""PeriodicBox semantics tests (mirrors reference periodic_box.rs test intent)."""

import numpy as np
import pytest

from molar_tpu.core.pbc import (
    PBC_FULL,
    PBC_NONE,
    PbcDims,
    PeriodicBox,
    PeriodicBoxError,
)


def brute_force_min_image(vecs, matrix, rng=4):
    """Exhaustive lattice enumeration ground truth (vectorized over points)."""
    r = np.arange(-rng, rng + 1)
    ijk = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    shifts = ijk @ matrix.T  # (K, 3) lab-frame lattice shifts
    cands = vecs[:, None, :] + shifts[None, :, :]  # (N, K, 3)
    n2 = np.sum(cands * cands, axis=-1)
    best = np.argmin(n2, axis=-1)
    return np.take_along_axis(cands, best[:, None, None], axis=1)[:, 0, :]


def test_orthorhombic_min_image():
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    v = box.shortest_vector([8.0, 8.0, 8.0])
    np.testing.assert_allclose(v, [-2.0, -2.0, -2.0], atol=1e-6)


def test_no_pbc_passthrough():
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    v = box.shortest_vector([8.0, 8.0, 8.0], PBC_NONE)
    np.testing.assert_allclose(v, [8.0, 8.0, 8.0], atol=1e-6)


def test_partial_pbc_dims():
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    v = box.shortest_vector([8.0, 8.0, 8.0], PbcDims(True, False, True))
    np.testing.assert_allclose(v, [-2.0, 8.0, -2.0], atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_triclinic_min_image_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    box = PeriodicBox.from_vectors_angles(5.0, 6.0, 7.0, 75.0, 80.0, 85.0)
    pts = rng.uniform(-15, 15, size=(200, 3)).astype(np.float32)
    got = box.shortest_vector(pts)
    want = brute_force_min_image(pts.astype(np.float64), box.matrix.astype(np.float64))
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), np.linalg.norm(want, axis=1), atol=1e-4
    )


def test_from_vectors_angles_rejects():
    with pytest.raises(PeriodicBoxError):
        PeriodicBox.from_vectors_angles(10.0, 0.2, 15.0, 90.0, 9.0, 90.0)
    with pytest.raises(PeriodicBoxError):
        PeriodicBox.from_vectors_angles(0.0, 1.0, 1.0, 90.0, 90.0, 90.0)


def test_vectors_angles_roundtrip():
    box = PeriodicBox.from_vectors_angles(5.0, 6.0, 7.0, 75.0, 80.0, 85.0)
    v, a = box.to_vectors_angles()
    np.testing.assert_allclose(v, [5.0, 6.0, 7.0], atol=1e-5)
    np.testing.assert_allclose(a, [75.0, 80.0, 85.0], atol=1e-3)


def test_wrap_conventional():
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    w = box.wrap_conventional([[-3.0, 12.0, 5.0]])
    np.testing.assert_allclose(w, [[7.0, 2.0, 5.0]], atol=1e-5)


def test_wrap_point_reference_quirk():
    # Negative fractional part f maps through 1.0 - f (periodic_box.rs:409-434),
    # reproduced verbatim even though it can land outside the cell.
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    w = box.wrap_point([-3.0, 12.0, 5.0])
    np.testing.assert_allclose(w, [13.0, 2.0, 5.0], atol=1e-5)


def test_closest_image():
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    img = box.closest_image([9.5, 0.5, 0.0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(img, [-0.5, 0.5, 0.0], atol=1e-6)


def test_pbc_dims_from_str():
    assert PbcDims.from_str("yyn") == PbcDims(True, True, False)
    assert PbcDims.from_str("101") == PbcDims(True, False, True)
    with pytest.raises(PeriodicBoxError):
        PbcDims.from_str("abc")


def test_distance():
    box = PeriodicBox(np.diag([10.0, 10.0, 10.0]))
    d = box.distance([0.5, 0.0, 0.0], [9.5, 0.0, 0.0], PBC_FULL)
    assert abs(d - 1.0) < 1e-6
    d = box.distance([0.5, 0.0, 0.0], [9.5, 0.0, 0.0], PBC_NONE)
    assert abs(d - 9.0) < 1e-6


def test_jax_shortest_vector_matches_host():
    import jax.numpy as jnp

    from molar_tpu.core.pbc import shortest_vector

    box = PeriodicBox.from_vectors_angles(5.0, 6.0, 7.0, 75.0, 80.0, 85.0)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, size=(50, 3)).astype(np.float32)
    host = box.shortest_vector(pts)
    dev = shortest_vector(
        jnp.asarray(pts),
        jnp.asarray(box.matrix),
        jnp.asarray(box.inv),
        jnp.asarray(box.padded_corrections()),
    )
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-5)
