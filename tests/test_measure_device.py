"""Device measure ops vs host ground truth (1e-5 fidelity contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molar_tpu.core.pbc import PBC_FULL, PeriodicBox
from molar_tpu.ops import measure, measure_host


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n, b = 120, 5
    ref = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    masses = rng.uniform(1, 16, n).astype(np.float32)
    frames = np.empty((b, n, 3), np.float32)
    rots = []
    for i in range(b):
        # random rigid motion + small noise
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0, 2 * np.pi)
        k = np.array(
            [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
        )
        r = np.eye(3) + np.sin(ang) * k + (1 - np.cos(ang)) * (k @ k)
        shift = rng.uniform(-3, 3, 3)
        frames[i] = (ref @ r.T + shift + rng.normal(0, 0.01, (n, 3))).astype(np.float32)
        rots.append(r)
    box = PeriodicBox.from_vectors_angles(6.0, 7.0, 8.0, 80.0, 85.0, 75.0)
    return ref, masses, frames, box


def test_center_matches_host(data):
    ref, masses, frames, box = data
    got = np.asarray(measure.center(jnp.asarray(frames), jnp.asarray(masses)))
    for i in range(frames.shape[0]):
        want = measure_host.center(frames[i], masses)
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_center_pbc_matches_host(data):
    ref, masses, frames, box = data
    b = frames.shape[0]
    boxes = jnp.asarray(np.repeat(box.matrix[None], b, axis=0))
    invs = jnp.asarray(np.repeat(box.inv[None], b, axis=0))
    corr = jnp.asarray(np.repeat(box.padded_corrections()[None], b, axis=0))
    got = np.asarray(
        measure.center_pbc(jnp.asarray(frames), jnp.asarray(masses), boxes, invs, corr)
    )
    for i in range(b):
        want = measure_host.center_pbc(frames[i], masses, box, PBC_FULL)
        np.testing.assert_allclose(got[i], want, atol=2e-5)


def test_gyration_matches_host(data):
    ref, masses, frames, box = data
    got = np.asarray(measure.gyration(jnp.asarray(frames), jnp.asarray(masses)))
    for i in range(frames.shape[0]):
        want = measure_host.gyration(frames[i], masses)
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_inertia_matches_host(data):
    ref, masses, frames, box = data
    vals, axes, com = measure.inertia(jnp.asarray(frames), jnp.asarray(masses))
    for i in range(frames.shape[0]):
        wvals, waxes, wcom = measure_host.inertia(frames[i], masses)
        np.testing.assert_allclose(np.asarray(vals)[i], wvals, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(com)[i], wcom, atol=1e-5)
        # axes match up to per-column sign
        ga = np.asarray(axes)[i]
        for col in range(3):
            dot = abs(ga[:, col] @ waxes[:, col])
            assert dot > 0.999, (col, ga, waxes)


def test_fit_rmsd_matches_host(data):
    ref, masses, frames, box = data
    got_rmsd, r, t = jax.jit(measure.fit_rmsd)(
        jnp.asarray(frames), jnp.asarray(ref), jnp.asarray(masses)
    )
    for i in range(frames.shape[0]):
        hr, ht = measure_host.fit_transform(frames[i], ref, masses)
        fitted = measure_host.apply_transform(frames[i], hr, ht)
        want = measure_host.rmsd_mw(fitted, ref, masses)
        assert abs(float(got_rmsd[i]) - want) < 1e-5
        np.testing.assert_allclose(np.asarray(r)[i], hr, atol=1e-4)


def test_fit_recovers_rigid_motion(data):
    ref, masses, frames, box = data
    got_rmsd, _, _ = measure.fit_rmsd(
        jnp.asarray(frames), jnp.asarray(ref), jnp.asarray(masses)
    )
    # noise sigma 0.01 per axis -> rmsd ~ 0.017; must be well below 0.05
    assert np.all(np.asarray(got_rmsd) < 0.05)
    assert np.all(np.asarray(got_rmsd) > 1e-4)


def test_reflection_fix():
    # A mirrored structure must not be matched by an improper rotation.
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    m = np.ones(50, np.float32)
    mirrored = a * np.array([-1, 1, 1], np.float32)
    r = np.asarray(measure.kabsch(jnp.asarray(a), jnp.asarray(mirrored), jnp.asarray(m)))
    assert np.linalg.det(r) > 0.99


def test_min_image_batched_matches_host(data):
    ref, masses, frames, box = data
    vecs = (frames[0] - frames[1]).astype(np.float32)
    got = np.asarray(
        measure.min_image(
            jnp.asarray(vecs),
            jnp.asarray(box.matrix),
            jnp.asarray(box.inv),
            jnp.asarray(box.padded_corrections()),
        )
    )
    want = box.shortest_vector(vecs)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), np.linalg.norm(want, axis=1), atol=1e-5
    )


def test_dense_segment_layout_nonuniform():
    # Sorted contiguous runs of ragged lengths (1..7): the layout must pad
    # to the longest run with zero weight and reproduce exact numpy
    # per-segment sums.
    rng = np.random.default_rng(11)
    counts = rng.integers(1, 8, size=37)
    seg = np.repeat(np.arange(len(counts)), counts).astype(np.int32)
    n = seg.shape[0]
    weights = rng.uniform(1, 16, n).astype(np.float32)
    idx, w, got_counts = measure.contiguous_segments_dense(seg, weights)
    np.testing.assert_array_equal(got_counts, counts)
    assert w.shape == (int(counts.max()), len(counts))

    vals = rng.normal(size=(4, n)).astype(np.float32)
    got = np.asarray(
        measure.dense_segment_sum(jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(w))
    )
    want = np.stack(
        [
            np.add.reduceat(vals[b] * weights, np.r_[0, np.cumsum(counts)[:-1]])
            for b in range(4)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dense_segment_com_gyration_matches_host():
    rng = np.random.default_rng(12)
    counts = rng.integers(2, 9, size=25)
    seg = np.repeat(np.arange(len(counts)), counts).astype(np.int32)
    n = seg.shape[0]
    masses = rng.uniform(1, 16, n).astype(np.float32)
    coords = rng.uniform(0, 5, (3, n, 3)).astype(np.float32)

    idx, w, _ = measure.contiguous_segments_dense(seg, masses)
    com, gyr = measure.dense_segment_com_gyration(
        jnp.asarray(coords), jnp.asarray(idx), jnp.asarray(w)
    )
    com, gyr = np.asarray(com), np.asarray(gyr)
    assert com.shape == (3, len(counts), 3) and gyr.shape == (3, len(counts))

    for b in range(coords.shape[0]):
        for s in range(len(counts)):
            rows = coords[b][seg == s]
            m = masses[seg == s]
            want_com = (rows * m[:, None]).sum(0) / m.sum()
            d = rows - want_com
            want_gyr = np.sqrt((m * (d * d).sum(1)).sum() / m.sum())
            np.testing.assert_allclose(com[b, s], want_com, atol=1e-5)
            np.testing.assert_allclose(gyr[b, s], want_gyr, atol=1e-5)
