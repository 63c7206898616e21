"""Frame-sharded multi-chip execution on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molar_tpu.ops import measure
from molar_tpu.parallel import (
    frame_mesh,
    shard_window,
    sharded_window_fn,
)
from molar_tpu.parallel.mesh import pad_to_multiple


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return frame_mesh()


def test_sharded_fit_rmsd_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    b, n = 16, 64
    frames = rng.uniform(0, 5, (b, n, 3)).astype(np.float32)
    boxes = np.repeat(np.diag([5.0] * 3).astype(np.float32)[None], b, 0)
    invs = np.repeat(np.diag([0.2] * 3).astype(np.float32)[None], b, 0)
    times = np.arange(b, dtype=np.float32)
    ref = jnp.asarray(frames[0])
    masses = jnp.asarray(rng.uniform(1, 16, n).astype(np.float32))

    def window_fn(coords, boxes, invs, times):
        rmsd, _, _ = measure.fit_rmsd(coords, ref, masses)
        return jnp.mean(rmsd), rmsd

    fn = sharded_window_fn(window_fn, mesh)
    mean_s, rmsd_s = fn(*shard_window(mesh, frames, boxes, invs, times))
    mean_1, rmsd_1 = jax.jit(window_fn)(frames, boxes, invs, times)
    np.testing.assert_allclose(np.asarray(rmsd_s), np.asarray(rmsd_1), atol=1e-6)
    assert abs(float(mean_s) - float(mean_1)) < 1e-6
    # per-frame output really is frame-sharded
    assert len(rmsd_s.sharding.device_set) == len(mesh.devices)


def test_pad_to_multiple():
    a = np.arange(10 * 3).reshape(10, 3).astype(np.float32)
    (a2,), valid = pad_to_multiple((a,), None, 8)
    assert a2.shape[0] == 16
    assert valid.sum() == 10
    np.testing.assert_array_equal(a2[10:], np.repeat(a[-1:], 6, axis=0))
    (a3,), valid3 = pad_to_multiple((a[:8],), None, 8)
    assert a3.shape[0] == 8 and valid3.all()


def test_frame_atom_mesh_com_gyration(mesh):
    """2-D (frames x atoms) sharding: psum over the atom axis (SURVEY §2.7
    'multi-chip' row; for frames too large for one chip's HBM)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from molar_tpu.parallel import com_gyration_sharded, frame_atom_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    m2 = frame_atom_mesh(4, 2)
    fn = com_gyration_sharded(m2)
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 5, (8, 64, 3)).astype(np.float32)
    masses = rng.uniform(1, 16, 64).astype(np.float32)
    cj = jax.device_put(coords, NamedSharding(m2, P("frames", "atoms")))
    mj = jax.device_put(masses, NamedSharding(m2, P("atoms")))
    com, gyr = jax.block_until_ready(fn(cj, mj))
    want_com = (coords * masses[None, :, None]).sum(1) / masses.sum()
    d = coords - want_com[:, None, :]
    want_g = np.sqrt(((d * d).sum(-1) * masses).sum(1) / masses.sum())
    np.testing.assert_allclose(np.asarray(com), want_com, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gyr), want_g, atol=1e-5)
    assert len(com.sharding.device_set) == 8
