"""Prefix decode + fast trjconv path (io/trjconv.py, xtc_codec.cpp
xtc_decode_frame_prefix). Reference workload: the trjconv bench of
molar/benches/comparison_small.rs:44-57."""

import os

import numpy as np
import pytest

from molar_tpu import PeriodicBox, System
from molar_tpu.core.atom import Atom
from molar_tpu.core.state import State
from molar_tpu.core.topology import Topology
from molar_tpu.io.dcd import DcdHandler
from molar_tpu.io.trjconv import trjconv
from molar_tpu.io.xtc import XtcHandler

REF_XTC = "/root/reference/molar/tests/new.xtc"


def _small_system(n_atoms=600, box_side=4.0, seed=0):
    rng = np.random.default_rng(seed)
    atoms = []
    for i in range(n_atoms):
        atoms.append(Atom(name="CA" if i % 3 == 0 else "CB", resname="ALA",
                          resid=i // 3 + 1, atomic_number=6, mass=12.0))
    top = Topology.from_atoms(atoms)
    top.assign_resindex()
    st = State(coords=rng.uniform(0, box_side, (n_atoms, 3)).astype(np.float32),
               box=PeriodicBox(np.diag([box_side] * 3).astype(np.float32)))
    return System(top, st)


@pytest.fixture()
def xtc_file(tmp_path):
    system = _small_system()
    path = str(tmp_path / "t.xtc")
    rng = np.random.default_rng(1)
    w = XtcHandler(path, "w")
    c = system.state.coords.copy()
    for k in range(7):  # odd count: exercises trailing frames
        c = c + rng.normal(0, 0.02, c.shape).astype(np.float32)
        w.write_raw(c, system.state.box.matrix, step=k, time=float(k))
    w.close()
    return system, path


def test_prefix_decode_matches_full(xtc_file):
    _, path = xtc_file
    r = XtcHandler(path)
    for fr in (0, 3, r.n_frames - 1):
        full = r.read_frame(fr)
        for n_want in (1, 17, 300, r.n_atoms):
            pre, step, time, box9 = r.decode_prefix(fr, n_want)
            assert pre.shape == (n_want, 3)
            np.testing.assert_array_equal(
                np.asarray(full.coords[:n_want], np.float32), pre
            )
            assert step == full.step and time == full.time
            np.testing.assert_allclose(
                box9.reshape(3, 3).T, full.box.matrix, atol=1e-6
            )
    r.close()


@pytest.mark.skipif(not os.path.exists(REF_XTC), reason="reference data absent")
def test_prefix_decode_sticky_dialect_fixture():
    # The reference fixture is written by molly (sticky-run dialect) AND
    # contains real water runs — the run-group early-stop path.
    r = XtcHandler(REF_XTC)
    full = r.read_frame(0)
    pre, *_ = r.decode_prefix(0, 1000)
    assert r._sticky == 1
    np.testing.assert_array_equal(np.asarray(full.coords[:1000], np.float32), pre)
    r.close()


def test_prefix_decode_reuses_buffer(xtc_file):
    _, path = xtc_file
    r = XtcHandler(path)
    buf = np.empty((100 + XtcHandler.PREFIX_SLACK, 3), np.float32)
    a, *_ = r.decode_prefix(0, 100, buf)
    assert a.base is buf
    first = a.copy()
    b, *_ = r.decode_prefix(1, 100, buf)
    assert not np.array_equal(first, b)  # buffer was overwritten in place
    r.close()


def test_trjconv_matches_per_frame_write(xtc_file, tmp_path):
    system, path = xtc_file
    sel = system("name CA")
    fast, slow = str(tmp_path / "fast.dcd"), str(tmp_path / "slow.dcd")
    n = trjconv(path, fast, sel.indices)
    r = XtcHandler(path)
    assert n == r.n_frames
    w = DcdHandler(slow, "w")
    for k in range(r.n_frames):
        w.write(system.topology, r.read_frame(k), indices=sel.indices)
    w.close()
    r.close()
    a, b = DcdHandler(fast), DcdHandler(slow)
    assert a.n_frames == b.n_frames and a.n_atoms == b.n_atoms == len(sel)
    for k in range(a.n_frames):
        sa, sb = a.read_frame(k), b.read_frame(k)
        np.testing.assert_array_equal(sa.coords, sb.coords)
        # fast path writes exact cosines; write() roundtrips through angles
        np.testing.assert_allclose(sa.box.matrix, sb.box.matrix, atol=1e-5)
    a.close()
    b.close()


def test_trjconv_frame_range_and_noncontiguous(xtc_file, tmp_path):
    system, path = xtc_file
    idx = np.array([5, 2, 300, 17])  # unsorted, non-contiguous
    out = str(tmp_path / "o.dcd")
    n = trjconv(path, out, idx, first=1, last=6, step=2)
    assert n == 3
    r, d = XtcHandler(path), DcdHandler(out)
    for j, k in enumerate(range(1, 6, 2)):
        np.testing.assert_allclose(
            d.read_frame(j).coords, r.read_frame(k).coords[idx], atol=1e-6
        )
    r.close()
    d.close()


def test_trjconv_errors(xtc_file, tmp_path):
    _, path = xtc_file
    with pytest.raises(ValueError, match="empty selection"):
        trjconv(path, str(tmp_path / "x.dcd"), np.array([], np.int64))
    with pytest.raises(ValueError, match="out of range"):
        trjconv(path, str(tmp_path / "x.dcd"), np.array([600]))


def test_cli_trjconv(xtc_file, tmp_path):
    system, path = xtc_file
    gro = str(tmp_path / "s.gro")
    system.save(gro)
    out = str(tmp_path / "cli.dcd")
    from molar_tpu.cli import main

    rc = main(["trjconv", "-s", gro, "-f", path, "-o", out,
               "--select", "name CA"])
    assert rc == 0
    d = DcdHandler(out)
    assert d.n_atoms == len(system("name CA"))
    assert d.n_frames == 7
    d.close()
