"""Analysis task runners (reference analysis_task.rs:124-280 + pymolar
AnalysisTask): FrameSpec grammar, multi-trajectory concat, skip phase,
window pipeline, per-frame and windowed harnesses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molar_tpu.io.xtc import XtcHandler
from molar_tpu.tasks.trajectory import (
    AnalysisError,
    AnalysisTask,
    FrameSpec,
    TrajectoryReader,
    WindowAnalysisTask,
    WindowPipeline,
    run_with_overflow_retry,
)


def _write_traj(path, n_atoms, n_frames, t0=0.0, seed=0):
    rng = np.random.default_rng(seed)
    box = np.diag([4.0, 4.0, 4.0]).astype(np.float32)
    w = XtcHandler(str(path), "w")
    c = rng.uniform(0, 4, (n_atoms, 3)).astype(np.float32)
    for k in range(n_frames):
        w.write_raw(c + 0.001 * k, box, step=k, time=t0 + float(k))
    w.close()


@pytest.fixture()
def two_trajs(tmp_path):
    _write_traj(tmp_path / "a.xtc", 30, 7, t0=0.0)
    _write_traj(tmp_path / "b.xtc", 30, 5, t0=0.0)  # clock restarts
    return [str(tmp_path / "a.xtc"), str(tmp_path / "b.xtc")]


@pytest.fixture()
def structure(tmp_path):
    """Minimal 30-atom GRO structure matching the trajectories."""
    lines = ["test", "30"]
    for i in range(30):
        lines.append(f"{1:5d}{'SOL':<5}{'OW':>5}{i + 1:5d}{0.0:8.3f}{0.0:8.3f}{0.0:8.3f}")
    lines.append("   4.00000   4.00000   4.00000")
    path = tmp_path / "s.gro"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_framespec_grammar():
    assert FrameSpec.parse(None) == FrameSpec()
    assert FrameSpec.parse("7") == FrameSpec(frame=7)
    assert FrameSpec.parse("7fr") == FrameSpec(frame=7)
    assert FrameSpec.parse("2.5ps").time == pytest.approx(2.5)
    assert FrameSpec.parse("1ns").time == pytest.approx(1000.0)
    assert FrameSpec.parse("1us").time == pytest.approx(1e6)


def test_reader_concat_and_global_numbering(two_trajs):
    got = [(fr, st.time) for fr, st in TrajectoryReader(two_trajs).iter_states()]
    assert [f for f, _ in got] == list(range(12))  # global frame ids
    assert [t for _, t in got[:7]] == [float(k) for k in range(7)]
    assert [t for _, t in got[7:]] == [float(k) for k in range(5)]


def test_reader_skip_phase_crosses_files(two_trajs):
    # skip=3 from frame 0: 0,3,6 | 9 (=file b frame 2) — phase carries over
    frs = [fr for fr, _ in TrajectoryReader(two_trajs, skip=3).iter_states()]
    assert frs == [0, 3, 6, 9]


def test_reader_begin_end_window(two_trajs):
    r = TrajectoryReader(
        two_trajs, begin=FrameSpec.parse("2"), end=FrameSpec.parse("8")
    )
    assert [fr for fr, _ in r.iter_states()] == list(range(2, 9))


def test_window_pipeline_matches_direct_reads(two_trajs):
    @jax.jit
    def window_fn(coords, boxes, invs, times):
        return jnp.sum(coords, axis=(1, 2)), times

    reader = TrajectoryReader(two_trajs)
    sums, times, ids = [], [], []
    for fids, (s, t) in WindowPipeline(reader, 4, window_fn).run():
        sums.append(np.asarray(s))
        times.append(np.asarray(t))
        ids.append(fids)
    ids = np.concatenate(ids)
    assert ids.tolist() == list(range(12))
    direct = [st.coords.sum() for _, st in TrajectoryReader(two_trajs).iter_states()]
    np.testing.assert_allclose(np.concatenate(sums), direct, rtol=1e-6)


def test_window_pipeline_quantized_matches_plain(two_trajs):
    from molar_tpu.tasks.trajectory import decode_window_coords

    @jax.jit
    def window_fn(coords, boxes, invs, times):
        return decode_window_coords(coords)

    def collect(**kw):
        out = []
        forms = set()
        for _, c in WindowPipeline(
            TrajectoryReader(two_trajs), 4, window_fn, **kw
        ).run():
            out.append(np.asarray(c))
        return np.concatenate(out)

    # the conversion contract is BIT-exact per element (reductions may
    # reassociate between differently-structured compiled programs)
    plain = collect()
    np.testing.assert_array_equal(collect(quantized=True), plain)
    np.testing.assert_array_equal(collect(quantized="delta"), plain)


def test_window_pipeline_put_chunks_matches_plain(two_trajs):
    """put_chunks ships a window's bulk coords as several separate
    transfers; the in-graph reassembly must be bit-identical to the
    single-put decode in every transport form, including tail windows
    shorter than the chunk count (chunk count clamps to the frame axis)."""
    from molar_tpu.tasks.trajectory import decode_window_coords

    @jax.jit
    def window_fn(coords, boxes, invs, times):
        return decode_window_coords(coords)

    def collect(**kw):
        out = []
        for _, c in WindowPipeline(
            TrajectoryReader(two_trajs), 5, window_fn, **kw
        ).run():
            out.append(np.asarray(c))
        return np.concatenate(out)

    plain = collect()
    for quant in (False, True, "delta"):
        np.testing.assert_array_equal(
            collect(quantized=quant, put_chunks=3), plain
        )


def test_auto_window_sizing(tmp_path):
    from molar_tpu.io.xtc import XtcHandler
    from molar_tpu.tasks.trajectory import auto_window

    p = str(tmp_path / "aw.xtc")
    w = XtcHandler(p, "w")
    c = np.random.default_rng(0).uniform(0, 4, (100, 3)).astype(np.float32)
    box = np.diag([4.0, 4.0, 4.0]).astype(np.float32)
    for k in range(40):
        w.write_raw(c, box, step=k, time=float(k))
    w.close()

    assert auto_window(p, requested=24) == 24  # explicit wins
    # 100 rows = 300 B/frame of delta wire: 4 MB target -> whole trajectory
    assert auto_window(p) == 40
    # below 16 frames of wire budget the window falls in powers of two
    # (huge frames: the 1M-atom chain measured w2 > w4 > w8 end-to-end)
    assert auto_window(p, target_bytes=3000) == 8
    assert auto_window(p, subset=np.arange(100), target_bytes=3000) == 8
    assert auto_window(p, target_bytes=301) == 1  # ~one frame per put
    assert auto_window(p, subset=np.arange(10), target_bytes=3000) == 40


def test_iter_windows_subset_matches_sliced_full(two_trajs):
    """Subset transport ships only the requested rows, bit-identical to
    slicing the full-frame windows, in every transport form (the delta form
    deltas the SLICED ints, so a subset window can stay delta even when the
    full frame would overflow)."""
    from molar_tpu.tasks.trajectory import decode_window_coords

    reader = TrajectoryReader(two_trajs)
    sub = np.array([7, 3, 11, 0])  # out-of-order subset: order must persist
    for quant in (False, True, "delta"):
        full = [
            np.asarray(decode_window_coords(c))
            for c, *_ in reader.iter_windows(4, quantized=quant)
        ]
        subw = [
            np.asarray(decode_window_coords(c))
            for c, *_ in reader.iter_windows(4, quantized=quant, subset=sub)
        ]
        assert len(full) == len(subw)
        for f, s in zip(full, subw):
            assert s.shape == (f.shape[0], 4, 3)
            np.testing.assert_array_equal(s, f[:, sub])


def test_subset_prefix_decode_bit_exact(tmp_path):
    """A subset confined to low atom indices triggers the prefix i16 decode
    (only max(subset)+1 atoms of each frame are parsed — XDR3DFR is
    sequential); the shipped rows must stay bit-identical to slicing the
    full-frame decode, across run-group boundaries (the decoder may
    overshoot into slack rows) and in every quantized transport form."""
    from molar_tpu.io.xtc import XtcHandler
    from molar_tpu.tasks.trajectory import (
        TrajectoryReader,
        decode_window_coords,
    )

    rng = np.random.default_rng(11)
    p = str(tmp_path / "big.xtc")
    w = XtcHandler(p, "w")
    box = np.diag([6.0, 6.0, 6.0]).astype(np.float32)
    # clustered coords so the encoder emits small-run groups (the prefix
    # stop must handle mid-run overshoot)
    c = rng.uniform(2.9, 3.1, (400, 3)).astype(np.float32)
    for k in range(9):
        c = c + rng.normal(0, 0.004, c.shape).astype(np.float32)
        w.write_raw(c, box, step=k, time=float(k))
    w.close()

    h = XtcHandler(p)
    full_ic, full_scale, fb, ft = h.read_frames_i16(0, 9)
    pre_ic, pre_scale, pb, pt = h.read_frames_i16(0, 9, n_prefix=37)
    assert pre_ic.shape == (9, 37, 3)
    np.testing.assert_array_equal(pre_ic, full_ic[:, :37])
    assert pre_scale == full_scale
    np.testing.assert_array_equal(pb, fb)
    h.close()

    sub = np.array([33, 2, 17, 36, 0])  # max 36 << 400: prefix kicks in
    reader = TrajectoryReader([p])
    for quant in (False, True, "delta"):
        full = [
            np.asarray(decode_window_coords(c))
            for c, *_ in reader.iter_windows(4, quantized=quant)
        ]
        subw = [
            np.asarray(decode_window_coords(c))
            for c, *_ in reader.iter_windows(4, quantized=quant, subset=sub)
        ]
        for f, s in zip(full, subw):
            np.testing.assert_array_equal(s, f[:, sub])


def test_delta_transport_form_and_fallback(tmp_path):
    """Smooth windows ship as (frame0 i16, deltas i8, scale); a window with a
    jump beyond int8 falls back to the i16 pair. Both decode bit-exactly."""
    rng = np.random.default_rng(9)
    box = np.diag([4.0, 4.0, 4.0]).astype(np.float32)
    w = XtcHandler(str(tmp_path / "d.xtc"), "w")
    c = rng.uniform(0, 4, (50, 3)).astype(np.float32)
    for k in range(8):
        # frames 4+ jump by 0.5 nm (= 500 quantized units, >> int8)
        c = c + (0.01 if k < 4 else 0.5)
        w.write_raw(c, box, step=k, time=float(k))
    w.close()
    reader = TrajectoryReader([str(tmp_path / "d.xtc")])
    forms = []
    for coords, *_ in reader.iter_windows(4, quantized="delta"):
        forms.append(len(coords) if isinstance(coords, tuple) else 0)
    assert forms == [3, 2]  # delta triple, then i16 fallback pair


def test_analysis_task_hooks_and_add_time(two_trajs, structure):
    class Count(AnalysisTask):
        task_name = "count"

        def pre_process(self, ctx):
            self.times = []

        def process_frame(self, ctx):
            self.times.append(ctx.system.state.time)

    t = Count()
    ctx = t.run(["-f", structure, *two_trajs])
    assert ctx.consumed_frames == 12
    # second file restarts its clock at 0
    assert t.times[7] == 0.0

    t2 = Count()
    t2.run(["-f", structure, *two_trajs, "--add-time"])
    # non-decreasing across the file boundary (pymolar --add-time: the next
    # file's clock restarts AT the previous end, like a continued run)
    assert all(b >= a for a, b in zip(t2.times, t2.times[1:]))
    assert t2.times[7] == 6.0 and t2.times[-1] == 10.0


def test_window_analysis_task(two_trajs, structure):
    class MeanZ(WindowAnalysisTask):
        task_name = "meanz"

        def build(self, system):
            self.n = 0

            @jax.jit
            def fn(coords, boxes, invs, times):
                return jnp.mean(coords[:, :, 2], axis=1)

            return fn

        def accumulate(self, ids, results):
            self.n += len(ids)

    t = MeanZ()
    t.run(["-f", structure, *two_trajs, "--window", "5"])
    assert t.n == 12


def test_pymolar_compat_hooks(two_trajs, structure):
    """register_args hook name + self.src/self.state/self.args attributes
    (molar_python/python/pymolar AnalysisTask compatibility)."""

    class Legacy(AnalysisTask):
        task_name = "legacy"

        def register_args(self, parser):
            parser.add_argument("--thr", type=float, default=1.0)

        def pre_process(self, ctx):
            assert self.src is ctx.system
            assert self.args.thr == 2.5
            self.seen = []

        def process_frame(self, ctx):
            self.seen.append(self.state.time)

    t = Legacy()
    t.run(["-f", structure, two_trajs[0], "--thr", "2.5"])
    assert len(t.seen) == 7


def test_pymolar_zero_arg_hooks_and_first_frame_pre_process(two_trajs, structure):
    """Verbatim pymolar tasks use zero-arg hooks, and pre_process fires with
    the first trajectory frame already swapped in (self.state set, self.src
    holding frame-1 coordinates — molar_python/python/pymolar __init__.py:96-101)."""

    class Verbatim(AnalysisTask):
        task_name = "verbatim"

        def pre_process(self):
            # self.state must be the first trajectory frame, not unset.
            self.first_time = self.state.time
            # self.src must hold frame-1 coords (nonzero, unlike s.gro).
            self.src_coords_at_pre = self.src.state.coords.copy()
            self.n = 0

        def process_frame(self):
            self.n += 1

        def post_process(self):
            self.done = True

    t = Verbatim()
    t.run(["-f", structure, two_trajs[0]])
    assert t.first_time == 0.0
    assert t.n == 7  # process_frame also runs on the first frame
    assert t.done
    # structure file has all-zero coords; frame 1 does not
    assert np.abs(t.src_coords_at_pre).sum() > 0


def _write_overflow_traj(path, n_atoms=64, n_frames=12, window_bad=(8, 9)):
    """Frames spread uniformly except a few that pile every atom into one
    cell (forcing cell-capacity overflow for small caps)."""
    rng = np.random.default_rng(3)
    box = np.diag([4.0, 4.0, 4.0]).astype(np.float32)
    w = XtcHandler(str(path), "w")
    for k in range(n_frames):
        if k in window_bad:
            c = rng.uniform(0.1, 0.4, (n_atoms, 3)).astype(np.float32)
        else:
            c = rng.uniform(0, 4, (n_atoms, 3)).astype(np.float32)
        w.write_raw(c, box, step=k, time=float(k))
    w.close()


def test_overflow_retry_reruns_flagged_windows(tmp_path):
    from molar_tpu.ops import neighbor

    path = tmp_path / "o.xtc"
    _write_overflow_traj(path)
    dims = neighbor.grid_dims([4.0, 4.0, 4.0], 0.5)
    idx = jnp.arange(64)
    built = []

    def build_fn(tier):
        cap = 8 * (tier + 1) * (tier + 1)  # 8, 32, 72
        built.append(cap)

        @jax.jit
        def fn(coords, boxes, invs, times):
            def per_frame(carry, frame):
                c, b, i = frame
                mask, ofl = neighbor.within_mask(
                    c, idx, idx, cutoff=0.5, box=b, inv=i, dims=dims, cap=cap
                )
                return carry, (jnp.sum(mask), ofl)

            _, (cnt, ofl) = jax.lax.scan(per_frame, 0, (coords, boxes, invs))
            return cnt, ofl

        return fn

    reader = TrajectoryReader([str(path)])
    results, retried = run_with_overflow_retry(
        reader, 4, build_fn, n_tiers=3, overflow_of=lambda r: r[1]
    )
    # Window 2 (frames 8-11) contains the piled-up frames (all 64 atoms in
    # one cell) -> retried, escalating to the cap-72 tier.
    assert retried == 1
    assert built == [8, 32, 72]
    assert len(results) == 3
    # All final results overflow-free and counts correct vs the host search.
    from molar_tpu.ops import neighbor_host
    from molar_tpu import PBC_FULL, PeriodicBox

    all_counts = np.concatenate([np.asarray(r[0]) for _, r in results])
    box = PeriodicBox(np.diag([4.0, 4.0, 4.0]))
    h = XtcHandler(str(path), "r")
    for k in range(12):
        st = h.read_frame(k)
        want = len(
            neighbor_host.search_within(
                0.5, st.coords, np.arange(64), np.arange(64), box, PBC_FULL
            )
        )
        assert all_counts[k] == want, k
    h.close()
    for _, r in results:
        assert not np.any(np.asarray(r[1]))


def test_overflow_retry_exhausted_raises(tmp_path):
    from molar_tpu.ops import neighbor

    path = tmp_path / "o2.xtc"
    _write_overflow_traj(path, window_bad=(0, 1, 2, 3))
    dims = neighbor.grid_dims([4.0, 4.0, 4.0], 0.5)
    idx = jnp.arange(64)

    def build_fn(tier):
        @jax.jit
        def fn(coords, boxes, invs, times):
            def per_frame(carry, frame):
                c, b, i = frame
                mask, ofl = neighbor.within_mask(
                    c, idx, idx, cutoff=0.5, box=b, inv=i, dims=dims, cap=4
                )
                return carry, (jnp.sum(mask), ofl)

            _, (cnt, ofl) = jax.lax.scan(per_frame, 0, (coords, boxes, invs))
            return cnt, ofl

        return fn

    with pytest.raises(AnalysisError, match="still overflows"):
        run_with_overflow_retry(
            TrajectoryReader([str(path)]), 4, build_fn, n_tiers=2,
            overflow_of=lambda r: r[1],
        )


def test_iter_windows_skip_phase_across_files(tmp_path):
    """The skip phase must carry across concatenated files exactly as
    iter_states does (analysis_task.rs:205-234) — it previously restarted
    at each file boundary in the windowed path."""
    p1, p2 = tmp_path / "a.xtc", tmp_path / "b.xtc"
    _write_traj(p1, 16, 7, t0=0.0)
    _write_traj(p2, 16, 9, t0=7.0)
    reader = TrajectoryReader([str(p1), str(p2)], skip=3)
    from_states = [fr for fr, _ in reader.iter_states()]
    from_windows = np.concatenate(
        [ids for *_, ids in reader.iter_windows(4)]
    ).tolist()
    assert from_states == [0, 3, 6, 9, 12, 15]
    assert from_windows == from_states


def test_overflow_retry_multifile_skip(tmp_path):
    """A flagged window in the SECOND file with skip=3: the by-range re-read
    must honor the carried skip phase and the retry must succeed."""
    from molar_tpu.ops import neighbor

    rng = np.random.default_rng(3)
    box = np.diag([4.0, 4.0, 4.0]).astype(np.float32)
    p1, p2 = tmp_path / "a.xtc", tmp_path / "b.xtc"
    w = XtcHandler(str(p1), "w")
    for k in range(7):  # global frames 0..6; kept (skip=3): 0, 3, 6
        w.write_raw(rng.uniform(0, 4, (64, 3)).astype(np.float32), box,
                    step=k, time=float(k))
    w.close()
    w = XtcHandler(str(p2), "w")
    for k in range(9):  # global frames 7..15; kept: 9, 12, 15
        gk = 7 + k
        if gk in (9, 12):  # pile-up: overflow the kept window
            c = rng.uniform(0.1, 0.4, (64, 3)).astype(np.float32)
        else:
            c = rng.uniform(0, 4, (64, 3)).astype(np.float32)
        w.write_raw(c, box, step=gk, time=float(gk))
    w.close()

    dims = neighbor.grid_dims([4.0, 4.0, 4.0], 0.5)
    idx = jnp.arange(64)

    def build_fn(tier):
        cap = (8, 72)[min(tier, 1)]

        @jax.jit
        def fn(coords, boxes, invs, times):
            def per_frame(carry, frame):
                c, b, i = frame
                mask, ofl = neighbor.within_mask(
                    c, idx, idx, cutoff=0.5, box=b, inv=i, dims=dims, cap=cap
                )
                return carry, (jnp.sum(mask), ofl)

            _, (cnt, ofl) = jax.lax.scan(per_frame, 0, (coords, boxes, invs))
            return cnt, ofl

        return fn

    reader = TrajectoryReader([str(p1), str(p2)], skip=3)
    results, retried = run_with_overflow_retry(
        reader, 3, build_fn, n_tiers=2, overflow_of=lambda r: r[1]
    )
    assert retried == 1
    got_ids = np.concatenate([ids for ids, _ in results]).tolist()
    assert got_ids == [0, 3, 6, 9, 12, 15]
    for _, r in results:
        assert not np.any(np.asarray(r[1]))
    # counts match the host search on the retried window's frames
    from molar_tpu import PBC_FULL, PeriodicBox
    from molar_tpu.ops import neighbor_host

    all_counts = np.concatenate([np.asarray(r[0]) for _, r in results])
    pbox = PeriodicBox(np.diag([4.0, 4.0, 4.0]))
    h = XtcHandler(str(p2), "r")
    for local, gk in ((2, 9), (5, 12)):
        st = h.read_frame(gk - 7)
        want = len(neighbor_host.search_within(
            0.5, st.coords, np.arange(64), np.arange(64), pbox, PBC_FULL))
        assert all_counts[local] == want
    h.close()


def test_overflow_retry_falls_back_to_per_frame_reread(tmp_path):
    """Non-monotonic times (restarted clock mid-file) + a time-based begin
    filter: the by-range window re-read cannot reproduce the frame set (the
    sub-reader has no time filter, so its skip phase differs) and the retry
    must fall back to per-frame random access instead of dying."""
    from molar_tpu.ops import neighbor

    rng = np.random.default_rng(5)
    box = np.diag([4.0, 4.0, 4.0]).astype(np.float32)
    path = tmp_path / "glitch.xtc"
    # times: 0 1 2 3 0 5 6 7 — frame 4's clock restarted; begin.time=1
    # makes it ineligible, so with skip=2 the kept frames are 1, 3, 6.
    times = [0.0, 1.0, 2.0, 3.0, 0.0, 5.0, 6.0, 7.0]
    w = XtcHandler(str(path), "w")
    for k, t in enumerate(times):
        if k in (3, 6):  # overflow the kept window
            c = rng.uniform(0.1, 0.4, (64, 3)).astype(np.float32)
        else:
            c = rng.uniform(0, 4, (64, 3)).astype(np.float32)
        w.write_raw(c, box, step=k, time=t)
    w.close()

    dims = neighbor.grid_dims([4.0, 4.0, 4.0], 0.5)
    idx = jnp.arange(64)

    def build_fn(tier):
        cap = (8, 72)[min(tier, 1)]

        @jax.jit
        def fn(coords, boxes, invs, times):
            def per_frame(carry, frame):
                c, b, i = frame
                mask, ofl = neighbor.within_mask(
                    c, idx, idx, cutoff=0.5, box=b, inv=i, dims=dims, cap=cap
                )
                return carry, (jnp.sum(mask), ofl)

            _, (cnt, ofl) = jax.lax.scan(per_frame, 0, (coords, boxes, invs))
            return cnt, ofl

        return fn

    reader = TrajectoryReader([str(path)], begin=FrameSpec(time=1.0), skip=2)
    assert [fr for fr, _ in reader.iter_states()] == [1, 3, 6]
    results, retried = run_with_overflow_retry(
        reader, 3, build_fn, n_tiers=2, overflow_of=lambda r: r[1]
    )
    assert retried == 1
    got_ids = np.concatenate([ids for ids, _ in results]).tolist()
    assert got_ids == [1, 3, 6]
    for _, r in results:
        assert not np.any(np.asarray(r[1]))


def test_ordered_pipeline_matches_default(tmp_path):
    """ordered=True (stage all transfers, then dispatch) must yield the
    same windows/results as the streaming default."""
    path = tmp_path / "t.xtc"
    _write_traj(path, 32, 11)

    @jax.jit
    def fn(coords, boxes, invs, times):
        return jnp.sum(coords, axis=(1, 2)), times

    def run(ordered):
        reader = TrajectoryReader([str(path)])
        pipe = WindowPipeline(reader, 4, fn, ordered=ordered)
        return [(ids.tolist(), np.asarray(r[0])) for ids, r in pipe.run()]

    a = run(False)
    b = run(True)
    assert len(a) == len(b) == 3
    for (i1, s1), (i2, s2) in zip(a, b):
        assert i1 == i2
        np.testing.assert_array_equal(s1, s2)
