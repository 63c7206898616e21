"""IO facade edge behavior: serial skip fallbacks, pushback, FileStats,
corrupt-tail warning (io.rs:198-306, 726-769)."""

import logging

import numpy as np
import pytest

from molar_tpu.core.pbc import PeriodicBox
from molar_tpu.core.state import State
from molar_tpu.io import FileHandler, SeekError


@pytest.fixture()
def multi_gro(tmp_path):
    """5-frame multi-frame GRO (no native random access -> serial fallbacks)."""
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 4, (3, 3)).astype(np.float32)
    lines = []
    for k in range(5):
        lines.append(f"frame t= {float(k):.3f}")
        lines.append(" 3")
        for i in range(3):
            x, y, z = coords[i] + 0.1 * k
            lines.append(f"{1:5d}{'SOL':<5}{'OW':>5}{i + 1:5d}{x:8.3f}{y:8.3f}{z:8.3f}")
        lines.append("   4.00000   4.00000   4.00000")
    p = tmp_path / "t.gro"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_skip_to_frame_serial_fallback(multi_gro):
    fh = FileHandler(multi_gro)
    fh.skip_to_frame(3)
    st = fh.read_state()
    assert st.time == pytest.approx(3.0)
    fh.close()


def test_skip_to_frame_past_end(multi_gro):
    fh = FileHandler(multi_gro)
    with pytest.raises(SeekError):
        fh.skip_to_frame(99)


def test_skip_to_time_pushback(multi_gro):
    # the first frame with time >= t is pushed back and returned by the
    # next read (io.rs skip_to_time contract)
    fh = FileHandler(multi_gro)
    fh.skip_to_time(2.0)
    st = fh.read_state()
    assert st.time == pytest.approx(2.0)
    nxt = fh.read_state()
    assert nxt.time == pytest.approx(3.0)
    fh.close()


def test_file_stats_counts(multi_gro):
    fh = FileHandler(multi_gro)
    n = sum(1 for _ in fh.iter_states())
    assert n == 5
    assert fh.stats.frames_processed >= 5
    assert fh.stats.cur_t == pytest.approx(4.0)
    assert fh.stats.elapsed_time > 0
    fh.close()


def test_corrupt_tail_warns_not_raises(tmp_path, caplog):
    # truncate the last frame mid-atom: iteration ends with a warning
    rng = np.random.default_rng(1)
    good = tmp_path / "good.gro"
    lines = []
    for k in range(2):
        lines.append(f"frame t= {float(k):.3f}")
        lines.append(" 2")
        for i in range(2):
            lines.append(
                f"{1:5d}{'SOL':<5}{'OW':>5}{i + 1:5d}{1.0:8.3f}{1.0:8.3f}{1.0:8.3f}"
            )
        lines.append("   4.00000   4.00000   4.00000")
    text = "\n".join(lines) + "\n"
    bad = tmp_path / "bad.gro"
    bad.write_text(text[: len(text) - 40])  # cut into the last frame
    fh = FileHandler(str(bad))
    with caplog.at_level(logging.WARNING):
        frames = list(fh.iter_states())
    assert len(frames) == 1
    assert any("terminated early" in r.message for r in caplog.records)

def test_iter_states_prefetch_matches_sync(multi_gro):
    # The prefetching reader thread (io.rs:198-271 IoStateIterator analog)
    # must yield the identical frame sequence as the synchronous path.
    with FileHandler(multi_gro) as fh:
        sync = [(s.time, s.coords.copy()) for s in fh.iter_states(prefetch=0)]
    with FileHandler(multi_gro) as fh:
        pre = [(s.time, s.coords.copy()) for s in fh.iter_states(prefetch=3)]
    assert len(sync) == len(pre) == 5
    for (ts, cs), (tp, cp) in zip(sync, pre):
        assert ts == tp
        np.testing.assert_array_equal(cs, cp)


def test_iter_states_prefetch_abandoned_generator(multi_gro):
    # Breaking out of iteration early must not hang or error: the feeder
    # thread is signalled to stop when the generator is finalized.
    with FileHandler(multi_gro) as fh:
        for k, st in enumerate(fh.iter_states()):
            if k == 1:
                break
    # a second independent iteration still works
    with FileHandler(multi_gro) as fh:
        assert sum(1 for _ in fh.iter_states()) == 5


def test_iter_states_prefetch_corrupt_tail(tmp_path, caplog):
    # The corrupt-tail warn-and-stop contract survives the reader thread.
    lines = []
    for k in range(2):
        lines.append(f"frame t= {float(k):.3f}")
        lines.append(" 2")
        for i in range(2):
            lines.append(
                f"{1:5d}{'SOL':<5}{'OW':>5}{i + 1:5d}{1.0:8.3f}{1.0:8.3f}{1.0:8.3f}"
            )
        lines.append("   4.00000   4.00000   4.00000")
    text = "\n".join(lines) + "\n"
    bad = tmp_path / "bad2.gro"
    bad.write_text(text[: len(text) - 40])
    fh = FileHandler(str(bad))
    with caplog.at_level(logging.WARNING):
        frames = list(fh.iter_states(prefetch=4))
    assert len(frames) == 1
    assert any("terminated early" in r.message for r in caplog.records)
