"""Measured-crossover engine selection: host numpy vs CPU-jit vs accelerator.

The round-4 workload campaign (docs/perf_notes.md, "Config workloads" table)
measured the same analysis bodies on three engines and found the winner is
decided by per-frame work, not by "is a TPU present":

- 72-lipid membrane window program: CPU-jit 134 fps > host numpy 68 >
  TPU 41.5 (the ~20-25 ms tunnel round-trip per window dominates).
- 4608-lipid membrane: TPU 9.2 fps ~2x the native single core; the CPU
  backends collapse (native itself draws 0.9-4.7 fps, O(L^2) pair work).
- 4.3k-atom align (one small frame per dispatch): host numpy wins
  (comparison_small table) — jit dispatch alone costs more than the math.
- Streamed selection workloads (1-4k rows/frame) flipped to the device once
  :func:`~molar_tpu.tasks.trajectory.auto_window` sized windows from wire
  bytes (round-5: ca_rmsd 1.77x native at window 128) — streams are
  dispatch-bound, so the window, not the engine, was the lever.

This module encodes those crossovers as a small, documented heuristic so
callers get the best *measured* engine by default instead of the worst row
of the table. It deliberately has one scalar input — an estimate of
per-frame device FLOPs — because that is the axis the measurements actually
varied along.

Reference analog: the serial fallback shim the reference keeps for wasm
builds (molar/src/par.rs:17-82) — degrade to the engine that wins, not the
engine that's fancy.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "accelerator_device",
    "cpu_device",
    "pick_engine",
    "engine_device",
    "DEVICE_FLOPS_FLOOR",
]

# Per-frame device-FLOPs floor below which a remote accelerator's dispatch
# latency exceeds its compute win. Calibrated from the membrane rows: the
# 72-lipid program (~72 lipids x 48-cap patches^2 x ~40 flops ~ 7e6
# flops/frame) loses on TPU; the 4608-lipid program (~4608 x 88^2 x 40 ~
# 1.4e9) wins. The geometric middle ~1e8 splits the two measured points
# with an order of magnitude of slack on each side.
DEVICE_FLOPS_FLOOR = 1e8

# Below this the jit dispatch itself loses to plain numpy on the host core
# (the 4.3k-atom align measurement: one ~2e5-flop Kabsch per call).
JIT_FLOPS_FLOOR = 1e6


def cpu_device():
    """The first CPU backend device (always present alongside TPU)."""
    import jax

    return jax.devices("cpu")[0]


def accelerator_device():
    """The first non-CPU jax device, or None if the build is CPU-only."""
    import jax

    try:
        d = jax.devices()[0]
    except RuntimeError:
        return None
    return None if d.platform == "cpu" else d


def pick_engine(per_frame_flops: float, frames_per_call: int = 1) -> str:
    """Return ``"host"`` | ``"cpu"`` | ``"device"`` for an analysis body.

    ``per_frame_flops``: rough device-FLOP estimate of one frame's compute.
    Order of magnitude is enough — the measured crossovers are ~2 decades
    apart (see module docstring).

    ``frames_per_call``: frames batched per dispatch (the execute window).
    Dispatch cost amortizes over it, so the floor drops proportionally —
    this is why auto-window flipped the streamed selection workloads.
    """
    work = float(per_frame_flops) * max(1, int(frames_per_call))
    if work < JIT_FLOPS_FLOOR:
        return "host"
    if work < DEVICE_FLOPS_FLOOR:
        return "cpu"
    return "device" if accelerator_device() is not None else "cpu"


def engine_device(engine: str):
    """Map an engine name to the jax device to commit inputs to.

    Returns None for ``"host"`` (caller should use its numpy path) and for
    ``"device"`` (uncommitted arrays already land on the default backend);
    returns the CPU device for ``"cpu"`` so ``jax.device_put(x, dev)``
    commits inputs there and every jit tracing them runs on the CPU backend
    — per-call engine mixing inside one process, no global platform switch.
    """
    if engine == "cpu":
        dev = cpu_device()
        acc = accelerator_device()
        # On a CPU-only build the default backend IS the cpu device;
        # committing is harmless but pointless — keep arrays uncommitted so
        # donation/sharding behave as default.
        return dev if acc is not None else None
    if engine in ("host", "device", "auto"):
        return None
    raise ValueError(f"unknown engine {engine!r} (host/cpu/device)")
