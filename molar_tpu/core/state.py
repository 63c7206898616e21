"""Per-frame state: coordinates, velocities, forces, time, box.

Mirrors the reference ``State {coords, velocities, forces, time, pbox}``
(molar/src/state.rs:22-28): velocities/forces are optional (None here, empty Vec
there). Host ``State`` is numpy (what IO produces and editing mutates);
:class:`FrameBatch` is the device-facing pytree of ``(B, N, 3)`` jnp arrays that
one jitted analysis window consumes — frames is the batch ("sequence") axis that
vmaps within a chip and shards across chips.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

from ..config import FLOAT
from .pbc import PeriodicBox

__all__ = ["State", "FrameBatch", "make_fake_state"]


@dataclass
class State:
    coords: np.ndarray  # (N, 3) FLOAT
    velocities: Optional[np.ndarray] = None  # (N, 3) or None
    forces: Optional[np.ndarray] = None  # (N, 3) or None
    time: float = 0.0  # ps
    box: Optional[PeriodicBox] = None
    step: int = 0

    @property
    def n_atoms(self) -> int:
        return self.coords.shape[0]

    def __len__(self) -> int:
        return self.n_atoms

    @property
    def has_velocities(self) -> bool:
        return self.velocities is not None

    @property
    def has_forces(self) -> bool:
        return self.forces is not None

    def require_box(self) -> PeriodicBox:
        if self.box is None:
            raise ValueError("operation requires a periodic box, but state has none")
        return self.box

    def set_box_from(self, src) -> None:
        """Copy the box of ``src`` (System/Sel/State) — molar.pyi:54.
        A fresh PeriodicBox, never an alias (System.set_box_from's
        invariant)."""
        b = src.box if isinstance(src, State) else src.state.box
        self.box = None if b is None else PeriodicBox(b.matrix.copy())

    def copy(self) -> "State":
        return State(
            coords=self.coords.copy(),
            velocities=None if self.velocities is None else self.velocities.copy(),
            forces=None if self.forces is None else self.forces.copy(),
            time=self.time,
            box=self.box,
            step=self.step,
        )


def make_fake_state(n: int, box_side: float = 10.0) -> State:
    """Deterministic fixture state: atom i at (i, i, i), cubic box
    (reference: state.rs:88-96 ``new_fake``)."""
    coords = np.repeat(np.arange(n, dtype=FLOAT)[:, None], 3, axis=1)
    box = PeriodicBox(np.diag([box_side, box_side, box_side]).astype(FLOAT))
    return State(coords=coords, box=box)


@dataclass
class FrameBatch:
    """A window of B frames as device arrays (a jax pytree).

    ``boxes``/``box_invs`` are (B,3,3); ``corrections`` is (B,26,3) zero-padded
    (present iff any frame's box is triclinic — shape is static per trajectory).
    ``valid`` masks ragged tails when a trajectory doesn't divide the window.
    """

    coords: "object"  # (B, N, 3)
    boxes: "object"  # (B, 3, 3)
    box_invs: "object"  # (B, 3, 3)
    times: "object"  # (B,)
    valid: "object"  # (B,) bool
    corrections: Optional["object"] = None  # (B, 26, 3) or None

    @property
    def n_frames(self) -> int:
        return self.coords.shape[0]

    @staticmethod
    def from_states(states: Sequence[State], pad_to: Optional[int] = None) -> "FrameBatch":
        """Stack host states into one batch (host numpy; call
        ``jax.device_put`` on the result to ship it)."""
        b = len(states)
        n = pad_to or b
        if n < b:
            raise ValueError("pad_to smaller than number of states")
        coords = np.stack([s.coords for s in states])
        if n > b:
            pad = np.repeat(coords[-1:], n - b, axis=0)
            coords = np.concatenate([coords, pad])
        eye = np.eye(3, dtype=FLOAT)
        boxes = np.stack(
            [s.box.matrix if s.box is not None else eye for s in states]
            + [eye] * (n - b)
        )
        invs = np.stack(
            [s.box.inv if s.box is not None else eye for s in states] + [eye] * (n - b)
        )
        times = np.array([s.time for s in states] + [0.0] * (n - b), FLOAT)
        valid = np.array([True] * b + [False] * (n - b))
        tric = any(s.box is not None and s.box.is_triclinic for s in states)
        corrections = None
        if tric:
            zero = np.zeros((26, 3), FLOAT)
            corrections = np.stack(
                [s.box.padded_corrections() if s.box is not None else zero for s in states]
                + [zero] * (n - b)
            )
        return FrameBatch(coords, boxes, invs, times, valid, corrections)


def _register_pytrees() -> None:
    import jax

    jax.tree_util.register_pytree_node(
        FrameBatch,
        lambda fb: (
            (fb.coords, fb.boxes, fb.box_invs, fb.times, fb.valid, fb.corrections),
            None,
        ),
        lambda _, ch: FrameBatch(*ch),
    )


_register_pytrees()
