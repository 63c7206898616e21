from .atom import Atom, BondOrder, IN_RING, AROMATIC
from .interner import NamePool
from .pbc import PBC_FULL, PBC_NONE, PbcDims, PeriodicBox, PeriodicBoxError
from .state import FrameBatch, State, make_fake_state
from .topology import Adjacency, Topology, TopologyError


def __getattr__(name):
    # System/Sel import the selection engine, which imports core — load lazily
    # to keep the core package import-cycle-free.
    if name in ("System", "Sel", "SelectionError"):
        from . import system as _system

        return getattr(_system, name)
    raise AttributeError(name)

__all__ = [
    "Atom",
    "BondOrder",
    "IN_RING",
    "AROMATIC",
    "NamePool",
    "PBC_FULL",
    "PBC_NONE",
    "PbcDims",
    "PeriodicBox",
    "PeriodicBoxError",
    "FrameBatch",
    "State",
    "make_fake_state",
    "Adjacency",
    "Topology",
    "TopologyError",
]
