from .atom import Atom, BondOrder, IN_RING, AROMATIC
from .interner import NamePool
from .pbc import PBC_FULL, PBC_NONE, PbcDims, PeriodicBox, PeriodicBoxError
from .state import FrameBatch, State, make_fake_state
from .topology import Adjacency, Topology, TopologyError

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
