"""molar_tpu — a TPU-native molecular trajectory analysis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of MolAR
(yesint/molar): structure/trajectory IO, a VMD-like selection language,
per-frame geometric analysis (RMSD/Kabsch fitting, COM/gyration/inertia,
PBC-aware cell-grid distance search, SASA, secondary structure, membrane
properties) and system editing — designed TPU-first: structure-of-arrays
device buffers, selections compiled to static index/mask arrays, analysis
windows executed as one jitted/vmapped XLA program with frames sharded over
the device mesh.

Units: nm (length), ps (time), amu (mass), e (charge).
"""

from . import config
from .core import (
    Atom,
    BondOrder,
    FrameBatch,
    PBC_FULL,
    PBC_NONE,
    PbcDims,
    PeriodicBox,
    PeriodicBoxError,
    State,
    Topology,
)
from .core.system import Particle, Sel, SelectionError, System, distance_search
from .selection import SelectionExpr, SelectionSyntaxError

__version__ = "0.4.0"
