from .membrane import (
    LipidMolecule,
    LipidSpecies,
    Membrane,
    MembraneError,
    MembraneOptions,
)


def __getattr__(name):
    # MembraneDevice pulls in jax; keep the host membrane importable without it
    if name == "MembraneDevice":
        from .device import MembraneDevice

        return MembraneDevice
    raise AttributeError(name)


__all__ = [
    "Membrane",
    "MembraneOptions",
    "LipidSpecies",
    "LipidMolecule",
    "MembraneDevice",
    "MembraneError",
]
