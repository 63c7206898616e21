from .membrane import LipidMolecule, LipidSpecies, Membrane, MembraneOptions

__all__ = ["Membrane", "MembraneOptions", "LipidSpecies", "LipidMolecule"]
