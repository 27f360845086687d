from nbody.core.types import ParticleState
from nbody.core import units
from nbody.core.cosmology import Cosmology

__all__ = ["ParticleState", "units", "Cosmology"]
