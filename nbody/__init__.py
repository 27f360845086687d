"""nbody — a TPU-native N-body simulation framework.

A from-scratch JAX / XLA / Pallas rebuild of the capability set of the
reference thesis repo (HusseinYoud/Bachelor-Thesis-N-Body): gravity solvers
(PP direct summation, PM particle-mesh, P3M hybrid — the trichotomy the
reference selects via CONCEPT param files, see reference
`Different_Sizes/Giant.param:66-68`), Gaussian-random-field + LPT initial
conditions (reference `CiC/3D startbetingelser1.py:62-173`), Cloud-in-Cell
mass assignment and power-spectrum measurement (reference
`SnapVsPK/Power_compare.py:100-200`), seeded ensemble orchestration
(reference `SnapVsPK/Ucertain.py`), and a 3D-CNN cosmological-parameter
emulator with uncertainty quantification (reference
`TheFeedingPipeline/Cosmo NN5.py`).

Unlike the reference — which drives the external CONCEPT (C/MPI/FFTW)
engine via subprocesses — this package IS the engine: the O(N^2) force is a
Pallas tiled all-pairs kernel, the PM solver is an XLA FFT Poisson solve,
time integration is a fully jitted ``jax.lax.scan`` KDK leapfrog, and
multi-chip scaling uses ``jax.shard_map`` ring exchange + ``psum`` over a
``jax.sharding.Mesh`` instead of MPI.
"""

__version__ = "0.1.0"

from nbody.core.types import ParticleState
from nbody.core import units
from nbody.core.cosmology import Cosmology

__all__ = ["ParticleState", "units", "Cosmology", "__version__"]
