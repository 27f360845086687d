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

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    TPU compiles route through a remote compile service here (30-300 s
    for the big stepping scans) and are paid PER PROCESS without this:
    measured round 3, a capacity-ladder recompile cost ~250 s per
    ensemble seed, while the persistent cache turns an identical-HLO
    compile in a fresh process from 194 s into 1.2 s.  Opt out with
    NBODY_NO_COMPILE_CACHE=1; an explicit JAX_COMPILATION_CACHE_DIR (or
    prior jax.config setting) wins.
    """
    if _os.environ.get("NBODY_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/nbody-jax"),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - cache is a pure optimisation
        pass


_enable_compile_cache()

from nbody.core.types import ParticleState
from nbody.core import units
from nbody.core.cosmology import Cosmology

__all__ = ["ParticleState", "units", "Cosmology", "__version__"]
