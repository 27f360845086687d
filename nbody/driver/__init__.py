"""Driver: typed configuration, single runs, seeded ensembles, CLI.

Replaces the reference's CONCEPT ``.param`` templating + subprocess
orchestration (components C13/C14, `SnapVsPK/Ucertain.py`,
`TheFeedingPipeline/NeuNetværk_test.py`) with a typed dataclass config and
in-process jitted runs — each "job" is one XLA program, not a subprocess.
"""

from nbody.driver.config import SimulationConfig, OutputConfig
from nbody.driver.simulate import build_cosmo_force, run_simulation
from nbody.driver.ensemble import (
    EnsembleResult,
    find_missing_jobs,
    make_seeds,
    run_ensemble,
)

__all__ = [
    "SimulationConfig",
    "OutputConfig",
    "build_cosmo_force",
    "run_simulation",
    "EnsembleResult",
    "find_missing_jobs",
    "make_seeds",
    "run_ensemble",
]
