from nbody.integrate.leapfrog import kdk_step, run, run_with_diagnostics
from nbody.integrate.cosmo_stepping import (
    cosmo_kick_drift_factors,
    run_cosmological,
)

__all__ = [
    "kdk_step",
    "run",
    "run_with_diagnostics",
    "cosmo_kick_drift_factors",
    "run_cosmological",
]

from nbody.integrate.adaptive import (
    AdaptiveResult,
    required_dt,
    run_adaptive,
    rung_population,
)

__all__ += ["AdaptiveResult", "required_dt", "run_adaptive", "rung_population"]
