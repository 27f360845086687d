from nbody.diagnostics.energy import (
    kinetic_energy,
    potential_energy,
    total_energy,
    momentum,
    angular_momentum,
    center_of_mass,
    energy_drift,
    virial_ratio,
)

__all__ = [
    "kinetic_energy",
    "potential_energy",
    "total_energy",
    "momentum",
    "angular_momentum",
    "center_of_mass",
    "energy_drift",
    "virial_ratio",
]

from nbody.diagnostics.profiling import (
    StepTimer,
    benchmark_fn,
    pairwise_interactions,
    trace,
)

__all__ += ["StepTimer", "benchmark_fn", "pairwise_interactions", "trace"]
