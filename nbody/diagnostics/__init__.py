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

from nbody.diagnostics.layzer_irvine import (
    layzer_irvine_residual,
    peculiar_energies,
    run_cosmological_with_diagnostics,
)

__all__ += [
    "layzer_irvine_residual",
    "peculiar_energies",
    "run_cosmological_with_diagnostics",
]
