from nbody.mesh.grids import kvecs, kmag, lattice
from nbody.mesh.cic import (
    cic_deposit,
    cic_gather,
    density_to_delta,
    cic_window,
    deconvolve,
    cic_deposit_interlaced_k,
)
from nbody.mesh.spectrum import power_spectrum, PowerSpectrumResult

__all__ = [
    "kvecs",
    "kmag",
    "lattice",
    "cic_deposit",
    "cic_gather",
    "density_to_delta",
    "cic_window",
    "deconvolve",
    "cic_deposit_interlaced_k",
    "power_spectrum",
    "PowerSpectrumResult",
]
