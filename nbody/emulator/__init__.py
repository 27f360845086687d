"""Emulator: 3D-CNN cosmological parameter inference with UQ.

JAX/flax rebuild of the reference's TensorFlow/Keras+TFP emulator stack
(`TheFeedingPipeline/Cosmo NN5.py`, `COsmo N4.py` — components C17-C27 in
SURVEY.md §2): delta(x) volume -> (A_s, n_s, omega_cdm) regression with
three uncertainty-quantification modes (MC dropout, heteroscedastic NLL,
variational Bayes), plus the dataset creation / ETL / augmentation
pipeline feeding it.
"""

from nbody.emulator.data import (
    DeltaDataset,
    augment_batch,
    create_linear_dataset,
    snapshots_to_delta,
)
from nbody.emulator.model import (
    CosmoCNN,
    gaussian_nll,
    mse_loss,
    sigma_coverage,
    abs_percent_deviation,
    chi_squared,
)
from nbody.emulator.train import TrainResult, evaluate_uq, fit

__all__ = [
    "DeltaDataset",
    "augment_batch",
    "create_linear_dataset",
    "snapshots_to_delta",
    "CosmoCNN",
    "gaussian_nll",
    "mse_loss",
    "sigma_coverage",
    "abs_percent_deviation",
    "chi_squared",
    "TrainResult",
    "evaluate_uq",
    "fit",
]
