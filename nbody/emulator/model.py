"""3D-CNN emulator models, losses and metrics (flax).

Rebuilds the reference's Keras/TFP builders (SURVEY.md §2):
  C23 `make_model` (`Cosmo NN5.py:243-341`): Conv3D(32, 3^3, relu, VALID)
      + MaxPool(2^3) blocks, GAP/Flatten, Dense(64) stack, Dropout, head
      of width n_out (x2 for the heteroscedastic NLL mode).
  C24 `make_bayesian_model` (`Cosmo NN5.py:343-414`): variational conv +
      dense layers (mean-field Gaussian posteriors, unit-normal prior,
      KL weighted by 1/n_train).
  C17 losses `loss_mse` / `loss_nlll` (`Cosmo NN5.py:28-58`) with the same
      softplus-sigma parametrisation.
  C18 metrics `chi_squared_calc` / `sigma_coverage_calc` /
      `abs_percent_deviation_calc` (`Cosmo NN5.py:61-81`).

Everything is bfloat16-friendly but defaults to float32; convolutions map
onto the MXU via XLA's conv-to-matmul lowering (the reference needed
`tf.config.optimizer.set_jit(True)` monkey-patching to get XLA at all —
`Feeder_pipe.py:28-44`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

KL_COLLECTION = "kl_terms"


# --------------------------------------------------------------------------
# Variational layers (C19 + C24)
# --------------------------------------------------------------------------


def _kl_std_normal(mu, sigma):
    """KL( N(mu, sigma^2) || N(0, 1) ), summed over all weights."""
    return jnp.sum(0.5 * (mu**2 + sigma**2 - 1.0) - jnp.log(sigma))


def _sample_params(module: nn.Module, name: str, shape, init_fn):
    mu = module.param(f"{name}_mu", init_fn, shape)
    rho = module.param(
        f"{name}_rho", nn.initializers.constant(-5.0), shape
    )  # softplus(-5) ~ 6.7e-3 initial posterior std
    sigma = nn.softplus(rho) + 1e-6
    eps = jax.random.normal(module.make_rng("sample"), shape, mu.dtype)
    module.sow(KL_COLLECTION, name, _kl_std_normal(mu, sigma))
    return mu + sigma * eps


class DenseVariational(nn.Module):
    """Mean-field Gaussian dense layer, unit-normal prior
    (role of `tfpl.DenseVariational`, reference `Cosmo NN5.py:389-396`)."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = _sample_params(
            self, "kernel", (x.shape[-1], self.features),
            nn.initializers.lecun_normal(),
        )
        b = _sample_params(
            self, "bias", (self.features,), nn.initializers.zeros
        )
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class Conv3DVariational(nn.Module):
    """Mean-field Gaussian 3D convolution, VALID padding
    (role of `tfpl.Convolution3DReparameterization`, `Cosmo NN5.py:357-372`)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)

    @nn.compact
    def __call__(self, x):
        kshape = (*self.kernel_size, x.shape[-1], self.features)
        w = _sample_params(
            self, "kernel", kshape, nn.initializers.lecun_normal()
        )
        b = _sample_params(
            self, "bias", (self.features,), nn.initializers.zeros
        )
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + b.astype(x.dtype)


# --------------------------------------------------------------------------
# The CNN (C23 / C24)
# --------------------------------------------------------------------------


def max_conv_blocks(n: int) -> int:
    """How many Conv3D(3^3, VALID)+MaxPool(2^3) blocks an n^3 volume
    supports before the spatial size hits zero."""
    blocks = 0
    while (n - 2) // 2 >= 1:
        n = (n - 2) // 2
        blocks += 1
    return blocks


def _max_pool_222(x):
    """Non-overlapping 2x2x2 max pool via crop + reshape + reduce-max.

    Same values as ``nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))``
    (VALID padding crops the odd trailing edge identically), but its
    VJP is a broadcast-compare mask instead of XLA's 3-D
    SelectAndScatter — the SelectAndScatter dominated the conv stack's
    backward on the v5e (conv-stack grad 28.7 ms -> 19.5 ms measured
    with the pooling backward removed)."""
    b, d, h, w, c = x.shape
    x = x[:, : d // 2 * 2, : h // 2 * 2, : w // 2 * 2, :]
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4, 6))


class CosmoCNN(nn.Module):
    """delta(x) volume -> cosmological parameter regression.

    Mirrors the reference's `make_model` topology and defaults
    (`Cosmo NN5.py:243-341`; defaults epochs=1000, bs=16, lr=4e-3,
    dropout=0.2 per `Feeder_pipe.py:20-22`).  ``heteroscedastic`` doubles
    the head width to (mu, raw_sigma) for the NLL loss; ``variational``
    swaps conv/dense layers for their mean-field Gaussian versions.
    """

    n_out: int = 1
    n_conv: int = 2
    n_dense: int = 1
    filters: int = 32
    dense_units: int = 64
    dropout_rate: float = 0.2
    full_dropout: bool = False  # the reference's fullDR toggle
    global_pool: bool = True  # GAP (True) vs Flatten
    heteroscedastic: bool = False
    variational: bool = False
    #: computation dtype for the conv/dense stack: "auto" = bfloat16 on
    #: TPU (parameters and the loss stay float32 — standard TPU mixed
    #: precision; f32 3-D convs lower to multi-pass bf16 on the MXU and
    #: their backward measured 3.2x slower on the v5e), float32
    #: elsewhere (CPU tests stay bit-deterministic).  "f32"/"bf16" pin.
    compute_dtype: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.ndim == 4:
            x = x[..., None]  # (B, N, N, N) -> NDHWC
        if max_conv_blocks(x.shape[1]) < self.n_conv:
            raise ValueError(
                f"n_conv={self.n_conv} collapses a {x.shape[1]}^3 volume to "
                f"zero size (VALID conv + 2x pool); max is "
                f"{max_conv_blocks(x.shape[1])}"
            )
        if self.compute_dtype == "bf16" or (
            self.compute_dtype == "auto"
            and jax.default_backend() == "tpu"
            and not self.variational
        ):
            dt = jnp.bfloat16
        else:
            dt = None
        for _ in range(self.n_conv):
            if self.variational:
                x = Conv3DVariational(self.filters)(x)
            else:
                x = nn.Conv(self.filters, (3, 3, 3), padding="VALID",
                            dtype=dt)(x)
            x = nn.relu(x)
            x = _max_pool_222(x)
            if self.full_dropout:
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2, 3))
        else:
            x = x.reshape(x.shape[0], -1)
        for _ in range(self.n_dense):
            if self.variational:
                x = DenseVariational(self.dense_units)(x)
            else:
                x = nn.Dense(self.dense_units, dtype=dt)(x)
            x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        width = 2 * self.n_out if self.heteroscedastic else self.n_out
        if self.variational:
            return DenseVariational(width)(x)
        return nn.Dense(width, dtype=dt)(x).astype(jnp.float32)

    # -- prediction splitting ------------------------------------------------
    def split_prediction(self, pred):
        """(mu, sigma) for heteroscedastic heads; (mu, None) otherwise.
        sigma uses the reference's softplus parametrisation
        (`Cosmo NN5.py:39-58`)."""
        if not self.heteroscedastic:
            return pred, None
        mu = pred[..., : self.n_out]
        sigma = nn.softplus(pred[..., self.n_out :]) + 1e-6
        return mu, sigma


# --------------------------------------------------------------------------
# Losses (C17)
# --------------------------------------------------------------------------


def mse_loss(pred, y):
    """Reference `loss_mse` (`Cosmo NN5.py:28-37`)."""
    return jnp.mean((pred - y) ** 2)


def gaussian_nll(pred, y):
    """Heteroscedastic Gaussian NLL with softplus sigma — reference
    `loss_nlll` (`Cosmo NN5.py:39-58`).  ``pred`` is (B, 2P): mu | raw."""
    p = y.shape[-1]
    mu = pred[..., :p]
    sigma = nn.softplus(pred[..., p:]) + 1e-6
    return jnp.mean(0.5 * ((y - mu) / sigma) ** 2 + jnp.log(sigma))


# --------------------------------------------------------------------------
# Metrics (C18)
# --------------------------------------------------------------------------


def chi_squared(y_true, y_pred, sigma):
    """Reference `chi_squared_calc` (`Cosmo NN5.py:61-66`)."""
    return jnp.sum(((y_true - y_pred) / sigma) ** 2)


def sigma_coverage(y_true, y_pred, sigma):
    """Fraction of truths within 1/2/3 predicted sigma — reference
    `sigma_coverage_calc` (`Cosmo NN5.py:68-75`); calibrated UQ gives
    ~(0.683, 0.954, 0.997)."""
    err = jnp.abs(y_true - y_pred)
    return jnp.stack(
        [jnp.mean((err <= n * sigma).astype(jnp.float32)) for n in (1, 2, 3)]
    )


def abs_percent_deviation(y_true, y_pred):
    """Reference `abs_percent_deviation_calc` (`Cosmo NN5.py:77-81`)."""
    return 100.0 * jnp.mean(jnp.abs((y_pred - y_true) / y_true))
