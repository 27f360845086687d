"""Gaussian random field realization (components C2-C3, SURVEY.md §2.1).

The reference enforces the Hermitian symmetry delta(-k) = delta*(k) with an
O(N^3) Python triple loop over complex draws (`createR`,
`TheFeedingPipeline/Cosmo data create (new).py:24-47`;
`SnapVsPK/Power_compare.py:301-312`).  Here the symmetry is *structural*:
draw unit white noise in real space and FFT it — rfftn of a real field is
Hermitian by construction, every mode has the correct marginal statistics,
and there is no loop to port.  Fully jittable, vmappable over keys for
ensemble generation (the TPU analogue of the reference's joblib fan-out,
SURVEY.md §2.3).

Amplitude conventions (see nbody.mesh.spectrum): with
delta_k = sqrt(P(k) N^3 / V) * rfftn(whitenoise), the measured spectrum in
the "grid" convention (P = |delta_k|^2 V/N^6) is exactly P(k).  The
reference's "fac" realization (`find_delta`,
`Cosmo data create (new).py:114-137`) is sqrt(2 pi) larger; pass
convention="fac" for bit-parity with its training data statistics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from nbody.mesh.grids import kmag


@dataclasses.dataclass(frozen=True)
class GRFSpec:
    """Specification of a Gaussian random field realization."""

    nmesh: int
    box: float
    convention: str = "grid"   # or "fac" (reference parity)


def white_noise_k(key, nmesh: int, dtype=jnp.float32):
    """rfftn of unit real white noise: Hermitian, <|w_k|^2> = N^3."""
    w = jax.random.normal(key, (nmesh, nmesh, nmesh), dtype)
    return jnp.fft.rfftn(w)


@functools.partial(jax.jit, static_argnames=("spec", "power"))
def gaussian_delta_k(key, spec: GRFSpec, power: Callable, amplitude=1.0):
    """delta(k) on the rfft grid for the given isotropic power spectrum.

    ``power(k)`` maps |k| (1/length) to P(k) (length^3). Returns complex
    rfft-layout delta_k in the 'grid' measurement convention (or 'fac').
    ``amplitude`` is a *traced* multiplier on P(k) — ensembles that vary
    only the primordial amplitude A_s (the reference's NN-data pipeline,
    `TheFeedingPipeline/NeuNetværk_test.py:100-101`) pass
    A_s/A_s_reference here and reuse one compiled program for every member.
    """
    nmesh, box = spec.nmesh, spec.box
    wk = white_noise_k(key, nmesh)
    km = kmag(nmesh, box, rfft=True, dtype=wk.real.dtype)
    V = box**3
    amp2 = amplitude * power(km) * (nmesh**3 / V)
    if spec.convention == "fac":
        amp2 = amp2 * (2.0 * np.pi)
    amp = jnp.sqrt(jnp.maximum(amp2, 0.0))
    amp = amp.at[0, 0, 0].set(0.0)  # zero the DC mode (mean overdensity 0)
    return wk * amp


def gaussian_field(key, spec: GRFSpec, power: Callable, amplitude=1.0):
    """Real-space delta(x) realization, shape (nmesh,)*3."""
    return jnp.fft.irfftn(
        gaussian_delta_k(key, spec, power, amplitude), s=(spec.nmesh,) * 3
    )
