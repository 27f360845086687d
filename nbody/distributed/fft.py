"""Transpose-decomposed distributed FFT over a 1-D device mesh.

The TPU-native replacement for CONCEPT's FFTW-MPI (the reference configures
its wisdom at `Different_Sizes/Giant.param:25-27`; FFTW-MPI internally
slab-decomposes and exchanges transposes between ranks).  Here the real
grid lives x-slab-sharded over the mesh axis and the 3-D transform is

  local rfft over z  ->  local fft over y  ->  ``all_to_all`` transpose
  (y scatters, x gathers)  ->  local fft over x,

so every butterfly is a full on-device 1-D FFT and the only collective is
one tiled ``all_to_all`` of the half-complex grid riding ICI.  The k-space
result is **y-sharded** ("transposed order" — FFTW-MPI's
``FFTW_MPI_TRANSPOSED_OUT``, which CONCEPT also uses); Poisson multipliers
are applied in that layout with :func:`kvecs_slab`, and the inverse runs
the conjugate path back to x-slabs.

All functions here are *local* shard_map bodies: call them inside a
``shard_map`` over a 1-D mesh axis (see nbody.distributed.domain for the
production user).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def slab_rfftn(grid_l, axis_name: str):
    """Forward distributed rfftn of an x-slab-sharded real grid.

    ``grid_l``: (X/D, Y, Z) local real slab (global grid (X, Y, Z) sharded
    on axis 0 in device order).  Returns the local (X, Y/D, Z//2+1)
    complex block of the global rfftn, sharded on axis 1 (transposed
    order).
    """
    h = jnp.fft.rfft(grid_l, axis=2)
    h = jnp.fft.fft(h, axis=1)
    h = jax.lax.all_to_all(h, axis_name, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(h, axis=0)


def slab_irfftn(hk_l, nmesh: int, axis_name: str):
    """Inverse of :func:`slab_rfftn`.

    ``hk_l``: (X, Y/D, Z//2+1) local y-sharded k-block; returns the
    (X/D, Y, Z) local real x-slab.
    """
    h = jnp.fft.ifft(hk_l, axis=0)
    h = jax.lax.all_to_all(h, axis_name, split_axis=0, concat_axis=1, tiled=True)
    h = jnp.fft.ifft(h, axis=1)
    return jnp.fft.irfft(h, n=nmesh, axis=2)


def kvecs_slab(nmesh: int, box: float, d, n_dev: int, dtype=jnp.float32):
    """Wavevector components for the transposed (y-sharded) k layout.

    ``d`` is the device's index along the mesh axis (traced scalar from
    ``jax.lax.axis_index``).  Returns (kx (X,1,1), ky (1,Y/D,1),
    kz (1,1,Zr)) — ky is the device's slice of the global fftfreq row.
    """
    two_pi = 2.0 * np.pi
    k1 = jnp.asarray(np.fft.fftfreq(nmesh, d=box / nmesh) * two_pi, dtype)
    kz = jnp.asarray(
        np.fft.rfftfreq(nmesh, d=box / nmesh) * two_pi, dtype
    )
    nyl = nmesh // n_dev
    ky = jax.lax.dynamic_slice_in_dim(k1, d * nyl, nyl)
    return k1[:, None, None], ky[None, :, None], kz[None, None, :]


def slab_filter(radial_fn, nmesh: int, box: float, d, n_dev: int, dtype):
    """Evaluate an isotropic k-space multiplier on the transposed layout.

    ``radial_fn(k2) -> F`` maps |k|^2 (same dtype array) to the filter
    value; used for Poisson 1/k^2, Gaussian/spline split filters, and the
    CIC deconvolution is separable so it goes through kvecs_slab directly.
    """
    kx, ky, kz = kvecs_slab(nmesh, box, d, n_dev, dtype)
    return radial_fn(kx**2 + ky**2 + kz**2)
