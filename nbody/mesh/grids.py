"""Fourier-grid and lattice helpers shared by mesh ops, ICs, and PM."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kvecs(
    nmesh: int,
    box: float,
    rfft: bool = True,
    dtype=jnp.float32,
    zero_nyquist: bool = False,
):
    """Angular wavevector component arrays for an nmesh^3 box of side
    ``box``: k_i = 2 pi n_i / box (the reference's convention,
    `SnapVsPK/Power_compare.py` k_vals = 2 pi fftfreq(N, d=L/N)).

    Returns (kx, ky, kz) broadcastable to the (r)fft grid shape.

    ``zero_nyquist=True`` zeros the Nyquist-plane component — REQUIRED for
    spectral differentiation kernels (i k_j): the Nyquist mode is its own
    conjugate partner, so an odd multiplier there breaks the Hermitian
    symmetry of a real field's spectrum and injects O(1) garbage whenever
    the field has Nyquist power (e.g. CIC-deposited point masses).
    """
    two_pi = 2.0 * np.pi
    k1 = np.fft.fftfreq(nmesh, d=box / nmesh) * two_pi
    kzl = np.fft.rfftfreq(nmesh, d=box / nmesh) * two_pi if rfft else k1.copy()
    if zero_nyquist and nmesh % 2 == 0:
        k1 = k1.copy()
        k1[nmesh // 2] = 0.0
        kzl[-1 if rfft else nmesh // 2] = 0.0
    # Resolve the dtype host-side first: asking jnp.asarray for float64 on an
    # f32-only backend emits a truncation UserWarning on every call.
    np_dtype = np.dtype(jax.dtypes.canonicalize_dtype(dtype))
    k1 = jnp.asarray(k1.astype(np_dtype))
    kz = jnp.asarray(kzl.astype(np_dtype))
    return (
        k1[:, None, None],
        k1[None, :, None],
        kz[None, None, :],
    )


def kmag(nmesh: int, box: float, rfft: bool = True, dtype=jnp.float32):
    kx, ky, kz = kvecs(nmesh, box, rfft=rfft, dtype=dtype)
    return jnp.sqrt(kx**2 + ky**2 + kz**2)


def rfft_mode_weights(nmesh: int, dtype=jnp.float32):
    """Multiplicity of each rfft-layout mode in the full fftn grid
    (1 on the kz=0 and kz=Nyquist planes, else 2)."""
    nz = nmesh // 2 + 1
    w = np.full(nz, 2.0)
    w[0] = 1.0
    if nmesh % 2 == 0:
        w[-1] = 1.0
    return jnp.asarray(w.astype(np.dtype(jax.dtypes.canonicalize_dtype(dtype))))[
        None, None, :
    ]


def lattice(nmesh: int, box: float, dtype=jnp.float32):
    """(nmesh^3, 3) particle lattice on grid nodes (the reference's
    linspace(0, L, N, endpoint=False) meshgrid,
    `SnapVsPK/Power_compare.py:346-352`)."""
    x = jnp.asarray(
        (np.arange(nmesh) * (box / nmesh)).astype(
            np.dtype(jax.dtypes.canonicalize_dtype(dtype))
        )
    )
    X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
