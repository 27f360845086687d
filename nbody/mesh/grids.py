"""Fourier-grid and lattice helpers shared by mesh ops, ICs, and PM."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def kvecs(nmesh: int, box: float, rfft: bool = True, dtype=jnp.float32):
    """Angular wavevector component arrays for an nmesh^3 box of side
    ``box``: k_i = 2 pi n_i / box (the reference's convention,
    `SnapVsPK/Power_compare.py` k_vals = 2 pi fftfreq(N, d=L/N)).

    Returns (kx, ky, kz) broadcastable to the (r)fft grid shape.
    """
    two_pi = 2.0 * np.pi
    k1 = jnp.asarray(np.fft.fftfreq(nmesh, d=box / nmesh) * two_pi, dtype)
    kz = (
        jnp.asarray(np.fft.rfftfreq(nmesh, d=box / nmesh) * two_pi, dtype)
        if rfft
        else k1
    )
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
    return jnp.asarray(w, dtype)[None, None, :]


def lattice(nmesh: int, box: float, dtype=jnp.float32):
    """(nmesh^3, 3) particle lattice on grid nodes (the reference's
    linspace(0, L, N, endpoint=False) meshgrid,
    `SnapVsPK/Power_compare.py:346-352`)."""
    x = jnp.asarray(np.arange(nmesh) * (box / nmesh), dtype)
    X, Y, Z = jnp.meshgrid(x, x, x, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
