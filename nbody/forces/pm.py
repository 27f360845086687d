"""Particle-Mesh (PM) gravity solver: CIC deposit -> FFT Poisson -> k-space
gradient -> CIC gather.

TPU-native replacement for CONCEPT's PM solver (Cython/C + FFTW + MPI; the
reference selects it via ``'gravity': 'pm'`` with
``potential_options['gridsize']`` — `TheFeedingPipeline/NN.param:53-77`,
`SnapVsPK/Uncertain.param:66-90`; SURVEY.md §2.2).  The FFT is a single
``jnp.fft.rfftn`` that XLA executes on the MXU-adjacent units and can shard
over a device mesh; deposit/gather are the vectorized CIC ops from
:mod:`nbody.mesh.cic`; deconvolution and interlacing are k-space
multipliers exactly like CONCEPT's "second interlacing pass" log lines.

Two source modes:
  * Newtonian periodic:  lap phi = 4 pi G (rho - rho_mean)
  * Comoving cosmological (canonical momenta, see
    nbody.integrate.cosmo_stepping):  lap phi = (3/2) Omega_m H0^2 delta / a
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbody.core.cosmology import Cosmology
from nbody.mesh.cic import (
    cic_deposit,
    cic_deposit_interlaced_k,
    cic_gather,
    cic_window,
)
from nbody.mesh.grids import kvecs


@functools.partial(
    jax.jit,
    static_argnames=("box", "nmesh", "deconvolve_p", "interlace"),
)
def pm_potential_k(
    pos,
    mass,
    box: float,
    nmesh: int,
    deconvolve_p: int = 2,
    interlace: bool = False,
):
    """-delta_k / k^2 on the rfft grid (unit source strength), from CIC
    deposit of the particles.  delta is the mass overdensity; the DC mode
    is zeroed (background subtraction — Jeans swindle)."""
    if interlace:
        rho_k = cic_deposit_interlaced_k(pos, box, nmesh, weights=mass)
    else:
        rho_k = jnp.fft.rfftn(cic_deposit(pos, box, nmesh, weights=mass))
    mean_mass_per_cell = jnp.sum(mass) / nmesh**3
    delta_k = rho_k / mean_mass_per_cell  # delta_k + N^3*delta(k); DC fixed below

    if deconvolve_p:
        W = cic_window(nmesh, box, p=deconvolve_p, dtype=pos.dtype)
        delta_k = delta_k / jnp.maximum(W, 1e-8)

    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=pos.dtype)
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    phi_k = -delta_k * inv_k2           # zero at k=0: background removed
    return phi_k


def gradient_kernel(nmesh: int, box: float, order: str, dtype):
    """k-space differentiation kernels (kx, ky, kz replacements).

    * "spectral": i k — exact for band-limited fields but Gibbs-rings
      badly on particle (delta-like) sources: the force spectrum decays
      only as 1/k. Kept for smooth-field use.
    * "fd2": i sin(k h)/h — 2-point centered difference.
    * "fd4": i (8 sin(k h) - sin(2 k h)) / (6 h) — 4-point difference,
      the kernel CONCEPT/Gadget-class PM solvers use ("diff_order" in
      CONCEPT's force options).  Default.

    The sin-based kernels vanish at the Nyquist plane automatically, which
    is also the correct Hermitian-symmetry treatment.
    """
    h = box / nmesh
    kx, ky, kz = kvecs(
        nmesh, box, rfft=True, dtype=dtype, zero_nyquist=(order == "spectral")
    )
    if order == "spectral":
        return kx, ky, kz
    if order == "fd2":
        return tuple(jnp.sin(k * h) / h for k in (kx, ky, kz))
    if order == "fd4":
        return tuple(
            (8.0 * jnp.sin(k * h) - jnp.sin(2.0 * k * h)) / (6.0 * h)
            for k in (kx, ky, kz)
        )
    raise ValueError(f"unknown gradient kernel {order!r}")


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "nmesh", "deconvolve_p", "interlace", "longrange_split", "grad_order",
    ),
)
def _pm_acc_impl(
    pos,
    mass,
    source_amp,
    box: float,
    nmesh: int,
    deconvolve_p: int,
    interlace: bool,
    longrange_split: float,
    grad_order: str = "fd4",
):
    """acc_i = -grad phi(x_i) with lap phi = source_amp * delta.

    ``longrange_split`` > 0 multiplies the potential by the Ewald-style
    Gaussian filter exp(-k^2 r_s^2) (used by P3M's far field).
    """
    phi_k = pm_potential_k(
        pos, mass, box, nmesh, deconvolve_p=deconvolve_p, interlace=interlace
    )
    phi_k = phi_k * source_amp
    if longrange_split > 0.0:
        kxs, kys, kzs = kvecs(nmesh, box, rfft=True, dtype=pos.dtype)
        k2 = kxs**2 + kys**2 + kzs**2
        phi_k = phi_k * jnp.exp(-k2 * (longrange_split**2))
    kx, ky, kz = gradient_kernel(nmesh, box, grad_order, pos.dtype)

    shape = (nmesh,) * 3
    acc = []
    for kj in (kx, ky, kz):
        # force = -grad phi -> F_k = -i k_j phi_k
        fj = jnp.fft.irfftn(-1j * kj * phi_k, s=shape)
        acc.append(cic_gather(fj, pos, box))
    return jnp.stack(acc, axis=-1)


def pm_acc(
    pos,
    mass,
    box: float,
    nmesh: int,
    G: float = 1.0,
    deconvolve_p: int = 2,
    interlace: bool = False,
    longrange_split: float = 0.0,
):
    """Newtonian periodic PM acceleration.

    lap phi = 4 pi G (rho - rho_mean); rho = mass / cell volume. The source
    amplitude entering the delta-Poisson solve is
    4 pi G rho_mean = 4 pi G M_tot / V.
    """
    V = box**3
    amp = 4.0 * jnp.pi * G * jnp.sum(mass) / V
    return _pm_acc_impl(
        pos, mass, amp, box, nmesh, deconvolve_p, interlace, longrange_split
    )


def make_pm_cosmo_force(
    cosmo: Cosmology,
    box: float,
    nmesh: int,
    deconvolve_p: int = 2,
    interlace: bool = False,
):
    """Factory for the comoving canonical-momentum force
    g(pos, mass, a) = -grad phi, lap phi = (3/2) Omega_m H0^2 delta / a —
    plugs straight into nbody.integrate.run_cosmological."""
    base = 1.5 * cosmo.Omega_m * cosmo.H0**2

    def acc_fn(pos, mass, a):
        amp = base / jnp.asarray(a, pos.dtype)
        return _pm_acc_impl(
            pos, mass, amp, box, nmesh, deconvolve_p, interlace, 0.0
        )

    return acc_fn
