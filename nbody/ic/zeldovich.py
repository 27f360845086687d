"""1LPT (Zel'dovich) and 2LPT initial conditions (components C4-C5).

Rebuilds the reference's Zel'dovich pipeline (psi_k = i k / k^2 delta_k,
three inverse FFTs, lattice displacement —
`CiC/3D startbetingelser1.py:104-173`, `SnapVsPK/Power_compare.py:323-392`)
plus the 2LPT order that the reference only reaches through CONCEPT
(`realization_options {'LPT': 2}`, `Different_Sizes/Giant.param:70-72`;
compared in `1LPTvs2LPT/1vs2tlptplotter.py`).

TPU-first details: particles are born exactly on lattice nodes, so the
displacement field is read directly off the grid — no scipy
RegularGridInterpolator round-trip like the reference's
`periodic_interpolator` (`Power_compare.py:357-377`).  Everything is one
jitted function of the RNG key; an ensemble of realizations is one vmap.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from nbody.core.cosmology import Cosmology
from nbody.core.types import ParticleState
from nbody.ic.gaussian import GRFSpec, gaussian_delta_k
from nbody.mesh.grids import kvecs, lattice


def _displacement_from_delta_k(delta_k, nmesh: int, box: float):
    """psi_k = i k / k^2 delta_k -> three real displacement grids.

    Gradient kernel with Nyquist planes zeroed (odd multiplier at the
    self-conjugate Nyquist mode would break Hermitian symmetry)."""
    kx, ky, kz = kvecs(
        nmesh, box, rfft=True, dtype=delta_k.real.dtype, zero_nyquist=True
    )
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    shape = (nmesh,) * 3
    psi = [
        jnp.fft.irfftn(1j * kj * inv_k2 * delta_k, s=shape)
        for kj in (kx, ky, kz)
    ]
    return jnp.stack([p.reshape(-1) for p in psi], axis=-1)  # (N^3, 3)


def _second_order_source_k(delta_k, nmesh: int, box: float):
    """rfftn of S = sum_{i<j} [phi,ii phi,jj - phi,ij^2], phi_k = -delta_k/k^2."""
    kx, ky, kz = kvecs(
        nmesh, box, rfft=True, dtype=delta_k.real.dtype, zero_nyquist=True
    )
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    shape = (nmesh,) * 3
    ks = (kx, ky, kz)

    def dij(i, j):
        # phi,ij in real space: -(k_i k_j / k^2) delta_k -> irfftn
        return jnp.fft.irfftn(ks[i] * ks[j] * inv_k2 * delta_k, s=shape)

    dxx, dyy, dzz = dij(0, 0), dij(1, 1), dij(2, 2)
    dxy, dxz, dyz = dij(0, 1), dij(0, 2), dij(1, 2)
    src = dxx * dyy + dxx * dzz + dyy * dzz - dxy**2 - dxz**2 - dyz**2
    return jnp.fft.rfftn(src)


@functools.partial(
    jax.jit, static_argnames=("spec", "power", "cosmo", "order")
)
def lpt_ic(
    key,
    spec: GRFSpec,
    power: Callable,
    cosmo: Cosmology,
    a_init: float,
    order: int = 1,
    particle_mass: float | None = None,
    amplitude=1.0,
) -> ParticleState:
    """Cosmological ICs: lattice + LPT displacement at scale factor a_init.

    Args:
      key: PRNG key.
      spec: GRF spec (nmesh, box, convention).
      power: linear P(k) *at a = 1*; internally scaled by D(a_init).
      cosmo: background cosmology (growth factors, H).
      order: 1 (Zel'dovich) or 2 (2LPT).
      particle_mass: per-particle mass; default gives the box's matter
        mass density rho_crit * Omega_m (cosmo units: 1e10 Msun).
      amplitude: traced P(k) multiplier (A_s/A_s_ref for amplitude-only
        ensembles — avoids one recompile per member).

    Returns ParticleState with comoving pos, canonical momentum
    p = a^2 dx/dt = a^2 H f D psi (per 1LPT growing mode), time = a_init.
    """
    nmesh, box = spec.nmesh, spec.box
    delta1_k = gaussian_delta_k(key, spec, power, amplitude)  # at a=1
    D1 = cosmo.growth_D(a_init)
    f1 = cosmo.growth_f(a_init)
    H = cosmo.H(a_init)
    a = jnp.asarray(a_init, delta1_k.real.dtype)

    psi1 = _displacement_from_delta_k(delta1_k, nmesh, box)
    q = lattice(nmesh, box, dtype=psi1.dtype)

    disp = D1 * psi1
    # p = a^2 dx/dt; dx/dt = dD/dt psi = H f D psi
    mom = (a**2 * H * f1 * D1) * psi1

    if order >= 2:
        # psi2 from the second-order source of the *scaled* field D1 delta1
        src2_k = _second_order_source_k(D1 * delta1_k, nmesh, box)
        psi2 = _displacement_from_delta_k(src2_k, nmesh, box)
        D2 = cosmo.growth_D2(a_init)  # ~ -3/7 D1^2 Om^(-1/143)
        ratio2 = D2 / (D1 * D1)
        f2 = 2.0 * f1  # dlnD2/dlna ~ 2 f1 (exact in EdS)
        disp = disp + ratio2 * psi2
        mom = mom + (a**2 * H * f2 * ratio2) * psi2

    pos = jnp.mod(q + disp, box)

    if particle_mass is None:
        # mean matter density in cosmo units: rho_crit0 = 3 H0^2/(8 pi G)
        from nbody.core import units as u

        rho_crit = 3.0 * cosmo.H0**2 / (8.0 * jnp.pi * u.COSMO.G)
        particle_mass = float(
            rho_crit * cosmo.Omega_m * box**3 / nmesh**3
        )
    mass = jnp.full((nmesh**3,), particle_mass, dtype=pos.dtype)
    return ParticleState(pos=pos, vel=mom, mass=mass, time=a)
