"""Slab-resident LPT initial conditions (memory-scaling IC realization).

The single-device realizer (`nbody.ic.zeldovich.lpt_ic`) materialises the
full N-particle state on one device, so for domain runs the driver pays an
O(N) host pass at t=0 — the one remaining non-N/D step of the multi-chip
path.  Here every stage is slab-local under one ``shard_map``: each device
draws the white noise of its own x-slab, the rfftn/irfftn ride the
transpose-decomposed distributed FFT (`nbody.distributed.fft`), the
displacement grids come back x-slab-sharded, and the born particles are
re-homed with one ``slab_exchange`` — per-device memory stays ~N/D
throughout.

Seeding: device d draws from ``fold_in(key, d)``, so a domain realization
with the same seed is a *different* (equally valid, deterministic) sample
of the same Gaussian ensemble than the single-device realizer — the
contract is statistical (the realized spectrum matches the input P(k); the
parity tests pin that), not bitwise.

Reference role: CONCEPT realizes ICs under the same MPI domain
decomposition as the integrator (its run logs show the 1LPT realization
after "Domain decomposition"); the reference's own scripts realize on one
process (`CiC/3D startbetingelser1.py:104-173`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from nbody.core.cosmology import Cosmology
from nbody.core.types import ParticleState
from nbody.distributed.domain import slab_exchange
from nbody.distributed.fft import kvecs_slab, slab_irfftn, slab_rfftn
from nbody.ic.gaussian import GRFSpec


def _grad_psi_slab(delta_k, nmesh, box, d, n_dev, axis_name):
    """psi_j = irfftn(i k_j / k^2 delta_k) on the transposed k layout,
    Nyquist planes zeroed (cf. `nbody.ic.zeldovich.
    _displacement_from_delta_k`).  Returns (nxl, nmesh, nmesh, 3)."""
    dtype = delta_k.real.dtype
    kx, ky, kz = kvecs_slab(nmesh, box, d, n_dev, dtype)
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    k_ny = jnp.asarray(np.pi * nmesh / box, dtype) * (1.0 - 1e-6)
    psi = [
        slab_irfftn(
            1j * jnp.where(jnp.abs(kj) > k_ny, 0.0, kj) * inv_k2 * delta_k,
            nmesh, axis_name,
        )
        for kj in (kx, ky, kz)
    ]
    return jnp.stack(psi, axis=-1)


def _second_order_source_k_slab(delta_k, nmesh, box, d, n_dev, axis_name):
    """Distributed form of `nbody.ic.zeldovich._second_order_source_k`:
    S = sum_{i<j} [phi,ii phi,jj - phi,ij^2] with phi_k = -delta_k/k^2;
    the six phi,ij products are slab-local."""
    dtype = delta_k.real.dtype
    kx, ky, kz = kvecs_slab(nmesh, box, d, n_dev, dtype)
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    k_ny = jnp.asarray(np.pi * nmesh / box, dtype) * (1.0 - 1e-6)
    ks = [jnp.where(jnp.abs(kj) > k_ny, 0.0, kj) for kj in (kx, ky, kz)]

    def dij(i, j):
        return slab_irfftn(ks[i] * ks[j] * inv_k2 * delta_k, nmesh,
                           axis_name)

    dxx, dyy, dzz = dij(0, 0), dij(1, 1), dij(2, 2)
    dxy, dxz, dyz = dij(0, 1), dij(0, 2), dij(1, 2)
    src = dxx * dyy + dxx * dzz + dyy * dzz - dxy**2 - dxz**2 - dyz**2
    return slab_rfftn(src, axis_name)


def lpt_ic_domain(
    key,
    spec: GRFSpec,
    power,
    cosmo: Cosmology,
    a_init: float,
    mesh: Mesh,
    *,
    order: int = 1,
    particle_mass: float | None = None,
    amplitude=1.0,
    axis_name: str = "shard",
    headroom: float = 1.3,
    exchange_capacity: int | None = None,
) -> tuple[ParticleState, jax.Array]:
    """Slab-resident LPT ICs over a 1-D device mesh.

    Same physics as `nbody.ic.zeldovich.lpt_ic` (lattice + 1LPT/2LPT
    displacement, canonical momentum a^2 H f D psi) computed entirely
    slab-local; returns (state, exchange_overflow) where ``state`` has
    D * C rows block-sharded over the mesh (C = headroom * born-per-slab
    slots; empty slots carry mass 0, parked at the slab centre — the
    layout `nbody.distributed.domain.domain_decompose` produces) and the
    overflow counts particles whose LPT displacement crossed more than
    one slab (0 for any sane spec).
    """
    nmesh, box = spec.nmesh, spec.box
    D = mesh.shape[axis_name]
    if nmesh % D:
        raise ValueError(f"nmesh={nmesh} not divisible by {D} devices")
    nxl = nmesh // D
    C_born = nxl * nmesh * nmesh
    C = -(-int(headroom * C_born + 8) // 8) * 8
    # every particle of a slab's LOWEST lattice plane sits exactly on the
    # slab boundary, so up to a full nmesh^2 plane (plus coherent
    # large-scale-mode stragglers) can migrate left in one exchange —
    # size the buffers for it, not for the integrator's thin drift shell
    E = exchange_capacity or min(
        C, -(-int(1.25 * nmesh * nmesh + 64) // 8) * 8
    )

    if particle_mass is None:
        rho_crit = 3.0 * cosmo.H0**2 / (8.0 * np.pi)
        from nbody.core import units as u

        rho_crit = rho_crit / u.COSMO.G
        particle_mass = float(
            rho_crit * cosmo.Omega_m * box**3 / nmesh**3
        )

    D1 = float(cosmo.growth_D(a_init))
    f1 = float(cosmo.growth_f(a_init))
    H = float(cosmo.H(a_init))
    a = float(a_init)
    mom1 = a**2 * H * f1 * D1
    if order >= 2:
        D2 = float(cosmo.growth_D2(a_init))
        ratio2 = D2 / (D1 * D1)
        mom2 = a**2 * H * (2.0 * f1) * ratio2

    # raw uint32 key data: extended PRNG dtypes and shard_map sharding
    # don't mix reliably across jax versions
    keys = jax.random.key_data(jax.random.split(key, D))
    V = box**3

    def local(keys_l, amp_l):
        d = jax.lax.axis_index(axis_name)
        dtype = jnp.float32
        w = jax.random.normal(
            jax.random.wrap_key_data(keys_l[0]), (nxl, nmesh, nmesh), dtype
        )
        wk = slab_rfftn(w, axis_name)
        kx, ky, kz = kvecs_slab(nmesh, box, d, D, dtype)
        k2 = kx**2 + ky**2 + kz**2
        km = jnp.sqrt(k2)
        amp2 = amp_l * power(km) * (nmesh**3 / V)
        if spec.convention == "fac":
            amp2 = amp2 * (2.0 * np.pi)
        amp = jnp.sqrt(jnp.maximum(amp2, 0.0))
        amp = jnp.where(k2 > 0, amp, 0.0)  # zero the DC mode
        delta1_k = wk * amp  # at a = 1

        psi1 = _grad_psi_slab(delta1_k, nmesh, box, d, D, axis_name)
        disp = D1 * psi1
        mom = mom1 * psi1
        if order >= 2:
            src2_k = _second_order_source_k_slab(
                D1 * delta1_k, nmesh, box, d, D, axis_name
            )
            psi2 = _grad_psi_slab(src2_k, nmesh, box, d, D, axis_name)
            disp = disp + ratio2 * psi2
            mom = mom + mom2 * psi2

        # local lattice slab
        h = box / nmesh
        xs = (d * nxl + jnp.arange(nxl, dtype=dtype)) * h
        yz = jnp.arange(nmesh, dtype=dtype) * h
        X, Y, Z = jnp.meshgrid(xs, yz, yz, indexing="ij")
        q = jnp.stack([X, Y, Z], axis=-1)
        pos = jnp.mod(
            (q + disp).reshape(C_born, 3), box
        )
        vel = mom.reshape(C_born, 3)

        # pad to C slots (parked, mass 0) then restore residency
        park = jnp.stack(
            [
                (d.astype(dtype) + 0.5) * (box / D),
                jnp.full((), 0.5 * box, dtype),
                jnp.full((), 0.5 * box, dtype),
            ]
        )
        pad = C - C_born
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(park, (pad, 3))], axis=0
        )
        vel = jnp.concatenate([vel, jnp.zeros((pad, 3), dtype)], axis=0)
        mass = jnp.concatenate(
            [
                jnp.full((C_born,), particle_mass, dtype),
                jnp.zeros((pad,), dtype),
            ]
        )
        pos, vel, mass, ov = slab_exchange(
            pos, vel, mass, box=box, ncell=D, n_dev=D,
            exchange_capacity=E, axis_name=axis_name,
        )
        return pos, vel, mass, jax.lax.psum(ov, axis_name)

    run = _shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        check_vma=False,
    )
    pos, vel, mass, ov = jax.jit(run)(
        keys, jnp.asarray(amplitude, jnp.float32)
    )
    state = ParticleState(
        pos=pos, vel=vel, mass=mass, time=jnp.asarray(a, jnp.float32)
    )
    return state, ov
