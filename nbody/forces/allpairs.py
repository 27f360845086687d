"""Direct-summation O(N^2) gravity — the jnp reference oracle.

Rebuilds what the reference delegates to CONCEPT's PP solver (selected via
``'gravity': 'pp'`` in param files, reference
`Different_Sizes/Giant.param:66-68`; SURVEY.md §2.2).  This module is the
*correctness oracle*: dense vmapped jnp, exact (masked) self-interaction
handling, works in float64 on host.  The performance path is the Pallas
kernel in :mod:`nbody.forces.pallas_pp`, validated against this one.

Force law (Plummer softening): a_i = G sum_j m_j (x_j - x_i) / (r^2 + eps^2)^{3/2}
Potential (consistent pair kernel): phi_ij = -G m_i m_j / sqrt(r^2 + eps^2)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pair_terms(pos_i, pos_j, mass_j, eps2):
    """Per-target accelerations and potentials from a block of sources.

    pos_i: (Ni, 3); pos_j: (Nj, 3); mass_j: (Nj,).
    Returns acc (Ni, 3) [without G], pot (Ni,) [without -G, per unit mass_i].
    Self-pairs (identical positions) contribute zero force but DO contribute
    -G m / eps to the potential; callers mask or subtract them.
    """
    d = pos_j[None, :, :] - pos_i[:, None, :]          # (Ni, Nj, 3)
    r2 = jnp.sum(d * d, axis=-1) + eps2                # (Ni, Nj)
    inv_r = jax.lax.rsqrt(r2)
    inv_r3 = inv_r / r2
    w = mass_j[None, :] * inv_r3                       # (Ni, Nj)
    acc = jnp.einsum("ij,ijk->ik", w, d)
    pot = jnp.sum(mass_j[None, :] * inv_r, axis=1)
    return acc, pot


def direct_acc(pos, mass, eps: float = 0.0, G: float = 1.0):
    """Dense all-pairs acceleration, exact self-masking. O(N^2) memory."""
    n = pos.shape[0]
    d = pos[None, :, :] - pos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, pos.dtype) ** 2
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, 1.0, r2)                       # avoid 0^(-3/2) at eps=0
    inv_r3 = jnp.where(eye, 0.0, r2 ** (-1.5))
    w = mass[None, :] * inv_r3
    return G * jnp.einsum("ij,ijk->ik", w, d)


def direct_potential(pos, mass, eps: float = 0.0, G: float = 1.0):
    """Total potential energy E_pot = -G sum_{i<j} m_i m_j / sqrt(r^2+eps^2)."""
    n = pos.shape[0]
    d = pos[None, :, :] - pos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, pos.dtype) ** 2
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, 1.0, r2)
    inv_r = jnp.where(eye, 0.0, jax.lax.rsqrt(r2))
    pair = mass[:, None] * mass[None, :] * inv_r
    return -0.5 * G * jnp.sum(pair)


@functools.partial(jax.jit, static_argnames=("eps", "G", "chunk"))
def direct_acc_chunked(pos, mass, eps: float = 0.0, G: float = 1.0, chunk: int = 1024):
    """All-pairs acceleration + E_pot with O(chunk * N) memory via lax.map.

    Oracle for N too large for the dense (N,N,3) tensor (e.g. 65k).
    For eps > 0 the self-pair adds zero force and a known m_i/eps potential
    term that is subtracted; for eps == 0 zero-distance pairs are masked.
    """
    n = pos.shape[0]
    npad = -(-n // chunk) * chunk
    pos_p = jnp.pad(pos, ((0, npad - n), (0, 0)))
    blocks = pos_p.reshape(npad // chunk, chunk, 3)

    def one_block(pos_i):
        if eps > 0:
            return _pair_terms(pos_i, pos, mass, jnp.asarray(eps, pos.dtype) ** 2)
        d = pos[None, :, :] - pos_i[:, None, :]
        r2 = jnp.sum(d * d, axis=-1)
        inv_r = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
        inv_r3 = inv_r**3
        w = mass[None, :] * inv_r3
        acc = jnp.einsum("ij,ijk->ik", w, d)
        pot = jnp.sum(mass[None, :] * inv_r, axis=1)
        return acc, pot

    acc, pot = jax.lax.map(one_block, blocks)
    acc = acc.reshape(npad, 3)[:n] * G
    pot = pot.reshape(npad)[:n]
    if eps > 0:
        pot = pot - mass / jnp.asarray(eps, pos.dtype)  # strip self-term
    pot = -G * mass * pot
    return acc, 0.5 * jnp.sum(pot)


def direct_acc_periodic(pos, mass, box: float, eps: float = 0.0, G: float = 1.0):
    """Dense all-pairs acceleration with periodic minimum-image separations.

    Nearest-image only (no Ewald sum) — the oracle for the periodic Pallas
    kernel (``allpairs_pallas(..., box=L)``) used by the cosmological PP
    solver.  O(N^2) memory.
    """
    n = pos.shape[0]
    d = pos[None, :, :] - pos[:, None, :]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, pos.dtype) ** 2
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, 1.0, r2)
    inv_r3 = jnp.where(eye, 0.0, r2 ** (-1.5))
    w = mass[None, :] * inv_r3
    return G * jnp.einsum("ij,ijk->ik", w, d)
