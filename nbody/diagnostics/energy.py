"""On-device conservation diagnostics.

The reference has **no** energy/momentum diagnostics anywhere (SURVEY.md
§5.5) — its quality signal is P(k)-vs-theory plots.  The rebuild's north
star requires |dE/E| < 1e-4 over 10k steps, so these are first-class:
every quantity is a single on-device reduction, usable inside a jitted
scan.  E_pot uses the same Plummer pair kernel as the force
(-G m_i m_j / sqrt(r^2 + eps^2)) so the conserved Hamiltonian is exactly
the one the KDK integrator preserves.
"""

from __future__ import annotations

import jax.numpy as jnp

from nbody.core.types import ParticleState
from nbody.forces.allpairs import direct_potential, direct_acc_chunked


def kinetic_energy(state: ParticleState):
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=-1))


def potential_energy(state: ParticleState, eps: float = 0.0, G: float = 1.0):
    """Dense O(N^2) potential (oracle). For large N use the phi returned by
    the force kernels: E_pot = 0.5 * sum(mass * phi)."""
    if state.n <= 4096:
        return direct_potential(state.pos, state.mass, eps=eps, G=G)
    _, epot = direct_acc_chunked(state.pos, state.mass, eps=eps, G=G)
    return epot


def total_energy(state: ParticleState, eps: float = 0.0, G: float = 1.0):
    return kinetic_energy(state) + potential_energy(state, eps=eps, G=G)


def momentum(state: ParticleState):
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


def angular_momentum(state: ParticleState):
    return jnp.sum(
        state.mass[:, None] * jnp.cross(state.pos, state.vel), axis=0
    )


def center_of_mass(state: ParticleState):
    return jnp.sum(state.mass[:, None] * state.pos, axis=0) / jnp.sum(state.mass)


def energy_drift(e_series):
    """max |E(t) - E(0)| / |E(0)| over a series of total energies."""
    e_series = jnp.asarray(e_series)
    e0 = e_series[0]
    return jnp.max(jnp.abs(e_series - e0) / jnp.abs(e0))


def virial_ratio(state: ParticleState, eps: float = 0.0, G: float = 1.0):
    """-2 E_kin / E_pot; 1 for a system in virial equilibrium."""
    ek = kinetic_energy(state)
    ep = potential_energy(state, eps=eps, G=G)
    return -2.0 * ek / ep
