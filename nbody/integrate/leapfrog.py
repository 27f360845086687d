"""KDK (kick-drift-kick) leapfrog integration as a single jitted lax.scan.

The reference delegates time integration entirely to CONCEPT (KDK with
adaptive rungs, e.g. the "Rung population" lines in its run logs — see
SURVEY.md §0 and §2.2).  Here the whole run is one ``jax.lax.scan`` over a
symplectic KDK step with the acceleration carried between steps (one force
evaluation per step), zero host round-trips, compiled once by XLA.

The force callback has signature ``acc_fn(pos, mass) -> (acc, phi)`` where
``phi`` is the per-particle potential (used for on-device energy
diagnostics; return zeros if unavailable).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from nbody.core.types import ParticleState

ForceFn = Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]


class StepDiagnostics(NamedTuple):
    """Per-step on-device reductions (new vs reference; SURVEY.md §5.5)."""

    time: jax.Array
    e_kin: jax.Array
    e_pot: jax.Array
    momentum: jax.Array       # (3,)
    angular_momentum: jax.Array  # (3,)
    com: jax.Array            # (3,)


def _diagnostics(state: ParticleState, phi) -> StepDiagnostics:
    m = state.mass
    v = state.vel
    e_kin = 0.5 * jnp.sum(m * jnp.sum(v * v, axis=-1))
    e_pot = 0.5 * jnp.sum(m * phi)
    mom = jnp.sum(m[:, None] * v, axis=0)
    ang = jnp.sum(m[:, None] * jnp.cross(state.pos, v), axis=0)
    com = jnp.sum(m[:, None] * state.pos, axis=0) / jnp.sum(m)
    return StepDiagnostics(state.time, e_kin, e_pot, mom, ang, com)


def kdk_step(state: ParticleState, acc, dt, acc_fn: ForceFn):
    """One KDK step given the acceleration at the current positions.

    Returns (new_state, new_acc, new_phi).
    """
    dt = jnp.asarray(dt, state.pos.dtype)
    v_half = state.vel + 0.5 * dt * acc
    pos_new = state.pos + dt * v_half
    acc_new, phi_new = acc_fn(pos_new, state.mass)
    vel_new = v_half + 0.5 * dt * acc_new
    new_state = state.replace(pos=pos_new, vel=vel_new, time=state.time + dt)
    return new_state, acc_new, phi_new


@functools.partial(jax.jit, static_argnames=("acc_fn", "n_steps"))
def run(state: ParticleState, dt, n_steps: int, acc_fn: ForceFn) -> ParticleState:
    """Integrate n_steps of KDK; returns only the final state."""
    acc0, _ = acc_fn(state.pos, state.mass)

    def body(carry, _):
        st, acc = carry
        st, acc, _ = kdk_step(st, acc, dt, acc_fn)
        return (st, acc), None

    (final, _), _ = jax.lax.scan(body, (state, acc0), None, length=n_steps)
    return final


@functools.partial(
    jax.jit, static_argnames=("acc_fn", "n_steps", "diag_every")
)
def run_with_diagnostics(
    state: ParticleState,
    dt,
    n_steps: int,
    acc_fn: ForceFn,
    diag_every: int = 1,
):
    """Integrate and collect StepDiagnostics every ``diag_every`` steps.

    The diagnostics are pure on-device reductions stacked by scan — the
    host sees one transfer at the end.
    """
    assert n_steps % diag_every == 0
    acc0, phi0 = acc_fn(state.pos, state.mass)

    def inner(carry, _):
        st, acc = carry
        st, acc, phi = kdk_step(st, acc, dt, acc_fn)
        return (st, acc), phi

    def outer(carry, _):
        carry, phis = jax.lax.scan(inner, carry, None, length=diag_every)
        st, _ = carry
        return carry, _diagnostics(st, phis[-1])

    carry = (state, acc0)
    carry, diags = jax.lax.scan(outer, carry, None, length=n_steps // diag_every)
    final, _ = carry
    init_diag = _diagnostics(state, phi0)
    return final, init_diag, diags
