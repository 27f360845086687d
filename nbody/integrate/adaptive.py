"""Adaptive time-stepping (the TPU counterpart of CONCEPT's rungs).

CONCEPT integrates with per-particle adaptive rungs — its run logs show
"Rung population: matter: 31147, 1157, 464" (reference
`TheFeedingPipeline/Datafolder4/TrainingVal_Concept/id0000…/params….log`,
SURVEY.md §0).  Per-particle rungs only pay off when the force for the
*inactive* majority can be skipped; a dense all-pairs TPU kernel computes
every row at the same cost, so the idiomatic equivalent here is

  * a **global adaptive step**: dt = eta * sqrt(eps / max |a|), the
    standard collisionless criterion, chosen on device inside a
    ``lax.while_loop`` (zero host round-trips, honours an exact t_end);
  * **rung diagnostics** with CONCEPT's rung semantics (rung r wants
    dt/2^r), so runs can report the same "rung population" observable.

The whole loop is one jitted program; cold-collapse configs that need
1000x smaller steps at core bounce just take them.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from nbody.core.types import ParticleState


def required_dt(acc, eps: float, eta: float = 0.025):
    """Per-particle step demand: dt_i = eta * sqrt(eps / |a_i|)."""
    amag = jnp.linalg.norm(acc, axis=-1)
    return eta * jnp.sqrt(eps / jnp.maximum(amag, 1e-30))


def rung_population(acc, dt_base: float, eps: float, eta: float = 0.025, n_rungs: int = 8):
    """How many particles want rung r (dt_base / 2^r) — the observable
    CONCEPT logs per step.  Returns an (n_rungs,) int array."""
    dt_req = required_dt(acc, eps, eta)
    r = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(dt_base / dt_req, 1.0))), 0, n_rungs - 1
    ).astype(jnp.int32)
    return jnp.bincount(r, length=n_rungs)


class AdaptiveResult(NamedTuple):
    state: ParticleState
    n_steps: jax.Array  # scalar int32 — steps actually taken
    dt_min: jax.Array  # smallest step used
    dt_max: jax.Array  # largest step used


@functools.partial(
    jax.jit,
    static_argnames=("acc_fn", "eps", "eta", "max_steps"),
)
def run_adaptive(
    state: ParticleState,
    t_end,
    acc_fn: Callable,
    eps: float,
    eta: float = 0.025,
    dt_limit: float = jnp.inf,
    max_steps: int = 100_000,
) -> AdaptiveResult:
    """KDK with a globally adaptive dt until ``t_end`` (exact arrival).

    ``acc_fn(pos, mass) -> (acc, phi)`` as in nbody.integrate.run.  The
    step is the minimum particle demand (so it shrinks through close
    encounters / collapse), capped by ``dt_limit`` and by the remaining
    time; ``max_steps`` bounds the while_loop for compilation.
    """
    t_end = jnp.asarray(t_end, state.pos.dtype)
    acc0, _ = acc_fn(state.pos, state.mass)

    def cond(carry):
        st, _acc, n, _dmin, _dmax = carry
        return jnp.logical_and(st.time < t_end, n < max_steps)

    def body(carry):
        st, acc, n, dmin, dmax = carry
        dt = jnp.min(required_dt(acc, eps, eta))
        dt = jnp.minimum(jnp.minimum(dt, dt_limit), t_end - st.time)
        v_half = st.vel + 0.5 * dt * acc
        pos_new = st.pos + dt * v_half
        acc_new, _ = acc_fn(pos_new, st.mass)
        vel_new = v_half + 0.5 * dt * acc_new
        st = st.replace(pos=pos_new, vel=vel_new, time=st.time + dt)
        return (st, acc_new, n + 1, jnp.minimum(dmin, dt), jnp.maximum(dmax, dt))

    big = jnp.asarray(jnp.inf, state.pos.dtype)
    st, _, n, dmin, dmax = jax.lax.while_loop(
        cond, body, (state, acc0, jnp.int32(0), big, -big)
    )
    return AdaptiveResult(state=st, n_steps=n, dt_min=dmin, dt_max=dmax)
