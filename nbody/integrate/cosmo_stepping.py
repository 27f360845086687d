"""Comoving-coordinate KDK stepping in the scale factor a.

The reference relies on CONCEPT for cosmological time integration
(a_begin = 0.02 -> 1.00 in ~142 adaptive steps, see the run log cited in
SURVEY.md §0/§6).  Here the comoving equations of motion are integrated
directly, the TPU way: exact kick/drift factors are pre-integrated on the
host (numpy, once) and fed to a jitted ``lax.scan`` as per-step arrays.

Conventions (standard comoving N-body, e.g. FastPM/Quinn et al.):
  x  — comoving position;   p = a^2 dx/dt  (canonical velocity per mass)
  dx/da = p / (a^3 H(a)),   dp/da = g(x, a) / (a H(a))
  g = -grad phi,  with  lap phi = (3/2) Omega_m H0^2 delta / a.

A KDK step over [a0, a1] with midpoint am uses exact factors
  K1 = int_{a0}^{am} da/(a H),  Dr = int_{a0}^{a1} da/(a^3 H),
  K2 = int_{am}^{a1} da/(a H),
so the integrator is symplectic in the (x, p) variables for each fixed a.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from nbody.core.cosmology import Cosmology
from nbody.core.types import ParticleState

CosmoForceFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def cosmo_kick_drift_factors(cosmo: Cosmology, a_grid: np.ndarray):
    """Host-side exact kick/drift factors for each step of ``a_grid``.

    Returns (K1, Dr, K2, a_mid) — numpy arrays of length len(a_grid)-1.
    Integrals are evaluated by high-resolution trapezoid in log a.
    """
    a_grid = np.asarray(a_grid, dtype=np.float64)
    H0 = float(cosmo.H0)
    Om, OL = float(cosmo.Omega_m), float(cosmo.Omega_L)

    def H(a):
        return H0 * np.sqrt(Om / a**3 + OL)

    def integrate(f, lo, hi, n=256):
        # trapezoid in log a: int f da = int f a dln a
        lna = np.linspace(np.log(lo), np.log(hi), n)
        a = np.exp(lna)
        return np.trapezoid(f(a) * a, lna)

    a0s, a1s = a_grid[:-1], a_grid[1:]
    ams = np.sqrt(a0s * a1s)  # geometric midpoint (log-uniform stepping)
    K1 = np.array([integrate(lambda a: 1 / (a * H(a)), lo, m) for lo, m in zip(a0s, ams)])
    K2 = np.array([integrate(lambda a: 1 / (a * H(a)), m, hi) for m, hi in zip(ams, a1s)])
    Dr = np.array([integrate(lambda a: 1 / (a**3 * H(a)), lo, hi) for lo, hi in zip(a0s, a1s)])
    return K1, Dr, K2, ams


@functools.partial(jax.jit, static_argnames=("acc_fn",))
def _run_scan(state: ParticleState, xs, box, acc_fn: CosmoForceFn) -> ParticleState:
    g0 = acc_fn(state.pos, state.mass, state.time)

    def body(carry, x):
        st, g = carry
        a0, a1, k1, dr, k2 = x
        p_half = st.vel + g * k1
        pos_new = jnp.mod(st.pos + p_half * dr, box)
        g_new = acc_fn(pos_new, st.mass, a1)
        p_new = p_half + g_new * k2
        st = st.replace(pos=pos_new, vel=p_new, time=a1)
        return (st, g_new), None

    (final, _), _ = jax.lax.scan(body, (state, g0), xs)
    return final


def run_cosmological(
    state: ParticleState,
    cosmo: Cosmology,
    a_grid,
    acc_fn: CosmoForceFn,
    box: float,
) -> ParticleState:
    """Integrate comoving KDK from a_grid[0] to a_grid[-1].

    ``acc_fn(pos, mass, a) -> g`` must return the canonical-momentum force
    -grad(phi) (e.g. :func:`nbody.forces.pm.pm_cosmo_force`).
    ``state.vel`` must hold p = a^2 dx/dt; ``state.time`` the current a.
    """
    a_grid = np.asarray(a_grid, dtype=np.float64)
    K1, Dr, K2, _ = cosmo_kick_drift_factors(cosmo, a_grid)
    dtype = state.pos.dtype
    xs = (
        jnp.asarray(a_grid[:-1], dtype),
        jnp.asarray(a_grid[1:], dtype),
        jnp.asarray(K1, dtype),
        jnp.asarray(Dr, dtype),
        jnp.asarray(K2, dtype),
    )
    return _run_scan(state, xs, jnp.asarray(box, dtype), acc_fn)


def log_a_steps(a_begin: float, a_end: float, n_steps: int) -> np.ndarray:
    """Log-uniform scale-factor grid (CONCEPT-style stepping from
    a_begin=0.02, reference `Different_Sizes/Giant.param` a_begin)."""
    return np.geomspace(a_begin, a_end, n_steps + 1)
