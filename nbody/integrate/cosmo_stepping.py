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


@functools.partial(jax.jit, static_argnames=("acc_fn",))
def _run_scan_checked(state: ParticleState, xs, box, acc_fn):
    g0, ov0 = acc_fn(state.pos, state.mass, state.time)

    def body(carry, x):
        st, g, ov = carry
        a0, a1, k1, dr, k2 = x
        p_half = st.vel + g * k1
        pos_new = jnp.mod(st.pos + p_half * dr, box)
        g_new, ov_new = acc_fn(pos_new, st.mass, a1)
        p_new = p_half + g_new * k2
        st = st.replace(pos=pos_new, vel=p_new, time=a1)
        return (st, g_new, jnp.maximum(ov, ov_new)), None

    (final, _, ov), _ = jax.lax.scan(body, (state, g0, ov0), xs)
    return final, ov


def run_cosmological_checked(
    state: ParticleState,
    cosmo: Cosmology,
    a_grid,
    acc_fn,
    box: float,
):
    """Like :func:`run_cosmological` for acc_fns returning
    ``(g, overflow:int32)`` — the max overflow over all force evaluations
    rides the scan carry and comes back with the final state, so a
    clustered state that sheds short-range force INSIDE the scan is
    visible per segment, not just post-run (round-1 VERDICT weak #2)."""
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
    return _run_scan_checked(state, xs, jnp.asarray(box, dtype), acc_fn)


@functools.partial(
    jax.jit,
    static_argnames=(
        "acc_long_fn", "acc_short_fn", "n_sub", "acc_both_fn",
        "frozen_fns", "frozen_both_fn",
    ),
)
def _run_scan_subcycled(state, xs, box, acc_long_fn, acc_short_fn, n_sub,
                        acc_both_fn=None, frozen_fns=None,
                        frozen_both_fn=None):
    if acc_both_fn is not None:
        gs0, gl0, ov0 = acc_both_fn(
            state.pos, state.mass, state.time, state.time
        )
    else:
        gl0 = acc_long_fn(state.pos, state.mass, state.time)
        gs0, ov0 = acc_short_fn(state.pos, state.mass, state.time)

    # frozen column plans (skin reuse): interior subcycle short evals
    # skip the argsort + window tables while every particle stays
    # within skin/2 of the carried plan's freeze positions; the plan
    # refreezes ON DEMAND via lax.cond (early cosmology: one sort per
    # MANY global steps; late clustering: ~one per step).
    if frozen_fns is not None:
        freeze_fn, short_frozen_fn, drift_ok_fn = frozen_fns
        plan0 = freeze_fn(state.pos, state.mass)

        def short_sub(pos, mass, a, plan):
            plan = jax.lax.cond(
                drift_ok_fn(pos, plan),
                lambda pl_: pl_,
                lambda pl_: freeze_fn(pos, mass),
                plan,
            )
            g, o = short_frozen_fn(pos, mass, a, plan)
            return g, o, plan
    else:
        plan0 = jnp.int32(0)  # placeholder carry leaf

        def short_sub(pos, mass, a, plan):
            g, o = acc_short_fn(pos, mass, a)
            return g, o, plan

    def body(carry, x):
        st, gl, gs, ov, plan = carry
        a1, kl1, kl2, ks1, drs, ks2, a_sub = x
        p = st.vel + gl * kl1  # long half-kick (far field frozen)
        pos = st.pos

        def sub(j, c):
            pos, p, gs, ov2, plan = c
            p1 = p + gs * ks1[j]
            pos1 = jnp.mod(pos + p1 * drs[j], box)
            gs1, o, plan = short_sub(pos1, st.mass, a_sub[j], plan)
            p2 = p1 + gs1 * ks2[j]
            return pos1, p2, gs1, jnp.maximum(ov2, o), plan

        if acc_both_fn is None:
            pos, p, gs, ov, plan = jax.lax.fori_loop(
                0, n_sub, sub, (pos, p, gs, ov, plan)
            )
            gl_new = acc_long_fn(pos, st.mass, a1)
        else:
            # the trailing subcycle's short force and the closing long
            # force are both needed at the SAME final positions — one
            # fused evaluation (p3m_acc part='split') serves both; with
            # frozen_both_fn it additionally rides the carried column
            # plan (refrozen on drift demand), so the boundary tick
            # skips the argsort + window tables too
            pos, p, gs, ov, plan = jax.lax.fori_loop(
                0, n_sub - 1, sub, (pos, p, gs, ov, plan)
            )
            j = n_sub - 1
            p = p + gs * ks1[j]
            pos = jnp.mod(pos + p * drs[j], box)
            if frozen_both_fn is not None and frozen_fns is not None:
                freeze_fn, _, drift_ok_fn = frozen_fns
                plan = jax.lax.cond(
                    drift_ok_fn(pos, plan),
                    lambda pl_: pl_,
                    lambda pl_: freeze_fn(pos, st.mass),
                    plan,
                )
                gs, gl_new, o = frozen_both_fn(
                    pos, st.mass, a_sub[j], a1, plan
                )
            else:
                gs, gl_new, o = acc_both_fn(pos, st.mass, a_sub[j], a1)
            ov = jnp.maximum(ov, o)
            p = p + gs * ks2[j]
        p = p + gl_new * kl2
        st = st.replace(pos=pos, vel=p, time=a1)
        return (st, gl_new, gs, ov, plan), None

    (final, _, _, ov, _), _ = jax.lax.scan(
        body, (state, gl0, gs0, ov0, plan0), xs
    )
    return final, ov


def run_cosmological_subcycled(
    state: ParticleState,
    cosmo: Cosmology,
    a_grid,
    acc_long_fn,
    acc_short_fn,
    box: float,
    n_sub: int,
    acc_both_fn=None,
    frozen_fns=None,
    frozen_both_fn=None,
):
    """Split-Hamiltonian KDK: far field at the global step, short range
    subcycled ``n_sub``x inside it.

    The TPU equivalent of CONCEPT's rung subdivision (run-log "Rung
    population" lines,
    `TheFeedingPipeline/.../params_id0000….log:6700-6719`): halo
    particles need short-range kicks at a cadence finer than the
    background step, while the mesh far field is smooth in time.  Every
    global step costs ONE far-field evaluation plus ``n_sub``
    short-range evaluations (the trailing subcycle force is reused as
    the next step's leading one, and positions do not move during the
    long kicks, so no force is ever recomputed at an unchanged
    position).

    ``acc_long_fn(pos, mass, a) -> g``;
    ``acc_short_fn(pos, mass, a) -> (g, overflow:int32)`` (the checked
    protocol).  Optional ``acc_both_fn(pos, mass, a_short, a_long) ->
    (gs, gl, overflow)`` fuses the trailing subcycle's short force with
    the closing long force (same positions, different 1/a scalings) —
    one supercell evaluation instead of a short eval plus a PM eval
    (see p3m_acc part='split').  Optional ``frozen_fns = (freeze_fn,
    short_frozen_fn, drift_ok_fn)`` evaluates interior subcycle short
    forces on a frozen column plan carried across steps and refrozen on
    drift demand (`nbody.forces.p3m_columns.freeze_column_plan` — the
    MD skin trick; the argsort is paid per drift budget, not per
    subcycle).  Optional ``frozen_both_fn(pos, mass, a_s, a_l, plan) ->
    (gs, gl, overflow)`` additionally rides the SAME carried plan for
    the fused boundary tick (`nbody.forces.pm_supercell.
    p3m_supercell_frozen`) — with it, no evaluation anywhere in the
    scan pays the argsort while drift stays inside the skin.  Returns
    (final_state, max overflow).
    """
    a_grid = np.asarray(a_grid, dtype=np.float64)
    n_steps = len(a_grid) - 1
    a0s, a1s = a_grid[:-1], a_grid[1:]
    ams = np.sqrt(a0s * a1s)
    KL1, _, KL2, _ = cosmo_kick_drift_factors(cosmo, a_grid)

    Ks1 = np.empty((n_steps, n_sub))
    Drs = np.empty((n_steps, n_sub))
    Ks2 = np.empty((n_steps, n_sub))
    A_sub = np.empty((n_steps, n_sub))
    for i in range(n_steps):
        sub = np.geomspace(a0s[i], a1s[i], n_sub + 1)
        k1, dr, k2, _ = cosmo_kick_drift_factors(cosmo, sub)
        Ks1[i], Drs[i], Ks2[i] = k1, dr, k2
        A_sub[i] = sub[1:]

    dtype = state.pos.dtype
    xs = (
        jnp.asarray(a1s, dtype),
        jnp.asarray(KL1, dtype),
        jnp.asarray(KL2, dtype),
        jnp.asarray(Ks1, dtype),
        jnp.asarray(Drs, dtype),
        jnp.asarray(Ks2, dtype),
        jnp.asarray(A_sub, dtype),
    )
    return _run_scan_subcycled(
        state, xs, jnp.asarray(box, dtype), acc_long_fn, acc_short_fn,
        int(n_sub), acc_both_fn=acc_both_fn, frozen_fns=frozen_fns,
        frozen_both_fn=frozen_both_fn,
    )


def log_a_steps(a_begin: float, a_end: float, n_steps: int) -> np.ndarray:
    """Log-uniform scale-factor grid (CONCEPT-style stepping from
    a_begin=0.02, reference `Different_Sizes/Giant.param` a_begin)."""
    return np.geomspace(a_begin, a_end, n_steps + 1)


# ---------------------------------------------------------------------------
# Adaptive stepping (production counterpart of CONCEPT's adaptive rungs)
# ---------------------------------------------------------------------------

# 16-point Gauss-Legendre nodes/weights on [0, 1] — on-device kick/drift
# integrals for step intervals chosen at run time (the host-precomputed
# trapezoid of cosmo_kick_drift_factors needs the grid in advance).
_GL_X, _GL_W = np.polynomial.legendre.leggauss(16)
_GL_X = (_GL_X + 1.0) / 2.0
_GL_W = _GL_W / 2.0


def make_adaptive_cosmo_runner(
    cosmo: Cosmology,
    acc_fn,
    box: float,
    cell: float,
    *,
    dla_max: float = 0.03,
    eta_disp: float = 0.25,
    max_steps: int = 32,
    n_rungs: int = 8,
    split_fns=None,
    n_sub: int = 1,
    acc_both_fn=None,
):
    """Build a jitted adaptive KDK chunk runner.

    CONCEPT integrates a = 0.02 -> 1 in ~142 *adaptive* steps with
    per-particle rungs (run log "Rung population: matter: 31147, 1157,
    464", reference `TheFeedingPipeline/.../params_id0000….log:6700-6719`).
    The TPU equivalent chooses a **global** Delta(ln a) per step, fully on
    device inside a ``lax.while_loop``:

      dla = clip(min_i dla_i, dla_max / 2^(n_rungs-1), dla_max),
      dla_i = eta_disp * cell * a^2 H(a) / |p_i|      (drift <= eta*cell)

    capped by the background-expansion limit ``dla_max`` and floored at
    the deepest rung, with exact arrival at the requested a_end.  Exact
    kick/drift factors for the chosen interval are 16-point Gauss-Legendre
    integrals evaluated on device.  The rung observable matches CONCEPT's
    semantics (rung r wants the background step / 2^r); its population
    histogram of the last step comes back for run.log.

    ``acc_fn(pos, mass, a) -> (g, overflow)`` (the checked protocol).
    ``max_steps`` bounds one dispatch — chunk at the host to respect the
    TPU relay's dispatch-length limit and call repeatedly until arrival.

    ``split_fns=(long_fn, short_fn)`` with ``n_sub > 1`` composes the
    adaptive background step with short-range subcycling — CONCEPT's
    actual structure (adaptive global step + rung subdivision): the far
    field kicks at the chosen step's half-points while the short-range
    KDK runs n_sub x inside it, all factors Gauss-Legendre on device.
    Optional ``acc_both_fn(pos, mass, a_short, a_long) -> (gs, gl,
    overflow)`` fuses the trailing subcycle's short force with the
    closing long force (one supercell evaluation), exactly as the
    fixed-grid :func:`run_cosmological_subcycled` does.

    Returns run(state, a_end) ->
    (state, n_steps:int32, overflow:int32, dla_last, rung_hist (n_rungs,)).
    """
    H0, Om, OL = float(cosmo.H0), float(cosmo.Omega_m), float(cosmo.Omega_L)
    dla_floor = dla_max / 2 ** (n_rungs - 1)

    def _H(a):
        return H0 * jnp.sqrt(Om / a**3 + OL)

    def _integrate(f, lo, hi, dtype):
        # int f(a) da = int f(a) a dln a over [lo, hi] by 16-pt GL
        lnl, lnh = jnp.log(lo), jnp.log(hi)
        x = lnl + jnp.asarray(_GL_X, dtype) * (lnh - lnl)
        a = jnp.exp(x)
        return (lnh - lnl) * jnp.sum(jnp.asarray(_GL_W, dtype) * f(a) * a)

    @functools.partial(jax.jit, static_argnames=())
    def run(state: ParticleState, a_end):
        dtype = state.pos.dtype
        a_end = jnp.asarray(a_end, dtype)
        if split_fns is not None and n_sub > 1:
            gl0 = split_fns[0](state.pos, state.mass, state.time)
            gs0, ov0 = split_fns[1](state.pos, state.mass, state.time)
            g0 = (gl0, gs0)
        else:
            g0, ov0 = acc_fn(state.pos, state.mass, state.time)
        hist0 = jnp.zeros((n_rungs,), jnp.int32)

        def demand(st):
            a = st.time
            speed = jnp.linalg.norm(st.vel, axis=-1)  # |p| = a^2 |dx/dt|
            return eta_disp * cell * a**2 * _H(a) / jnp.maximum(speed, 1e-30)

        def cond(carry):
            st, n = carry[0], carry[5]
            return jnp.logical_and(st.time < a_end, n < max_steps)

        def kick_drift(st, g, a0, a1):
            """Plain KDK over [a0, a1] with the combined force."""
            am = jnp.sqrt(a0 * a1)
            k1 = _integrate(lambda a: 1.0 / (a * _H(a)), a0, am, dtype)
            k2 = _integrate(lambda a: 1.0 / (a * _H(a)), am, a1, dtype)
            dr = _integrate(lambda a: 1.0 / (a**3 * _H(a)), a0, a1, dtype)
            p_half = st.vel + g * k1
            pos_new = jnp.mod(st.pos + p_half * dr, box)
            g_new, ov_new = acc_fn(pos_new, st.mass, a1)
            p_new = p_half + g_new * k2
            return st.replace(pos=pos_new, vel=p_new, time=a1), g_new, ov_new

        def kick_drift_sub(st, g, a0, a1):
            """Split step over [a0, a1]: far-field half-kicks around the
            midpoint, short-range KDK subcycled n_sub x inside.  ``g`` is
            the carried (g_long, g_short) pair — positions do not move
            during long kicks, so the trailing subcycle force is reused
            as the next step's leading one."""
            gl, gs = g
            long_fn, short_fn = split_fns
            am = jnp.sqrt(a0 * a1)
            kl1 = _integrate(lambda a: 1.0 / (a * _H(a)), a0, am, dtype)
            kl2 = _integrate(lambda a: 1.0 / (a * _H(a)), am, a1, dtype)
            lnr = (jnp.log(a1) - jnp.log(a0)) / n_sub
            p = st.vel + gl * kl1
            pos = st.pos

            def sub_factors(j):
                b0 = jnp.exp(jnp.log(a0) + j * lnr)
                b1 = jnp.exp(jnp.log(a0) + (j + 1) * lnr)
                bm = jnp.sqrt(b0 * b1)
                ks1 = _integrate(lambda a: 1.0 / (a * _H(a)), b0, bm, dtype)
                ks2 = _integrate(lambda a: 1.0 / (a * _H(a)), bm, b1, dtype)
                drs = _integrate(
                    lambda a: 1.0 / (a**3 * _H(a)), b0, b1, dtype
                )
                return b1, ks1, drs, ks2

            def sub(j, c):
                pos, p, gs, ov2 = c
                b1, ks1, drs, ks2 = sub_factors(j)
                p1 = p + gs * ks1
                pos1 = jnp.mod(pos + p1 * drs, box)
                gs1, o = short_fn(pos1, st.mass, b1)
                return pos1, p1 + gs1 * ks2, gs1, jnp.maximum(ov2, o)

            if acc_both_fn is None:
                pos, p, gs, ov_new = jax.lax.fori_loop(
                    0, n_sub, sub, (pos, p, gs, jnp.int32(0))
                )
                gl_new = long_fn(pos, st.mass, a1)
            else:
                # trailing subcycle's short force + closing long force
                # from ONE fused evaluation (same positions)
                pos, p, gs, ov_new = jax.lax.fori_loop(
                    0, n_sub - 1, sub, (pos, p, gs, jnp.int32(0))
                )
                b1, ks1, drs, ks2 = sub_factors(n_sub - 1)
                p = p + gs * ks1
                pos = jnp.mod(pos + p * drs, box)
                gs, gl_new, o = acc_both_fn(pos, st.mass, b1, a1)
                ov_new = jnp.maximum(ov_new, o)
                p = p + gs * ks2
            p = p + gl_new * kl2
            return (
                st.replace(pos=pos, vel=p, time=a1),
                (gl_new, gs),
                ov_new,
            )

        subcycled = split_fns is not None and n_sub > 1
        stepper = kick_drift_sub if subcycled else kick_drift

        def body(carry):
            st, g, ov, _dla, _hist, n = carry
            dla_i = demand(st)
            dla = jnp.clip(jnp.min(dla_i), dla_floor, dla_max)
            dla = jnp.minimum(dla, jnp.log(a_end) - jnp.log(st.time))
            a0 = st.time
            a1 = jnp.exp(jnp.log(a0) + dla)
            st, g_new, ov_new = stepper(st, g, a0, a1)
            rung = jnp.clip(
                jnp.ceil(jnp.log2(dla_max / jnp.maximum(dla_i, 1e-30))),
                0, n_rungs - 1,
            ).astype(jnp.int32)
            hist = jnp.bincount(rung, length=n_rungs).astype(jnp.int32)
            return (st, g_new, jnp.maximum(ov, ov_new), dla, hist, n + 1)

        init = (state, g0, ov0, jnp.asarray(dla_max, dtype), hist0,
                jnp.int32(0))
        st, _, ov, dla, hist, n = jax.lax.while_loop(cond, body, init)
        return st, n, ov, dla, hist

    return run


# ---------------------------------------------------------------------------
# Per-particle rung stepping (CONCEPT's rung subdivision, TPU-shaped)
# ---------------------------------------------------------------------------


def rung_kick_tables(cosmo: Cosmology, a_grid, n_rungs: int):
    """Host-precomputed per-rung kick factors for block-step KDK.

    CONCEPT subdivides each global step into per-particle rungs: rung r
    particles receive short-range kicks every 2^(n_rungs-1-r) of the
    n_sub = 2^(n_rungs-1) sub-ticks (run-log "Rung population" lines,
    reference `TheFeedingPipeline/.../params_id0000….log:6700-6719`).
    For every global step of ``a_grid`` and each rung r, this lays the
    sub-ticks out log-uniformly and integrates the exact kick factors
    over each rung's own sub-intervals (KDK: half-kicks around the
    geometric midpoint).

    Returns (Fk, Dr, A_sub):
      Fk (n_steps, n_sub+1, n_rungs): kick factor applied AT tick j to a
        rung-r particle (0 when r is inactive at j; boundary ticks 0 and
        n_sub carry the opening/closing half-kicks);
      Dr (n_steps, n_sub): shared drift factor of each sub-tick;
      A_sub (n_steps, n_sub): scale factor at the END of each sub-tick.
    """
    a_grid = np.asarray(a_grid, dtype=np.float64)
    n_steps = len(a_grid) - 1
    n_sub = 2 ** (n_rungs - 1)
    Fk = np.zeros((n_steps, n_sub + 1, n_rungs))
    Dr = np.empty((n_steps, n_sub))
    A_sub = np.empty((n_steps, n_sub))
    for i in range(n_steps):
        t = np.geomspace(a_grid[i], a_grid[i + 1], n_sub + 1)
        _, dr, _, _ = cosmo_kick_drift_factors(cosmo, t)
        Dr[i] = dr
        A_sub[i] = t[1:]
        for r in range(n_rungs):
            m = 2 ** (n_rungs - 1 - r)
            bounds = t[::m]  # this rung's sub-interval boundaries
            k1, _, k2, _ = cosmo_kick_drift_factors(cosmo, bounds)
            for b in range(len(bounds) - 1):
                Fk[i, b * m, r] += k1[b]        # opening half-kick
                Fk[i, (b + 1) * m, r] += k2[b]  # closing half-kick
    return Fk, Dr, A_sub


def rung_active_min(j: int, n_rungs: int) -> int:
    """Minimum active rung at sub-tick j (1..n_sub-1): rungs whose
    sub-interval boundary falls on j, i.e. r >= n_rungs-1-v2(j)."""
    v2 = 0
    while j % 2 == 0:
        j //= 2
        v2 += 1
    return n_rungs - 1 - v2


def run_cosmological_rungs(
    state: ParticleState,
    cosmo: Cosmology,
    a_grid,
    acc_long_fn,
    acc_short_fn,
    acc_short_masked_fn,
    box: float,
    n_rungs: int,
    cell: float,
    eta_disp: float = 0.25,
    eta_acc: float = 0.025,
    eps: float = 0.0,
    acc_both_fn=None,
    frozen_both_fns=None,
    active_capacity: int = 0,
):
    """Block-step KDK with per-particle rungs (the full CONCEPT scheme).

    Each global step: rungs are assigned from the displacement demand
    (dla_i = eta_disp * cell * a^2 H / |p_i|, the same criterion as the
    adaptive chooser: rung r wants the global step / 2^r), the far field
    kicks at the global half-steps, and short-range kicks run per rung —
    rung r at every 2^(n_rungs-1-r)-th of the n_sub = 2^(n_rungs-1)
    sub-ticks.  The demand combines the displacement criterion with the
    ACCELERATION criterion dt <= sqrt(2 eta_acc eps / |acc_pec|)
    (Gadget/CONCEPT's rung rule — halo particles have large |g| long
    before they have large |v|, and the round-3 parity study measured a
    displacement-only rung assignment re-opening the growth-ratio gap:
    1.037 vs 1.075).  Both etas are traced, so tuning them reuses the
    compile.  Interior sub-ticks evaluate the short force ONLY for the
    active rung set via ``acc_short_masked_fn(pos, mass, active, a) ->
    (g, overflow)`` (two-plane cell kernel,
    `nbody.forces.p3m.p3m_short_cells_pallas_masked`): with CONCEPT-like
    populations (~5% above rung 0) almost all interior-tick work
    vanishes, which is how CONCEPT's P3M affords 142 steps in 4:18 on a
    desktop.  Boundary ticks use the full ``acc_short_fn`` and the
    trailing force is reused as the next step's leading one.

    ``acc_long_fn(pos, mass, a) -> g``; ``acc_short_fn`` returns
    (g, overflow).  Returns (final_state, max_boundary_overflow:int32,
    max_masked_source_overflow:int32, max_target_overflow:int32,
    max_target_occupancy:int32, max_plan_stale:int32,
    rung_hists (n_steps, n_rungs)) — the overflow channels map to
    distinct capacity knobs (boundary-tier bucket / masked source
    plane / active-target plane / frozen-plan skin) so the driver
    self-heals the right one, and the target occupancy lets it
    pre-warm the next segment instead of paying an in-scan overflow.
    """
    a_grid = np.asarray(a_grid, dtype=np.float64)
    n_steps = len(a_grid) - 1
    n_sub = 2 ** (n_rungs - 1)
    KL1, _, KL2, _ = cosmo_kick_drift_factors(cosmo, a_grid)
    Fk, Dr, A_sub = rung_kick_tables(cosmo, a_grid, n_rungs)

    dtype = state.pos.dtype
    xs = (
        jnp.asarray(a_grid[:-1], dtype),
        jnp.asarray(a_grid[1:], dtype),
        jnp.asarray(KL1, dtype),
        jnp.asarray(KL2, dtype),
        jnp.asarray(Fk, dtype),
        jnp.asarray(Dr, dtype),
        jnp.asarray(A_sub, dtype),
    )
    return _run_scan_rungs(
        state, xs, jnp.asarray(box, dtype), acc_long_fn, acc_short_fn,
        acc_short_masked_fn, int(n_rungs), jnp.asarray(cell, dtype),
        jnp.asarray(eta_disp, dtype),
        jnp.asarray(2.0 * eta_acc * eps, dtype), cosmo,
        acc_both_fn=acc_both_fn, frozen_both_fns=frozen_both_fns,
        active_capacity=int(active_capacity),
    )


def _rung_demand(vel, gl, gs, a0, cell, eta_disp, eta_acc_eps2,
                 H0, Om, OL):
    """Per-particle step demand dla_i: displacement AND acceleration
    criteria (dt <= eta_disp cell / |dx/dt|, dt <= sqrt(2 eta_acc eps a /
    |g|); g = dp/dt carried from the previous step)."""
    H = H0 * jnp.sqrt(Om / a0**3 + OL)
    speed = jnp.linalg.norm(vel, axis=-1)
    dla_disp = eta_disp * cell * a0**2 * H / jnp.maximum(speed, 1e-30)
    gmag = jnp.linalg.norm(gl + gs, axis=-1)
    dla_acc = jnp.where(
        eta_acc_eps2 > 0,
        H * jnp.sqrt(eta_acc_eps2 * a0 / jnp.maximum(gmag, 1e-30)),
        jnp.inf,
    )
    return jnp.minimum(dla_disp, dla_acc)


def _assign_rungs(dla_i, dla_step, n_rungs):
    """Rung r wants the global step / 2^r: r = ceil(log2(step/demand))."""
    return jnp.clip(
        jnp.ceil(jnp.log2(dla_step / jnp.maximum(dla_i, 1e-30))),
        0, n_rungs - 1,
    ).astype(jnp.int32)


def _rung_block_step(st, gl, gs, rung, x, box, n_rungs, acc_long_fn,
                     acc_short_fn, acc_short_masked_fn,
                     acc_both_fn=None, frozen_both_fns=None, plan=None,
                     active_capacity=0):
    """One global KDK step with per-particle rung short-range kicks.

    ``x = (a0, a1, kl1, kl2, Fk, Dr, A_sub)`` — long half-kick factors
    plus the per-tick rung kick tables (host tables from
    :func:`rung_kick_tables` on the fixed grid, or their on-device
    equivalent from :func:`_rung_tables_device` under the adaptive
    chooser).  With ``frozen_both_fns = (freeze_fn, both_frozen_fn,
    drift_ok_fn)`` the boundary tick evaluates the fused both-force on
    the carried column ``plan`` (refrozen on drift demand) — the
    argsort + window tables are paid per drift budget, not per step
    (interior masked ticks keep the cells geometry regardless).
    Returns (st, gl_new, gs_new, ov_b, ov_s, ov_t, occ_t, plan) —
    BOUNDARY-tick overflow (``acc_short_fn``, which may ride a different
    short-range tier, e.g. columns) is reported separately from the
    masked kernel's SOURCE-plane overflow so the driver self-heals the
    right capacity knob."""
    a0, a1, kl1, kl2, Fk, Dr, A_sub = x
    n_sub = 2 ** (n_rungs - 1)

    if frozen_both_fns is not None:
        freeze_fn, both_frozen_fn, drift_ok_fn = frozen_both_fns[:3]
        masked_frozen_fn = (
            frozen_both_fns[3] if len(frozen_both_fns) > 3 else None
        )
        stale_fn = frozen_both_fns[4] if len(frozen_both_fns) > 4 else None
        fresh_plan_fn = (
            frozen_both_fns[5] if len(frozen_both_fns) > 5 else None
        )
        masked_buckets_fn = (
            frozen_both_fns[6] if len(frozen_both_fns) > 6 else None
        )

    p = st.vel + gl * kl1                      # long opening half-kick
    p = p + gs * Fk[0][rung][:, None]          # tick-0 short kicks
    pos = st.pos
    ov_b = jnp.int32(0)
    ov_s = jnp.int32(0)
    ov_t = jnp.int32(0)
    occ_t = jnp.int32(0)
    ov_stale = jnp.int32(0)
    gs_new = gs

    compact = (
        frozen_both_fns is not None
        and len(frozen_both_fns) > 6
        and active_capacity > 0
    )
    if compact:
        # compact active index, fixed per step (rungs are): interior
        # kicks touch only these rows — the slot-table readback +
        # scatter-add replace a full-N gather per tick.  Truncation
        # (n_act > active_capacity) is LOUD on the ov_t channel: the
        # driver doubles rung_active_capacity and re-runs the segment.
        act_any = rung >= 1
        n_act = jnp.sum(act_any).astype(jnp.int32)
        idx_act = jnp.nonzero(
            act_any, size=int(active_capacity), fill_value=0
        )[0]
        act_valid = (
            jnp.arange(int(active_capacity), dtype=jnp.int32)
            < jnp.minimum(n_act, jnp.int32(active_capacity))
        )
        rung_act = rung[idx_act]
        slot_act = plan.gidx[idx_act]
        ov_t = jnp.maximum(
            ov_t, jnp.maximum(n_act - jnp.int32(active_capacity), 0)
        )

    for j in range(1, n_sub + 1):
        pos = jnp.mod(pos + p * Dr[j - 1], box)
        if j < n_sub:
            act = rung >= rung_active_min(j, n_rungs)
            # skip the masked kernel entirely while the active set is
            # empty (early times: every particle sits on rung 0, so
            # interior ticks would pay plane-build + kernel for
            # nothing; lax.cond branches at run time on device)
            if frozen_both_fns is not None and masked_frozen_fn is not None:
                # interior masked tick on the carried frozen plan,
                # UNCONDITIONAL: the plan was (re)frozen at a boundary
                # with a skin sized for a whole step's drift
                # (_frozen_geometry's rung sizing), so interior ticks
                # never pay the refreeze argsort — on-demand mid-step
                # refreezes measured ~3 x 104 ms/step on clustered hot
                # tails (0.31 s of the 0.67 s step, round-4 scan
                # ablation).  Drift beyond skin/2 raises the LOUD
                # staleness channel (ov_t) the driver heals by growing
                # column_skin / shrinking the step — never a silent
                # accuracy loss.
                if compact:
                    # compact kick: slot-table force, gathered at the
                    # step's active rows only, scatter-added back
                    def _maskedc(pos=pos, act=act, j=j):
                        buckets, o = masked_buckets_fn(
                            pos, st.mass, act, A_sub[j - 1], plan
                        )
                        return buckets[slot_act], o

                    g_act, o = jax.lax.cond(
                        jnp.any(act),
                        _maskedc,
                        lambda: (
                            jnp.zeros(
                                (int(active_capacity), 3), st.pos.dtype
                            ),
                            jnp.int32(0),
                        ),
                    )
                    fk = jnp.where(
                        act_valid, Fk[j][rung_act],
                        jnp.zeros((), st.pos.dtype),
                    )
                    p = p.at[idx_act].add(g_act * fk[:, None])
                    g = None
                else:
                    def _masked(pos=pos, act=act, j=j):
                        return masked_frozen_fn(
                            pos, st.mass, act, A_sub[j - 1], plan
                        )

                    g, o = jax.lax.cond(
                        jnp.any(act),
                        _masked,
                        lambda: (jnp.zeros_like(st.pos), jnp.int32(0)),
                    )
                ov_b = jnp.maximum(ov_b, o)
                if stale_fn is not None:
                    ov_stale = jnp.maximum(
                        ov_stale,
                        jnp.where(
                            jnp.any(act), stale_fn(pos, plan),
                            jnp.int32(0),
                        ),
                    )
            else:
                g, o, ot, oc = jax.lax.cond(
                    jnp.any(act),
                    lambda pos=pos, act=act, j=j: acc_short_masked_fn(
                        pos, st.mass, act, A_sub[j - 1]
                    ),
                    lambda: (
                        jnp.zeros_like(st.pos),
                        jnp.int32(0),
                        jnp.int32(0),
                        jnp.int32(0),
                    ),
                )
                ov_t = jnp.maximum(ov_t, ot)
                occ_t = jnp.maximum(occ_t, oc)
                ov_s = jnp.maximum(ov_s, o)
        else:
            # boundary tick: the full short force here and the closing
            # long force two lines down are evaluated at the SAME
            # positions — acc_both_fn (p3m_acc part='split') serves both
            # from one fused plane build/deposit when available, and
            # frozen_both_fns additionally skips the plane build's
            # argsort while drift stays inside the plan's skin.  This
            # is the ONLY refreeze site: the driver's drift predicate
            # keeps a HALF-skin margin here so the plan it hands the
            # NEXT step's interior ticks still has a half budget left
            # (hot tails refreeze every boundary — one argsort/step;
            # cold states keep a plan for many steps).
            if frozen_both_fns is not None and fresh_plan_fn is not None:
                # refreeze fused into the fresh evaluation: one sort
                # serves the eval AND the next step's interior plan
                def _keep(pl_, pos=pos, j=j):
                    g_, gl_, o_ = both_frozen_fn(
                        pos, st.mass, A_sub[j - 1], a1, pl_
                    )
                    return g_, gl_, o_, pl_

                def _fresh(pl_, pos=pos, j=j):
                    return fresh_plan_fn(pos, st.mass, A_sub[j - 1], a1)

                g, gl_new, o, plan = jax.lax.cond(
                    drift_ok_fn(pos, plan), _keep, _fresh, plan
                )
            elif frozen_both_fns is not None:
                plan = jax.lax.cond(
                    drift_ok_fn(pos, plan),
                    lambda pl_: pl_,
                    lambda pl_: freeze_fn(pos, st.mass),
                    plan,
                )
                g, gl_new, o = both_frozen_fn(
                    pos, st.mass, A_sub[j - 1], a1, plan
                )
            elif acc_both_fn is None:
                g, o = acc_short_fn(pos, st.mass, A_sub[j - 1])
                gl_new = None
            else:
                g, gl_new, o = acc_both_fn(
                    pos, st.mass, A_sub[j - 1], a1
                )
            gs_new = g
            ov_b = jnp.maximum(ov_b, o)
        if g is not None:  # compact interior ticks already kicked
            p = p + g * Fk[j][rung][:, None]

    if acc_both_fn is None and frozen_both_fns is None:
        gl_new = acc_long_fn(pos, st.mass, a1)
    p = p + gl_new * kl2
    st = st.replace(pos=pos, vel=p, time=a1)
    return st, gl_new, gs_new, ov_b, ov_s, ov_t, occ_t, ov_stale, plan


@functools.partial(
    jax.jit,
    static_argnames=(
        "acc_long_fn", "acc_short_fn", "acc_short_masked_fn", "n_rungs",
        "cosmo", "acc_both_fn", "frozen_both_fns", "active_capacity",
    ),
)
def _run_scan_rungs(state, xs, box, acc_long_fn, acc_short_fn,
                    acc_short_masked_fn, n_rungs, cell, eta_disp,
                    eta_acc_eps2, cosmo, acc_both_fn=None,
                    frozen_both_fns=None, active_capacity=0):
    H0, Om, OL = float(cosmo.H0), float(cosmo.Omega_m), float(cosmo.Omega_L)

    if frozen_both_fns is not None and len(frozen_both_fns) > 5:
        # fresh fused eval with plan emit: one sort for the initial
        # forces AND the first step's interior plan
        gs0, gl0, ov0, plan0 = frozen_both_fns[5](
            state.pos, state.mass, state.time, state.time
        )
    else:
        if frozen_both_fns is not None and len(frozen_both_fns) > 5:
            # fresh fused eval with plan emit: one sort for the initial
            # forces AND the first step's interior plan
            gs0, gl0, ov0, plan0 = frozen_both_fns[5](
                state.pos, state.mass, state.time, state.time
            )
        else:
            if acc_both_fn is not None:
                gs0, gl0, ov0 = acc_both_fn(
                    state.pos, state.mass, state.time, state.time
                )
            else:
                gl0 = acc_long_fn(state.pos, state.mass, state.time)
                gs0, ov0 = acc_short_fn(state.pos, state.mass, state.time)
            if frozen_both_fns is not None:
                plan0 = frozen_both_fns[0](state.pos, state.mass)
            else:
                plan0 = jnp.int32(0)  # placeholder carry leaf

    def body(carry, x):
        st, gl, gs, ov, plan = carry
        a0, a1 = x[0], x[1]

        dla_i = _rung_demand(st.vel, gl, gs, a0, cell, eta_disp,
                             eta_acc_eps2, H0, Om, OL)
        rung = _assign_rungs(dla_i, jnp.log(a1) - jnp.log(a0), n_rungs)
        hist = jnp.bincount(rung, length=n_rungs).astype(jnp.int32)

        st, gl_new, gs_new, ov_b, ov_s, ov_t, occ_t, ov_st, plan = (
            _rung_block_step(
                st, gl, gs, rung, x, box, n_rungs,
                acc_long_fn, acc_short_fn, acc_short_masked_fn,
                acc_both_fn=acc_both_fn,
                frozen_both_fns=frozen_both_fns, plan=plan,
                active_capacity=active_capacity,
            )
        )
        ovb, ovm, ovt, occt, ovst = ov
        return (
            st, gl_new, gs_new,
            (
                jnp.maximum(ovb, ov_b),
                jnp.maximum(ovm, ov_s),
                jnp.maximum(ovt, ov_t),
                jnp.maximum(occt, occ_t),
                jnp.maximum(ovst, ov_st),
            ),
            plan,
        ), hist

    (final, _, _, (ovb, ovm, ovt, occt, ovst), _), hists = jax.lax.scan(
        body,
        (state, gl0, gs0,
         (ov0, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
         plan0),
        xs,
    )
    return final, ovb, ovm, ovt, occt, ovst, hists


def _gl_int(f, lo, hi, dtype):
    """Vectorised 16-point Gauss-Legendre integral of f(a) da over
    [lo, hi] (arrays ok), evaluated in ln a."""
    lnl, lnh = jnp.log(lo), jnp.log(hi)
    x = lnl[..., None] + jnp.asarray(_GL_X, dtype) * (lnh - lnl)[..., None]
    a = jnp.exp(x)
    w = jnp.asarray(_GL_W, dtype)
    return (lnh - lnl) * jnp.sum(w * f(a) * a, axis=-1)


def _rung_tables_device(a0, a1, n_rungs, H0, Om, OL, dtype):
    """On-device equivalent of :func:`rung_kick_tables` for ONE global
    step [a0, a1] with traced endpoints — what the adaptive chooser
    needs (it picks a1 at run time, so host precomputation is
    impossible).  Returns (kl1, kl2, Fk (n_sub+1, n_rungs), Dr (n_sub,),
    A_sub (n_sub,)); tick layout and half-kick placement match the host
    tables exactly (16-pt GL vs the host's dense trapezoid agree to
    ~1e-12 for these smooth integrands)."""
    n_sub = 2 ** (n_rungs - 1)
    lnl, lnh = jnp.log(a0), jnp.log(a1)
    t = jnp.exp(lnl + jnp.arange(n_sub + 1, dtype=dtype) / n_sub
                * (lnh - lnl))

    def H(a):
        return H0 * jnp.sqrt(Om / a**3 + OL)

    def kick(lo, hi):
        return _gl_int(lambda a: 1.0 / (a * H(a)), lo, hi, dtype)

    def drift(lo, hi):
        return _gl_int(lambda a: 1.0 / (a**3 * H(a)), lo, hi, dtype)

    Dr = drift(t[:-1], t[1:])
    A_sub = t[1:]
    am = jnp.sqrt(a0 * a1)
    kl1 = kick(a0, am)
    kl2 = kick(am, a1)
    Fk = jnp.zeros((n_sub + 1, n_rungs), dtype)
    for r in range(n_rungs):
        m = 2 ** (n_rungs - 1 - r)
        bounds = t[::m]
        bm = jnp.sqrt(bounds[:-1] * bounds[1:])
        k1 = kick(bounds[:-1], bm)
        k2 = kick(bm, bounds[1:])
        Fk = (
            Fk.at[np.arange(0, n_sub, m), r].add(k1)
            .at[np.arange(m, n_sub + 1, m), r].add(k2)
        )
    return kl1, kl2, Fk, Dr, A_sub


def make_adaptive_rung_runner(
    cosmo: Cosmology,
    acc_long_fn,
    acc_short_fn,
    acc_short_masked_fn,
    box: float,
    cell: float,
    *,
    dla_max: float = 0.03,
    eta_disp: float = 0.25,
    eta_acc: float = 0.025,
    eps: float = 0.0,
    max_steps: int = 8,
    n_rungs: int = 3,
    acc_both_fn=None,
    frozen_both_fns=None,
    active_capacity: int = 0,
):
    """Adaptive global step COMPOSED with per-particle rungs — CONCEPT's
    actual integrator structure (adaptive background step + rung
    subdivision; the reference's run logs show both the varying step and
    the per-step "Rung population" lines,
    `TheFeedingPipeline/.../params_id0000….log:6700-6719`).

    Per step, fully on device inside a ``lax.while_loop``: per-particle
    demand dla_i (displacement + acceleration criteria, as
    :func:`run_cosmological_rungs`), then the global step

        dla = min(dla_max, 2^(n_rungs-1) * min_i dla_i, ln a_end - ln a0)

    — the DEEPEST rung serves the fastest particle, so unlike the
    rung-less adaptive chooser the global step does not collapse to the
    worst particle's demand; it only shrinks when even rung n_rungs-1
    cannot resolve it.  Kick tables for the chosen [a0, a1] are computed
    on device (:func:`_rung_tables_device`) and the step body is the
    same :func:`_rung_block_step` as the fixed-grid rung tier.

    ``max_steps`` bounds one dispatch (TPU relay limit) — call
    repeatedly until arrival.  Returns run(state, a_end) ->
    (state, n_steps, overflow_boundary, overflow_masked_source,
    overflow_target, occupancy_target, plan_stale, dla_last,
    rung_hist (n_rungs,)) — overflow channels as
    :func:`run_cosmological_rungs`."""
    H0, Om, OL = float(cosmo.H0), float(cosmo.Omega_m), float(cosmo.Omega_L)
    eta_acc_eps2 = 2.0 * float(eta_acc) * float(eps)
    depth = float(2 ** (n_rungs - 1))

    @jax.jit
    def run(state: ParticleState, a_end):
        dtype = state.pos.dtype
        a_end_ = jnp.asarray(a_end, dtype)
        boxd = jnp.asarray(box, dtype)
        celld = jnp.asarray(cell, dtype)
        etad = jnp.asarray(eta_disp, dtype)
        etaa = jnp.asarray(eta_acc_eps2, dtype)

        if frozen_both_fns is not None and len(frozen_both_fns) > 5:
            # fresh fused eval with plan emit: one sort for the initial
            # forces AND the first step's interior plan
            gs0, gl0, ov0, plan0 = frozen_both_fns[5](
                state.pos, state.mass, state.time, state.time
            )
        else:
            if acc_both_fn is not None:
                gs0, gl0, ov0 = acc_both_fn(
                    state.pos, state.mass, state.time, state.time
                )
            else:
                gl0 = acc_long_fn(state.pos, state.mass, state.time)
                gs0, ov0 = acc_short_fn(state.pos, state.mass, state.time)
            if frozen_both_fns is not None:
                plan0 = frozen_both_fns[0](state.pos, state.mass)
            else:
                plan0 = jnp.int32(0)  # placeholder carry leaf
        hist0 = jnp.zeros((n_rungs,), jnp.int32)

        def cond(carry):
            st, n = carry[0], carry[6]
            return jnp.logical_and(st.time < a_end_, n < max_steps)

        def body(carry):
            st, gl, gs, ov5, _dla, _hist, n, plan = carry
            a0 = st.time
            dla_i = _rung_demand(st.vel, gl, gs, a0, celld, etad, etaa,
                                 H0, Om, OL)
            dla = jnp.minimum(
                jnp.minimum(jnp.asarray(dla_max, dtype),
                            depth * jnp.min(dla_i)),
                jnp.log(a_end_) - jnp.log(a0),
            )
            dla = jnp.maximum(dla, jnp.asarray(1e-8, dtype))
            a1 = jnp.exp(jnp.log(a0) + dla)
            kl1, kl2, Fk, Dr, A_sub = _rung_tables_device(
                a0, a1, n_rungs, H0, Om, OL, dtype
            )
            rung = _assign_rungs(dla_i, dla, n_rungs)
            hist = jnp.bincount(rung, length=n_rungs).astype(jnp.int32)
            st, gl_new, gs_new, ov_b, ov_s, ov_t, occ_t, ov_st, plan = (
                _rung_block_step(
                    st, gl, gs, rung, (a0, a1, kl1, kl2, Fk, Dr, A_sub),
                    boxd, n_rungs,
                    acc_long_fn, acc_short_fn, acc_short_masked_fn,
                    acc_both_fn=acc_both_fn,
                    frozen_both_fns=frozen_both_fns, plan=plan,
                    active_capacity=active_capacity,
                )
            )
            ovb, ovm, ovt, occt, ovst = ov5
            return (
                st, gl_new, gs_new,
                (
                    jnp.maximum(ovb, ov_b),
                    jnp.maximum(ovm, ov_s),
                    jnp.maximum(ovt, ov_t),
                    jnp.maximum(occt, occ_t),
                    jnp.maximum(ovst, ov_st),
                ),
                dla, hist, n + 1, plan,
            )

        init = (
            state, gl0, gs0,
            (ov0, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            jnp.asarray(dla_max, dtype), hist0, jnp.int32(0), plan0,
        )
        (st, _, _, (ovb, ovm, ovt, occt, ovst), dla, hist, n, _) = (
            jax.lax.while_loop(cond, body, init)
        )
        return st, n, ovb, ovm, ovt, occt, ovst, dla, hist

    return run
