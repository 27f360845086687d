"""Per-component wall-time breakdown of one rung-tier global step at
bench scale (N = 2^20, 128^3, 3 rungs, ~5% above rung 0) — what to
optimize to hit >= 2.5 steps/s (VERDICT round-3 item 1).

Components: fused boundary both-force (supercell), masked interior tick
(cells two-plane), its two plane builds separately, the rung
demand/assignment, and the frozen-plan columns short eval for
comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.abs(leaf.ravel()[:2]))


def timed(fn, *args, reps=3, label=""):
    _sync(fn(*args))
    ts = []
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for _ in range(reps):
        a0 = args[0]
        if jnp.issubdtype(a0.dtype, jnp.floating):
            pert = a0 + jnp.asarray(rng.uniform(1e-6, 1e-4), a0.dtype)
        else:
            pert = a0
        t0 = time.perf_counter()
        out = fn(pert, *args[1:])
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def main():
    from nbody.core.cosmology import Cosmology
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import (
        build_cosmo_force_both, build_cosmo_force_frozen,
        build_cosmo_force_rungs,
    )
    from nbody.forces.p3m import build_padded_plane, p3m_short_params

    n = 1 << 20
    box, nmesh = 500.0, 128
    cfg = SimulationConfig(
        n_side=round(n ** (1 / 3)), box=box, solver="p3m", pm_grid=nmesh,
        softening_kernel="spline", rungs=3,
    )
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < 0.05)
    a = jnp.float32(0.5)

    rung_fns = build_cosmo_force_rungs(cfg)
    both_fn = build_cosmo_force_both(cfg)
    frozen_fns = build_cosmo_force_frozen(cfg)

    timed(jax.jit(lambda p: both_fn(p, mass, a, a)), pos,
          label="boundary both_fn (fused supercell)")
    timed(jax.jit(lambda p: rung_fns[2](p, mass, act, a)), pos,
          label="masked interior tick (5% active)")
    timed(jax.jit(lambda p: rung_fns[1](p, mass, a)), pos,
          label="full short_fn (boundary tier)")

    r_s, r_cut, ncell, auto_cap = p3m_short_params(box, nmesh, n)
    timed(
        jax.jit(lambda p: build_padded_plane(p, mass, box, r_cut, ncell,
                                             auto_cap)),
        pos, label=f"source plane build (cells, K={auto_cap})")
    timed(
        jax.jit(lambda p: build_padded_plane(p, mass, box, r_cut, ncell,
                                             128, valid=act)),
        pos, label="target plane build (K=128)")

    if frozen_fns is not None:
        freeze_fn, short_frozen_fn, _ = frozen_fns
        plan = freeze_fn(pos, mass)
        _sync(plan.pos0)
        timed(jax.jit(lambda p: freeze_fn(p, mass)), pos,
              label="freeze_column_plan")
        timed(jax.jit(lambda p: short_frozen_fn(p, mass, a, plan)), pos,
              label="frozen columns short eval")

    from nbody.driver.simulate import build_cosmo_force_frozen_both

    fb = build_cosmo_force_frozen_both(cfg)
    if fb is not None:
        freeze_fn, both_frozen_fn, drift_ok_fn, masked_frozen_fn = fb
        plan = freeze_fn(pos, mass)
        _sync(plan.pos0)
        timed(jax.jit(lambda p: both_frozen_fn(p, mass, a, a, plan)), pos,
              label="FROZEN fused both (boundary tick)")
        timed(
            jax.jit(lambda p: masked_frozen_fn(p, mass, act, a, plan)),
            pos, label="masked frozen tick (5% random)")
        # clustered actives: the chunk-skip regime
        nh = int(np.asarray(act).sum())
        rng2 = np.random.default_rng(7)
        centers = rng2.uniform(0, box, (64, 3))
        posc = np.array(pos)
        hot = np.asarray(act)
        posc[hot] = (centers[rng2.integers(0, 64, nh)]
                     + rng2.normal(0, 0.01 * box, (nh, 3))) % box
        posc = jnp.asarray(posc, jnp.float32)
        planc = freeze_fn(posc, mass)
        _sync(planc.pos0)
        timed(
            jax.jit(lambda p: masked_frozen_fn(p, mass, act, a, planc)),
            posc, label="masked frozen tick (5% clustered)")
        timed(jax.jit(lambda p: drift_ok_fn(p, plan)), pos,
              label="plan_drift_ok")

    from nbody.integrate.cosmo_stepping import _rung_demand, _assign_rungs
    from nbody.core.cosmology import Cosmology

    cosmo = Cosmology()
    g0 = jnp.zeros_like(pos)

    @jax.jit
    def demand(v):
        dla_i = _rung_demand(v, g0, g0, a, box / nmesh, 0.25,
                             2.0 * cfg.step_eta_acc * cfg.eps,
                             cosmo.H0, cosmo.Omega_m, cosmo.Omega_L)
        r = _assign_rungs(dla_i, 0.01, 3)
        return jnp.bincount(r, length=3)

    vel = jnp.asarray(
        np.random.default_rng(3).normal(size=(n, 3)), jnp.float32
    )
    timed(demand, vel, label="rung demand + assign + hist")


if __name__ == "__main__":
    main()
