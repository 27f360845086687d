"""Rung-criterion eta sweep + masked-kernel cost probe (round 3).

Loads a clustered mid-run parity state (saved from the 5-seed rung study,
a ~ 0.55), evaluates the P3M force once on the chip, then sweeps the rung
assignment etas HOST-SIDE to find values that reproduce CONCEPT-like rung
populations (~95% rung 0; the reference's own training-run logs show
`Rung population: matter: 31147, 1157, 464` at 32^3) while keeping the
active-target bucket occupancy inside one 128-lane quantum.  Then times
the masked cell kernel at several target capacities to calibrate the
wall-clock model.

Usage: python scripts/exp_rung_etas.py [--state /tmp/late_state.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/tmp/late_state.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nbody.core.cosmology import Cosmology
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import build_cosmo_force_rungs
    from nbody.forces.p3m import p3m_short_params
    from nbody.io.checkpoint import load_checkpoint

    st, _ = load_checkpoint(args.state, dtype=jnp.float32)
    a = float(st.time)
    n = st.pos.shape[0]
    box, mesh = 500.0, 128
    cfg = SimulationConfig(
        n_side=64, box=box, solver="p3m", pm_grid=mesh, n_steps=142,
        softening_kernel="spline", rungs=3,
    )
    cosmo = Cosmology()
    eps = cfg.eps
    cell = box / mesh
    n_rungs = 3
    dla_step = (np.log(1.0) - np.log(0.02)) / 142

    # bucket geometry (for occupancy accounting)
    _, r_cut, ncell, cap = p3m_short_params(box, mesh, n)
    pos = np.mod(np.asarray(st.pos), box)
    c = np.clip((pos * (ncell / box)).astype(np.int64), 0, ncell - 1)
    cid = (c[:, 0] * ncell + c[:, 1]) * ncell + c[:, 2]
    occ_all = np.bincount(cid, minlength=ncell**3)
    print(f"state a={a:.3f} N={n} ncell={ncell} densest bucket "
          f"{occ_all.max()} mean occ {occ_all.mean():.1f}")

    # one force eval on chip for |g|
    cfg = cfg.replace(cell_capacity=-(-int(occ_all.max() * 1.1) // 128) * 128)
    long_fn, short_fn, masked_fn = build_cosmo_force_rungs(cfg)
    t0 = time.time()
    gl = long_fn(st.pos, st.mass, jnp.float32(a))
    gs, ov = short_fn(st.pos, st.mass, jnp.float32(a))
    g = np.asarray(gl + gs)
    print(f"force eval {time.time() - t0:.1f} s, short overflow {int(ov)}")

    H0, Om, OL = cosmo.H0, cosmo.Omega_m, cosmo.Omega_L
    H = H0 * np.sqrt(Om / a**3 + OL)
    speed = np.linalg.norm(np.asarray(st.vel), axis=-1)
    gmag = np.linalg.norm(g, axis=-1)

    rows = []
    for eta_disp in (0.25, 0.5, 1.0, 2.0, 4.0):
        for eta_acc in (0.025, 0.05, 0.1, 0.2, 0.4):
            dla_disp = eta_disp * cell * a**2 * H / np.maximum(speed, 1e-30)
            dla_acc = H * np.sqrt(
                2 * eta_acc * eps * a / np.maximum(gmag, 1e-30))
            dla = np.minimum(dla_disp, dla_acc)
            rung = np.clip(
                np.ceil(np.log2(dla_step / np.maximum(dla, 1e-30))),
                0, n_rungs - 1).astype(int)
            hist = np.bincount(rung, minlength=n_rungs)
            act1 = rung >= 1
            occ1 = np.bincount(cid[act1], minlength=ncell**3).max() \
                if act1.any() else 0
            ncol1 = len(np.unique(cid[act1] // ncell)) if act1.any() else 0
            rows.append({
                "eta_disp": eta_disp, "eta_acc": eta_acc,
                "hist": hist.tolist(),
                "frac_ge1_pct": round(100 * act1.mean(), 2),
                "max_active_bucket": int(occ1),
                "active_zcols": ncol1,
                "limiter_acc_pct": round(
                    100 * np.mean(dla_acc < dla_disp), 1),
            })
            print(json.dumps(rows[-1]))

    # masked-kernel cost vs target capacity (chip timing)
    from nbody.diagnostics.profiling import benchmark_fn

    print("\nmasked-kernel cost probe (active = fastest f fraction):")
    order = np.argsort(-gmag)  # halo particles first: worst-case locality
    for frac, rcap in ((0.25, 512), (0.25, 256), (0.05, 256), (0.05, 128),
                      (0.02, 128)):
        act = np.zeros(n, bool)
        act[order[: int(frac * n)]] = True
        need = np.bincount(cid[act], minlength=ncell**3).max()
        if need > rcap:
            print(f"  frac={frac} rcap={rcap}: skip (need {need})")
            continue
        cfgm = cfg.replace(rung_capacity=rcap)
        _, _, mfn = build_cosmo_force_rungs(cfgm)
        actj = jnp.asarray(act)

        def call(p, mfn=mfn, actj=actj):
            return mfn(p, st.mass, actj, jnp.float32(a))[0]

        dt = benchmark_fn(call, st.pos, reps=3)
        print(f"  frac={frac} rcap={rcap} (need {need}): {dt*1e3:.0f} ms")
    dt_full = benchmark_fn(
        lambda p: short_fn(p, st.mass, jnp.float32(a))[0], st.pos, reps=3)
    print(f"  full short eval: {dt_full*1e3:.0f} ms "
          f"(cell capacity {cfg.cell_capacity})")


if __name__ == "__main__":
    main()
