"""Solver wall-clock study vs the reference's own headline runtimes.

The reference's runtime table (`PPPMP3M/pppmp3mplotter.py:18-22`, mirrored
in BASELINE.md): for the 64^3 / L=500 Mpc / a=0.02->1 study, CONCEPT's
PP took 2d 23:27:37 (256,057 s), PM 12.1 s, P3M 4:18 (258 s) on the
author's desktop; and the 32^3 training-run config (`NN.param`, P3M,
142 adaptive steps) took 34.1 s
(`TheFeedingPipeline/.../params_id0000....log:6690-6719`).

This script runs the SAME configurations through the driver on the real
TPU chip and prints one JSON line per solver with the measured wall
clock.  The P3M 64^3 walls live in the parity study
(`scripts/parity_study.py`); this covers the remaining rows: PP and PM
at 64^3, and the 32^3 P3M training config.

Usage: python scripts/solver_walls.py [--solvers pp pm p3m32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF = "/root/reference/PPPMP3M/PP/powerspec/powerspec_a=1.00"

BASE = {
    "pp": 256057.0,  # 2d 23:27:37
    "pm": 12.1,
    "p3m32": 34.1,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solvers", nargs="+", default=["pm", "p3m32", "pp"],
                    choices=["pp", "pm", "p3m32"])
    ap.add_argument("--out", default="")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on the CPU backend (script check)")
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import measure_powerspec, run_simulation
    from parity_study import sigma8_from_table

    study = SimulationConfig(
        n_side=64, box=500.0, pm_grid=128, n_steps=142,
        transfer=REF, softening_kernel="spline",
        output=OutputConfig(powerspec=False, snapshot=False),
    )
    configs = {
        # exact periodic direct summation (Ewald), the PP row.  8-step
        # checkpoint cadence bounds each dispatch well under the relay
        # limit (a PP step is ~0.6 s of dense all-pairs work).
        "pp": (study.replace(solver="pp"), dict(checkpoint_every_steps=8)),
        "pm": (study.replace(solver="pm"), {}),
        # the reference's 32^3 training-run config (NN.param: 32^3
        # particles, 500 Mpc, P3M, 142 steps with rungs)
        "p3m32": (
            SimulationConfig(
                n_side=32, box=500.0, pm_grid=64, n_steps=142,
                solver="p3m", rungs=3, transfer=REF,
                softening_kernel="spline",
                output=OutputConfig(powerspec=False, snapshot=False),
            ),
            {},
        ),
    }

    if args.smoke:
        for k, (cfg, kw) in list(configs.items()):
            configs[k] = (
                cfg.replace(n_side=8, pm_grid=32, n_steps=4), kw
            )

    # reference sigma8 per solver (PPPMP3M/{PP,PM,P3M}/powerspec headers)
    REF_S8 = {"pp": 0.877, "pm": 0.884, "p3m32": 0.877}

    rows = {}
    for name in args.solvers:
        cfg, kw = configs[name]
        t0 = time.time()
        res = run_simulation(cfg, seed=0, workdir="", **kw)
        # host readback = execution barrier over the relay
        np.asarray(res.state.pos.ravel()[:2])
        wall = time.time() - t0
        rows[name] = {
            "solver": name,
            "wall_s": wall,
            "reference_s": BASE[name],
            "speedup": BASE[name] / wall,
        }
        # growth ratio of this run (same sigma8 accounting as
        # scripts/parity_study.py; reference corrected-sigma8 values in
        # the powerspec headers for the three solvers)
        mcfg = cfg.replace(output=cfg.output.replace(
            powerspec_bins=48, powerspec_binning="concept",
            realization_correction=True,
        ))
        k, modes, P, Pc, Pl = measure_powerspec(
            res.state.pos, mcfg, a=1.0, seed=0
        )
        s8c = sigma8_from_table(k, Pc)
        s8l = sigma8_from_table(k, Pl)
        rows[name]["growth_ratio"] = s8c / s8l
        rows[name]["reference_growth_ratio"] = REF_S8[name] / 0.816
        print(json.dumps(rows[name]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
