"""Physics parity vs the reference's own data, confounder-free.

Reruns the reference's 64^3 / L=500 Mpc P3M study
(`PPPMP3M/pppmp3mplotter.py`, CONCEPT runtime 4:18 min) with the ICs drawn
from the *reference's own* CLASS-grade linear spectrum (the P_linear
column of `PPPMP3M/PP/powerspec/powerspec_a=1.00`), so the measured
sigma8 growth ratio and P(k) can be compared to the reference's
P_corrected column with no EH-vs-CLASS transfer confounder
(round-1 VERDICT items #4/#5).

Runs on the real TPU chip.  Writes:
  * tests/data/parity/powerspec_a=1.00_seed{S}  (our measured spectra)
  * tests/data/parity/summary.json              (ratios, per-seed + mean)

Usage: python scripts/parity_study.py [--seeds 5] [--adaptive-check]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/PPPMP3M/PP/powerspec/powerspec_a=1.00"
REF_P3M = "/root/reference/PPPMP3M/P3M/powerspec/powerspec_a=1.00"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "parity")


def sigma8_from_table(k, P, h=0.67):
    good = (np.asarray(k) > 0) & (np.asarray(P) > 0)
    k, P = np.asarray(k)[good], np.asarray(P)[good]
    x = k * 8.0 / h
    W = 3.0 * (np.sin(x) - x * np.cos(x)) / x**3
    return float(np.sqrt(np.trapezoid(k**3 * P * W**2 / (2 * np.pi**2),
                                      np.log(k))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--adaptive-check", action="store_true")
    ap.add_argument(
        "--rungs", type=int, default=0,
        help="run the per-particle rung tier (config.rungs=R) instead of "
        "uniform 4x subcycling; writes rungs_summary.json + "
        "powerspec_a=1.00_rungs_seed{S} so the subcycled artifacts stay "
        "pinned",
    )
    args = ap.parse_args()

    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import measure_powerspec, run_simulation
    from nbody.io.powerspec import read_powerspec, write_powerspec

    ref = read_powerspec(REF_P3M)
    cfg = SimulationConfig(
        n_side=64, box=500.0, solver="p3m", pm_grid=128, n_steps=142,
        transfer=REF,
        # CONCEPT-matched physics: cubic-spline softening and 4x
        # short-range subcycling (the rung-subdivision analogue;
        # converged — 8x gives the same spectrum)
        softening_kernel="spline",
        subcycles=1 if args.rungs else 4,
        rungs=args.rungs,
        output=OutputConfig(
            dir=OUT, snapshot_times=(1.0,), powerspec=False, snapshot=False,
            powerspec_bins=48,
            # the reference's measurement options (Uncertain.param:83-107):
            # variable bins-per-decade to the Nyquist + realization
            # correction, so the corrected column is cosmic-variance-free
            powerspec_binning="concept",
            realization_correction=True,
        ),
    )
    os.makedirs(OUT, exist_ok=True)
    tag = "_rungs" if args.rungs else ""
    rows = []
    for seed in range(args.seeds):
        t0 = time.time()
        res = run_simulation(
            cfg, seed=seed,
            workdir=os.path.join(OUT, "rungs_run") if args.rungs else "",
            checkpoint_every_steps=24,
        )
        pos = res.state.pos
        path = os.path.join(OUT, f"powerspec_a=1.00{tag}_seed{seed}")
        k, modes, P, Pc, Pl = measure_powerspec(
            pos, cfg, a=1.0, path=path, seed=seed
        )
        s8c = sigma8_from_table(k, Pc)
        s8l = sigma8_from_table(k, Pl)
        # interpolate our corrected spectrum onto the reference's k bins
        # (keep bins with enough modes that realization scatter is small)
        keep = (ref.modes > 300) & (ref.k <= np.pi * 64 / 500.0)
        P_ours = np.exp(np.interp(np.log(ref.k[keep]), np.log(k), np.log(Pc)))
        ratio = P_ours / ref.P_corrected[keep]
        rows.append(
            {
                "seed": seed,
                "sigma8_corrected": s8c,
                "sigma8_linear_tab": s8l,
                "growth_ratio": s8c / s8l,
                "Pk_ratio_mean": float(ratio.mean()),
                "Pk_ratio_std": float(ratio.std()),
                "wall_s": time.time() - t0,
            }
        )
        print(json.dumps(rows[-1]))

    gr = np.array([r["growth_ratio"] for r in rows])
    pr = np.array([r["Pk_ratio_mean"] for r in rows])
    summary = {
        "reference": {
            "sigma8_corrected": ref.sigma8_corrected,
            "sigma8_linear": ref.sigma8_linear,
            "growth_ratio": (ref.sigma8_corrected or 0.877)
            / (ref.sigma8_linear or 0.816),
        },
        "ours": {
            "growth_ratio_mean": float(gr.mean()),
            "growth_ratio_std": float(gr.std()),
            "growth_ratio_sem": float(gr.std() / np.sqrt(len(gr))),
            "Pk_ratio_mean": float(pr.mean()),
            "Pk_ratio_std": float(pr.std()),
            # sem distinguishes BIAS from SCATTER (round-3 VERDICT item
            # 4: the 5-seed P(k) mean sat ~2 sigma low, unadjudicated)
            "Pk_ratio_sem": float(pr.std() / np.sqrt(len(pr))),
            "n_seeds": len(rows),
        },
        "seeds": rows,
        "config": {"n_side": 64, "box": 500.0, "solver": "p3m",
                   "transfer": "reference P_linear column"},
    }

    if args.adaptive_check:
        t0 = time.time()
        res = run_simulation(
            cfg.replace(time_stepping="adaptive"), seed=0,
            workdir=os.path.join(OUT, "adaptive"),
        )
        k, modes, P, Pc, Pl = measure_powerspec(
            res.state.pos, cfg, a=1.0, seed=0
        )
        logtxt = open(os.path.join(OUT, "adaptive", "run.log")).read()
        total = int(logtxt.rsplit("Total adaptive steps:", 1)[1].split()[0])
        summary["adaptive"] = {
            "n_steps": total,
            "growth_ratio": sigma8_from_table(k, Pc) / sigma8_from_table(k, Pl),
            "wall_s": time.time() - t0,
        }
        print(json.dumps(summary["adaptive"]))

    if args.rungs:
        summary["rungs"] = args.rungs
        logpath = os.path.join(OUT, "rungs_run", "run.log")
        if os.path.exists(logpath):
            pops = [ln.strip() for ln in open(logpath)
                    if "Rung population" in ln]
            summary["rung_population_first_last"] = [pops[0], pops[-1]] \
                if pops else []
    name = "rungs_summary.json" if args.rungs else "summary.json"
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["ours"]))


if __name__ == "__main__":
    main()
