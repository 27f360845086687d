"""15-seed PM parity row (VERDICT r4 item 4).

The round-4 PM convention bracket closed on ONE seed: the reference
PM's own config (mesh = lattice, interlace (True, True), deconvolve
(True, True) -> p=4, differentiation Fourier -> spectral;
`Different_Sizes/Giant.param` conventions on the
`PPPMP3M/PM/powerspec/powerspec_a=1.00` study) measured growth 1.0934
vs the reference PM's 1.0833 "within +-1.5% single-realization
scatter".  This runs the SAME 15-seed protocol the P3M contract used
(`scripts/parity_study.py`) through the PM solver and pins the row
with mean +- SEM and a committed artifact.

Writes tests/data/parity/pm_summary.json (contract-tested in
tests/test_parity.py).  Usage: python scripts/pm_parity.py [--seeds 15]
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
REF_PM = "/root/reference/PPPMP3M/PM/powerspec/powerspec_a=1.00"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "parity")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=15)
    args = ap.parse_args()

    from parity_study import sigma8_from_table

    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import measure_powerspec, run_simulation
    from nbody.io.powerspec import read_powerspec

    ref = read_powerspec(REF_PM)
    ref_growth = (ref.sigma8_corrected or 0.884) / (ref.sigma8_linear or 0.816)

    cfg = SimulationConfig(
        n_side=64, box=500.0, n_steps=142, solver="pm", pm_grid=64,
        interlace=True, deconvolve_p=4, pm_gradient="spectral",
        transfer=REF, softening_kernel="spline",
        output=OutputConfig(
            powerspec=False, snapshot=False, powerspec_bins=48,
            powerspec_binning="concept", realization_correction=True,
        ),
    )
    os.makedirs(OUT, exist_ok=True)
    rows = []
    for seed in range(args.seeds):
        t0 = time.time()
        res = run_simulation(cfg, seed=seed, workdir="")
        k, modes, P, Pc, Pl = measure_powerspec(
            res.state.pos, cfg, a=1.0, seed=seed
        )
        s8c = sigma8_from_table(k, Pc)
        s8l = sigma8_from_table(k, Pl)
        rows.append({
            "seed": seed,
            "sigma8_corrected": s8c,
            "sigma8_linear_tab": s8l,
            "growth_ratio": s8c / s8l,
            "wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]))

    gr = np.array([r["growth_ratio"] for r in rows])
    summary = {
        "reference_pm": {
            "sigma8_corrected": ref.sigma8_corrected,
            "sigma8_linear": ref.sigma8_linear,
            "growth_ratio": ref_growth,
        },
        "ours": {
            "growth_ratio_mean": float(gr.mean()),
            "growth_ratio_std": float(gr.std()),
            "growth_ratio_sem": float(gr.std() / np.sqrt(len(gr))),
            "n_seeds": len(rows),
        },
        "seeds": rows,
        "config": {
            "solver": "pm", "n_side": 64, "pm_grid": 64, "box": 500.0,
            "interlace": True, "deconvolve_p": 4,
            "pm_gradient": "spectral", "n_steps": 142,
            "note": "the reference PM's own conventions "
                    "(Giant.param: gridsize=_size, interlace (True,True), "
                    "deconvolve (True,True), differentiation Fourier)",
        },
    }
    with open(os.path.join(OUT, "pm_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["ours"] | {"reference": ref_growth}))


if __name__ == "__main__":
    main()
