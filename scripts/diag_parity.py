"""Discriminate the sources of the high-k power deficit vs the reference.

Reruns the 64^3 parity config (seed 1) under controlled variations:
  A. baseline:      142 steps, cells short-range   (what parity_study ran)
  B. allpairs:      142 steps, dense short-range   (no cell list at all)
  C. more steps:    400 steps, cells short-range   (time-resolution probe)

If B ~ A: the cell list isn't dropping force. If C >> A at high k: the
deficit is halo time-resolution (CONCEPT's per-particle rungs).
"""

import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/PPPMP3M/PP/powerspec/powerspec_a=1.00"
REF_P3M = "/root/reference/PPPMP3M/P3M/powerspec/powerspec_a=1.00"


def main():
    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import measure_powerspec, run_simulation
    from nbody.io.powerspec import read_powerspec

    ref = read_powerspec(REF_P3M)
    base = SimulationConfig(
        n_side=64, box=500.0, solver="p3m", pm_grid=128, n_steps=142,
        transfer=REF,
        output=OutputConfig(
            snapshot_times=(1.0,), powerspec=False, snapshot=False,
            powerspec_binning="concept", realization_correction=True,
        ),
    )
    variants = {
        "A_base142_cells": base,
        "B_allpairs142": base.replace(shortrange="allpairs"),
        "C_steps400": base.replace(n_steps=400),
    }
    k_ny = np.pi * 64 / 500.0
    sel_ref = (ref.modes > 300) & (ref.k <= k_ny)
    for name, cfg in variants.items():
        res = run_simulation(cfg, seed=1, workdir="")
        k, modes, P, Pc, Pl = measure_powerspec(
            res.state.pos, cfg, a=1.0, seed=1
        )
        good = (modes > 0) & (Pc > 0)
        Pi = np.exp(np.interp(np.log(ref.k[sel_ref]), np.log(k[good]),
                              np.log(Pc[good])))
        ratio = Pi / ref.P_corrected[sel_ref]
        hi = ref.k[sel_ref] > 0.25
        print(json.dumps({
            "variant": name,
            "ratio_mean": float(ratio.mean()),
            "ratio_highk": float(ratio[hi].mean()),
        }), flush=True)


if __name__ == "__main__":
    main()
