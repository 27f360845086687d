"""Which PM configuration reproduces CONCEPT's PM-study growth?

The reference's PM run measured sigma8 = 0.884 (corrected) over linear
0.816 -> growth 1.0833 (`PPPMP3M/PM/powerspec/powerspec_a=1.00:9`).  Its
.param file is not in the repo, so the mesh/interlace/differentiation
conventions are pinned empirically here (the P3M parity study already
pinned mesh = 2x lattice for the P3M rows):

measured round 3 (this script, one seed, 64^3 / 500 Mpc / 142 steps):
  mesh 128, fd4,      no interlace -> growth 1.213   (alias self-force)
  mesh  64, fd4,      no interlace -> growth 1.033
  mesh  64, spectral, interlace    -> growth 1.016
  mesh 128 variants with interlacing: run me.

Usage: python scripts/exp_pm_convention.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF = "/root/reference/PPPMP3M/PP/powerspec/powerspec_a=1.00"


def main():
    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import measure_powerspec, run_simulation
    from parity_study import sigma8_from_table

    base = SimulationConfig(
        n_side=64, box=500.0, n_steps=142, solver="pm",
        transfer=REF, softening_kernel="spline",
        output=OutputConfig(powerspec=False, snapshot=False),
    )
    variants = {
        "m128_fd4_il": base.replace(pm_grid=128, interlace=True),
        "m128_spec_il": base.replace(pm_grid=128, interlace=True,
                                     pm_gradient="spectral"),
    }
    for name, cfg in variants.items():
        t0 = time.time()
        res = run_simulation(cfg, seed=1, workdir="")
        np.asarray(res.state.pos.ravel()[:2])
        wall = time.time() - t0
        mcfg = cfg.replace(output=cfg.output.replace(
            powerspec_bins=48, powerspec_binning="concept",
            realization_correction=True,
        ))
        k, modes, P, Pc, Pl = measure_powerspec(
            res.state.pos, mcfg, a=1.0, seed=1
        )
        print(json.dumps({
            "variant": name,
            "wall_s": wall,
            "growth_ratio": sigma8_from_table(k, Pc) / sigma8_from_table(k, Pl),
            "reference_growth_ratio": 0.884 / 0.816,
        }), flush=True)


if __name__ == "__main__":
    main()
