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

Round 4 adds the two previously unmapped CONCEPT options the
reference's own configs set (VERDICT round-3 missing #1):
`deconvolve: (True, True)` -> deconvolve_p=4 (both passes,
`Giant.param:53-58`) and `cell_centered` — the latter measured EXACTLY
neutral under interlacing (tests/test_pm.py::
test_cell_centered_shift_identity: the cell-centered interlaced grid
pair {0.5, 1.0} is a lattice shift of the vertex pair {0, 0.5}), so
the bracket closes on deconvolve_p x mesh x gradient with interlacing
on throughout (Giant.param interlaces both passes).

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
        "m64_fd4_il_p4": base.replace(
            pm_grid=64, interlace=True, deconvolve_p=4
        ),
        "m64_spec_il_p4": base.replace(
            pm_grid=64, interlace=True, deconvolve_p=4,
            pm_gradient="spectral",
        ),
        "m128_fd4_il_p4": base.replace(
            pm_grid=128, interlace=True, deconvolve_p=4
        ),
        "m128_spec_il_p4": base.replace(
            pm_grid=128, interlace=True, deconvolve_p=4,
            pm_gradient="spectral",
        ),
        "m64_spec_il_p2": base.replace(
            pm_grid=64, interlace=True, pm_gradient="spectral",
            deconvolve_p=2,
        ),
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
