"""Solver wall-clock study vs the reference's own headline runtimes.

The reference's runtime table (`PPPMP3M/pppmp3mplotter.py:18-22`, mirrored
in BASELINE.md): for the 64^3 / L=500 Mpc / a=0.02->1 study, CONCEPT's
PP took 2d 23:27:37 (256,057 s), PM 12.1 s, P3M 4:18 (258 s) on the
author's desktop; and the 32^3 training-run config (`NN.param`, P3M,
142 adaptive steps) took 34.1 s
(`TheFeedingPipeline/.../params_id0000....log:6690-6719`).

This script runs the SAME configurations through the driver on the real
TPU chip and prints one JSON line per solver with the measured wall
clock.  Configuration parity with the reference's own runs:

- PM: CONCEPT's PM study ran mesh == particle grid ("upstream grid
  size 64" / "grid size 64", `PPPMP3M/PM/powerspec/powerspec_a=1.00:4-6`)
  -> pm_grid=64, NOT the P3M study's 2x mesh.
- p3m32: `NN.param:54` sets `'gridsize': _size` (a 32^3 mesh) and
  `NN.param:69-75` interlaces the force deposits -> pm_grid=32,
  interlace=True, rungs (the run's log shows per-step rung populations).
  Its A_s matches the id0000 training run so the growth check can
  compare sigma8 against the reference's OWN snapshot
  (`.../id0000.../snapshots/snapshot_a=1.00.hdf5`), measured with the
  same estimator.

Each solver runs twice (seeds 0/1): the first wall is COLD (includes
remote-service compiles; the persistent compile cache may absorb most on
a rerun), the second is WARM (compiled code reused in-process) — the
number comparable to CONCEPT's, whose C extensions are compiled once at
install time, not per run.

The P3M 64^3 walls live in the parity study (`scripts/parity_study.py`);
this covers the remaining rows: PP and PM at 64^3, and the 32^3 P3M
training config.

Usage: python scripts/solver_walls.py [--solvers pm p3m32 pp]
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
REF32_SNAP = (
    "/root/reference/TheFeedingPipeline/Datafolder4/TrainingVal_Concept/"
    "id0000_A_s1.88377509750655293639e-09/NNPM32_As1.88e-09/snapshots/"
    "snapshot_a=1.00.hdf5"
)
A_S_ID0000 = 1.88377509750655293639e-09
A_S_FIDUCIAL = 2.105e-9  # NN.param:93 / the PP study's linear column

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
        n_side=64, box=500.0, n_steps=142,
        transfer=REF, softening_kernel="spline",
        output=OutputConfig(powerspec=False, snapshot=False),
    )
    configs = {
        # exact periodic direct summation (Ewald), the PP row.  8-step
        # checkpoint cadence bounds each dispatch well under the relay
        # limit (a PP step is ~0.6 s of dense all-pairs work).
        "pp": (study.replace(solver="pp"),
               dict(checkpoint_every_steps=8)),
        # CONCEPT's PM study: mesh == particle grid (header "grid size
        # 64"), forces from the unfiltered 1/k^2 kernel.  The study's
        # .param is not in the repo; scripts/exp_pm_convention.py
        # brackets its growth (1.0833) between our mesh-64 (1.02-1.03)
        # and mesh-128 (1.20) variants — this row uses the framework's
        # default convention at the reference's mesh
        "pm": (study.replace(solver="pm", pm_grid=64), {}),
        # the reference's 32^3 training-run config (NN.param: 32^3
        # particles, 500 Mpc, 'gridsize': _size -> 32^3 mesh, interlaced
        # force deposits, P3M with rungs), A_s matched to the id0000 run
        "p3m32": (
            SimulationConfig(
                n_side=32, box=500.0, pm_grid=32, n_steps=142,
                solver="p3m", rungs=3, interlace=True,
                pm_gradient="spectral",
                A_s=A_S_ID0000, transfer=REF,
                softening_kernel="spline",
                output=OutputConfig(powerspec=False, snapshot=False),
            ),
            dict(base_A_s=A_S_FIDUCIAL),
        ),
    }

    if args.smoke:
        for k, (cfg, kw) in list(configs.items()):
            configs[k] = (
                cfg.replace(n_side=8, pm_grid=32 if cfg.pm_grid else 0,
                            n_steps=4),
                kw,
            )

    # reference sigma8 per solver (PPPMP3M/{PP,PM}/powerspec headers,
    # corrected column, over linear 0.816); p3m32 is compared against the
    # reference's own snapshot instead (no powerspec output exists for
    # the 32^3 runs)
    REF_GROWTH = {"pp": 0.877 / 0.816, "pm": 0.884 / 0.816}

    rows = {}
    for name in args.solvers:
        cfg, kw = configs[name]
        kw = dict(kw)
        base_as = kw.pop("base_A_s", None)
        base = cfg.replace(A_s=base_as) if base_as else None
        walls = []
        res = None
        for seed in (0, 1):
            t0 = time.time()
            res = run_simulation(cfg, seed=seed, workdir="", base=base, **kw)
            # host readback = execution barrier over the relay
            np.asarray(res.state.pos.ravel()[:2])
            walls.append(time.time() - t0)
        rows[name] = {
            "solver": name,
            "wall_cold_s": walls[0],
            "wall_warm_s": walls[1],
            "reference_s": BASE[name],
            "speedup_warm": BASE[name] / walls[1],
        }
        if name in REF_GROWTH:
            # growth ratio of the warm run (same sigma8 accounting as
            # scripts/parity_study.py).  Skipped for the A_s-anchored
            # p3m32 row: its linear column carries the anchor's
            # amplitude, so the ratio would be mis-normalised — the
            # snapshot-vs-snapshot sigma8 below is its physics check.
            mcfg = cfg.replace(output=cfg.output.replace(
                powerspec_bins=48, powerspec_binning="concept",
                realization_correction=True,
            ))
            k, modes, P, Pc, Pl = measure_powerspec(
                res.state.pos, mcfg, a=1.0, seed=1
            )
            rows[name]["growth_ratio"] = (
                sigma8_from_table(k, Pc) / sigma8_from_table(k, Pl)
            )
            rows[name]["reference_growth_ratio"] = REF_GROWTH[name]
        elif name == "p3m32" and os.path.exists(REF32_SNAP) and not args.smoke:
            # measure the reference's own 32^3 snapshot (same A_s, same
            # estimator, no realization correction on either side — its
            # seeds are unknown); one-realization scatter at 32^3 is a
            # few percent
            from nbody.io.snapshot import read_snapshot

            ref_state, _ = read_snapshot(REF32_SNAP)
            m2 = cfg.replace(output=cfg.output.replace(
                powerspec_bins=48, powerspec_binning="concept",
                realization_correction=False,
            ))
            k_r, _, _, Pc_r, _ = measure_powerspec(
                np.asarray(ref_state.pos), m2, a=1.0
            )
            k_o, _, _, Pc_o, _ = measure_powerspec(
                res.state.pos, m2, a=1.0
            )
            rows[name]["sigma8_vs_reference_snapshot"] = (
                sigma8_from_table(k_o, Pc_o) / sigma8_from_table(k_r, Pc_r)
            )
        print(json.dumps(rows[name]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
