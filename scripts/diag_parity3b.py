"""Variants I/J/K of round 3 (H already measured)."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

REF = "/root/reference/PPPMP3M/PP/powerspec/powerspec_a=1.00"
REF_P3M = "/root/reference/PPPMP3M/P3M/powerspec/powerspec_a=1.00"

from nbody.driver.config import OutputConfig, SimulationConfig
from nbody.driver.simulate import measure_powerspec, run_simulation
from nbody.io.powerspec import read_powerspec

ref = read_powerspec(REF_P3M)
base = SimulationConfig(
    n_side=64, box=500.0, solver="p3m", pm_grid=128, n_steps=142,
    transfer=REF, softening_kernel="spline",
    output=OutputConfig(
        snapshot_times=(1.0,), powerspec=False, snapshot=False,
        powerspec_binning="concept", realization_correction=True,
    ),
)
variants = {
    "I_spline_sub4": base.replace(subcycles=4),
    "J_spline_sub8": base.replace(subcycles=8),
    "K_sub4_interlace": base.replace(subcycles=4, interlace=True),
}
k_ny = np.pi * 64 / 500.0
sel_ref = (ref.modes > 300) & (ref.k <= k_ny)
for name, cfg in variants.items():
    res = run_simulation(cfg, seed=1, workdir="")
    st = res.state
    k, modes, P, Pc, Pl = measure_powerspec(st.pos, cfg, a=1.0, seed=1)
    good = (modes > 0) & (Pc > 0)
    Pi = np.exp(np.interp(np.log(ref.k[sel_ref]), np.log(k[good]),
                          np.log(Pc[good])))
    ratio = Pi / ref.P_corrected[sel_ref]
    hi = ref.k[sel_ref] > 0.25
    out = {"variant": name, "ratio_mean": float(ratio.mean()),
           "ratio_highk": float(ratio[hi].mean()), "wall_s": res.wall_s}
    # measurement-convention probe: same state on a 64 grid, interlaced
    cfg64 = cfg.replace(pm_grid=64, interlace=True)
    k2, m2, P2, Pc2, _ = measure_powerspec(st.pos, cfg64, a=1.0, seed=1)
    good = (m2 > 0) & (Pc2 > 0)
    Pi2 = np.exp(np.interp(np.log(ref.k[sel_ref]), np.log(k2[good]),
                           np.log(Pc2[good])))
    r2 = Pi2 / ref.P_corrected[sel_ref]
    out["ratio_highk_meas64i"] = float(r2[hi].mean())
    print(json.dumps(out), flush=True)

