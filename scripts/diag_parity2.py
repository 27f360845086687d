"""Round 2 of the parity-deficit discrimination (seed 1, 64^3).

  D. steps800:    convergence trend of the stepping channel
  E. eps_half:    softening_frac 0.015 at 142 steps (softening channel)
  F. interlace:   interlaced+deconvolved force deposits at 142 steps
  G. combo:       400 steps + eps/2 + interlace
"""

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
    transfer=REF,
    output=OutputConfig(
        snapshot_times=(1.0,), powerspec=False, snapshot=False,
        powerspec_binning="concept", realization_correction=True,
    ),
)
variants = {
    "D_steps800": base.replace(n_steps=800),
    "E_eps_half": base.replace(softening_frac=0.015),
    "F_interlace": base.replace(interlace=True),
    "G_combo": base.replace(n_steps=400, softening_frac=0.015,
                            interlace=True),
}
k_ny = np.pi * 64 / 500.0
sel_ref = (ref.modes > 300) & (ref.k <= k_ny)
for name, cfg in variants.items():
    res = run_simulation(cfg, seed=1, workdir="")
    k, modes, P, Pc, Pl = measure_powerspec(res.state.pos, cfg, a=1.0, seed=1)
    good = (modes > 0) & (Pc > 0)
    Pi = np.exp(np.interp(np.log(ref.k[sel_ref]), np.log(k[good]),
                          np.log(Pc[good])))
    ratio = Pi / ref.P_corrected[sel_ref]
    hi = ref.k[sel_ref] > 0.25
    print(json.dumps({"variant": name,
                      "ratio_mean": float(ratio.mean()),
                      "ratio_highk": float(ratio[hi].mean())}), flush=True)

