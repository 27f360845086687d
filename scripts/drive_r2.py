"""End-to-end drive of the round-2 surfaces on the real TPU chip.

Serialized (one TPU process): adaptive P3M simulate via the library,
Ewald PP vs P3M cross-check, batched ensemble tier, CLI smoke.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

print("devices:", jax.devices(), flush=True)

from nbody.driver.config import SimulationConfig, OutputConfig
from nbody.driver.simulate import run_simulation

t0 = time.time()
with tempfile.TemporaryDirectory() as td:
    cfg = SimulationConfig(
        n_side=16, box=250.0, pm_grid=32, solver="p3m",
        time_stepping="adaptive", a_begin=0.25,
        output=OutputConfig(dir=td, snapshot_times=(0.6, 1.0)),
    )
    res = run_simulation(cfg, seed=3, workdir=td)
    log = open(os.path.join(td, "run.log")).read()
    assert "Rung population: matter:" in log, "no rung lines"
    assert abs(float(res.state.time) - 1.0) < 1e-6
    total = int(log.rsplit("Total adaptive steps:", 1)[1].split()[0])
    pos = np.asarray(res.state.pos)
    assert np.isfinite(pos).all() and (pos >= 0).all() and (pos <= 250.0).all()
    print(f"[1] adaptive P3M simulate OK: {total} self-chosen steps, "
          f"{len(res.snapshots)} snapshots, {time.time()-t0:.1f} s", flush=True)

# Ewald PP vs P3M: forces should agree to the P3M accuracy class
import jax.numpy as jnp
from nbody.core import units as u
from nbody.forces.ewald import ewald_pp_acc
from nbody.forces.p3m import p3m_acc

rng = np.random.default_rng(7)
n, box = 4096, 100.0
pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)
t0 = time.time()
g_ew = np.asarray(ewald_pp_acc(pos, mass, box, eps=0.5, G=u.COSMO.G))
g_p3m = np.asarray(p3m_acc(pos, mass, box, 64, G=u.COSMO.G, eps=0.5,
                           split="spline"))
scale = np.abs(g_ew).max()
rel = np.abs(g_ew - g_p3m).max() / scale
assert np.isfinite(g_ew).all()
assert rel < 0.05, f"Ewald vs P3M mismatch {rel}"
print(f"[2] Ewald PP on chip OK: max rel dev vs P3M {rel:.2e} "
      f"({time.time()-t0:.1f} s)", flush=True)

# Batched ensemble tier on chip
from nbody.driver.ensemble import run_ensemble, draw_A_s

t0 = time.time()
with tempfile.TemporaryDirectory() as td:
    cfg = SimulationConfig(
        n_side=16, box=250.0, pm_grid=32, solver="pm", n_steps=12,
        output=OutputConfig(dir=td, powerspec_bins=12),
    )
    A_s = draw_A_s(4, draw_seed=1)
    r = run_ensemble(cfg, 4, td, A_s_values=A_s, batch=4)
    assert not r.failed, r.failed
    assert len(r.run_dirs) == 4
    for rd in r.run_dirs:
        assert os.path.exists(os.path.join(rd, "snapshots",
                                           "snapshot_a=1.00.hdf5"))
    print(f"[3] batched ensemble (B=4, one dispatch) OK "
          f"({r.wall_s:.1f} s)", flush=True)

print("ALL DRIVES PASSED")
