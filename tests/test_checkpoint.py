"""Checkpoint/resume tests: atomic saves, bit-exact scan resume."""

import os

import numpy as np
import pytest

from nbody.driver import SimulationConfig, run_simulation
from nbody.driver.config import OutputConfig
from nbody.io.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint

CFG = SimulationConfig(
    n_side=8, box=200.0, solver="pm", pm_grid=16, n_steps=8,
    output=OutputConfig(snapshot_times=(1.0,), powerspec=False),
)


def test_roundtrip(tmp_path):
    from nbody.core.types import ParticleState

    rng = np.random.default_rng(0)
    st = ParticleState.create(
        pos=rng.normal(size=(16, 3)), vel=rng.normal(size=(16, 3)),
        mass=np.ones(16), time=0.37, dtype=np.float64,
    )
    p = str(tmp_path / "ck" / "checkpoint.npz")
    save_checkpoint(p, st, {"grid_index": 5, "seed": 9})
    back, extra = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(st.pos))
    np.testing.assert_array_equal(np.asarray(back.vel), np.asarray(st.vel))
    assert float(back.time) == pytest.approx(0.37)
    assert extra == {"grid_index": 5, "seed": 9}


def test_bit_exact_resume(tmp_path):
    """checkpoint mid-run + resume == uninterrupted run, bit for bit."""
    d1, d2 = str(tmp_path / "full"), str(tmp_path / "resumed")
    full = run_simulation(CFG, seed=3, workdir=d1, checkpoint_every_steps=3)

    # interrupted run: integrate only up to the first checkpoint boundary,
    # i.e. simulate a crash by re-running with resume from the autosave
    run_simulation(CFG, seed=3, workdir=d2, checkpoint_every_steps=3)
    ck = latest_checkpoint(d2)
    assert ck is not None
    st, extra = load_checkpoint(ck)
    assert extra["grid_index"] in (3, 6)
    resumed = run_simulation(
        CFG, seed=3, workdir=d2, checkpoint_every_steps=3, resume=True
    )
    np.testing.assert_array_equal(
        np.asarray(full.state.pos), np.asarray(resumed.state.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(full.state.vel), np.asarray(resumed.state.vel)
    )


def test_resume_skips_completed_steps(tmp_path):
    d = str(tmp_path / "run")
    run_simulation(CFG, seed=1, workdir=d, checkpoint_every_steps=2)
    ck = latest_checkpoint(d)
    st, extra = load_checkpoint(ck)
    # resume should start from the stored index, not from scratch
    res = run_simulation(CFG, seed=1, workdir=d, resume=True)
    assert float(res.state.time) == pytest.approx(1.0)


def test_atomicity_no_tmp_left(tmp_path):
    from nbody.core.types import ParticleState

    st = ParticleState.create(
        pos=np.zeros((4, 3)), vel=np.zeros((4, 3)), mass=np.ones(4), time=0.1,
    )
    p = str(tmp_path / "checkpoint.npz")
    save_checkpoint(p, st)
    assert os.path.exists(p) and not os.path.exists(p + ".tmp")
