"""Per-particle rung stepping (CONCEPT's rung subdivision, round-3).

The rung tier must (a) reduce exactly to the uniform subcycled
integrator when every particle shares a rung, (b) evaluate interior-tick
forces only for the active rung set (masked two-plane kernel, verified
bit-exact vs the full kernel on targets), and (c) report CONCEPT-style
rung populations.  Reference: run-log "Rung population: matter: 31147,
1157, 464" (`TheFeedingPipeline/Datafolder4/TrainingVal_Concept/
id0000_A_s…/params_id0000….log:6700-6719`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbody.core import units as u
from nbody.core.cosmology import Cosmology
from nbody.core.types import ParticleState
from nbody.forces.p3m import (
    p3m_acc,
    p3m_short_cells_pallas_masked,
    p3m_short_params,
)
from nbody.integrate.cosmo_stepping import (
    log_a_steps,
    run_cosmological_rungs,
    run_cosmological_subcycled,
    rung_active_min,
    rung_kick_tables,
)


def _cosmo_system(n, box, seed=4, dtype=jnp.float32, vel_scale=0.002):
    cosmo = Cosmology()
    rho_crit = 3.0 * cosmo.H0**2 / (8.0 * np.pi * u.COSMO.G)
    pmass = float(rho_crit * cosmo.Omega_m * box**3 / n)
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), dtype)
    vel = jnp.asarray(rng.normal(0, vel_scale * box, (n, 3)), dtype)
    mass = jnp.full((n,), pmass, dtype)
    return cosmo, ParticleState(pos=pos, vel=vel, mass=mass,
                                time=jnp.asarray(0.5, dtype))


def _force_fns(box, nmesh, eps=0.1):
    def long_fn(pos, mass, a):
        return p3m_acc(
            pos, mass, box, nmesh, G=u.COSMO.G, eps=eps,
            shortrange="cells", split="spline", part="long",
        ) / a

    def short_fn(pos, mass, a):
        g, ov = p3m_acc(
            pos, mass, box, nmesh, G=u.COSMO.G, eps=eps,
            shortrange="cells", split="spline", part="short",
            with_overflow=True,
        )
        return g / a, ov

    n_ref = None  # capacity resolved per call below

    def short_masked_fn(pos, mass, act, a):
        r_s, r_cut, ncell, cap = p3m_short_params(box, nmesh, pos.shape[0])
        g, ov_s, ov_t, occ_t = p3m_short_cells_pallas_masked(
            pos, mass, act, box, eps, r_s, r_cut, G=u.COSMO.G,
            ncell=ncell, capacity=cap, target_capacity=cap,
            split="spline",
        )
        return g / a, ov_s, ov_t, occ_t

    return long_fn, short_fn, short_masked_fn


def test_rung_active_min():
    # n_rungs=3, n_sub=4: tick 1,3 -> only rung 2; tick 2 -> rungs >= 1
    assert rung_active_min(1, 3) == 2
    assert rung_active_min(2, 3) == 1
    assert rung_active_min(3, 3) == 2
    assert rung_active_min(2, 2) == 0


def test_kick_tables_sum_to_full_kick():
    """Each rung's factors over a step sum to the same total kick
    integral (they partition [a0, a1] differently, but the sum of exact
    sub-interval integrals telescopes)."""
    from nbody.integrate.cosmo_stepping import cosmo_kick_drift_factors

    cosmo = Cosmology()
    a_grid = log_a_steps(0.1, 0.5, 5)
    Fk, Dr, A_sub = rung_kick_tables(cosmo, a_grid, 3)
    K1, Drg, K2, _ = cosmo_kick_drift_factors(cosmo, a_grid)
    total = Fk.sum(axis=1)  # (n_steps, R)
    for r in range(3):
        # sub-interval trapezoids differ per rung partition -> ~1e-7
        np.testing.assert_allclose(total[:, r], K1 + K2, rtol=1e-6)
    np.testing.assert_allclose(Dr.sum(axis=1), Drg, rtol=1e-6)


def test_single_rung_matches_subcycled():
    """All particles on the deepest rung (eta -> 0 forces rung R-1) must
    reproduce run_cosmological_subcycled with n_sub = 2^(R-1) exactly —
    every tick is then a full-population tick."""
    n, box, nmesh = 2048, 80.0, 48
    cosmo, state = _cosmo_system(n, box, seed=11)
    a_grid = log_a_steps(0.5, 0.6, 4)
    long_fn, short_fn, short_masked_fn = _force_fns(box, nmesh)

    final, ov, ovm, ovt, occt, ovst, hists = run_cosmological_rungs(
        state, cosmo, a_grid, long_fn, short_fn, short_masked_fn,
        box, n_rungs=2, cell=box / nmesh, eta_disp=1e-9,
    )
    assert int(ov) == 0 and int(ovt) == 0
    # everyone assigned to the deepest rung
    assert np.asarray(hists)[:, -1].min() == n

    ref, ov2 = run_cosmological_subcycled(
        state, cosmo, a_grid, long_fn, short_fn, box, 2
    )
    assert int(ov2) == 0
    np.testing.assert_allclose(
        np.asarray(final.pos), np.asarray(ref.pos), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(final.vel), np.asarray(ref.vel), rtol=1e-5, atol=1e-5
    )


def test_all_slow_matches_plain_kdk():
    """eta -> huge puts everyone on rung 0: one short kick per global
    step == the n_sub=1 subcycled integrator."""
    n, box, nmesh = 1024, 80.0, 32
    cosmo, state = _cosmo_system(n, box, seed=7)
    a_grid = log_a_steps(0.5, 0.55, 3)
    long_fn, short_fn, short_masked_fn = _force_fns(box, nmesh)

    final, ov, ovm, ovt, occt, ovst, hists = run_cosmological_rungs(
        state, cosmo, a_grid, long_fn, short_fn, short_masked_fn,
        box, n_rungs=2, cell=box / nmesh, eta_disp=1e9,
    )
    assert int(ov) == 0 and int(ovt) == 0
    assert np.asarray(hists)[:, 0].min() == n

    ref, _ = run_cosmological_subcycled(
        state, cosmo, a_grid, long_fn, short_fn, box, 1
    )
    # two half-drifts vs one full drift round differently in f32
    np.testing.assert_allclose(
        np.asarray(final.pos), np.asarray(ref.pos), rtol=1e-6, atol=5e-5
    )


def test_mixed_rungs_stay_close_to_uniform_subcycling():
    """With a physical eta the populations split and the trajectory
    stays within the time-discretisation difference of the uniformly
    subcycled run (the schemes agree in the small-step limit)."""
    n, box, nmesh = 2048, 60.0, 48
    cosmo, state = _cosmo_system(n, box, seed=3, vel_scale=0.004)
    a_grid = log_a_steps(0.5, 0.6, 8)
    long_fn, short_fn, short_masked_fn = _force_fns(box, nmesh)

    final, ov, ovm, ovt, occt, ovst, hists = run_cosmological_rungs(
        state, cosmo, a_grid, long_fn, short_fn, short_masked_fn,
        box, n_rungs=3, cell=box / nmesh, eta_disp=0.25,
    )
    assert int(ov) == 0 and int(ovt) == 0
    h = np.asarray(hists)
    assert (h.sum(axis=1) == n).all()

    ref, _ = run_cosmological_subcycled(
        state, cosmo, a_grid, long_fn, short_fn, box, 4
    )
    # same discretisation class: displacements agree to a small fraction
    # of the rms displacement for essentially all particles (individual
    # chaotic close encounters may diverge under ANY cadence change, so
    # the bound is on p99, not the max)
    dp = np.asarray(final.pos) - np.asarray(ref.pos)
    dp -= box * np.round(dp / box)
    moved = np.asarray(ref.pos) - np.asarray(state.pos)
    moved -= box * np.round(moved / box)
    rms = np.sqrt((moved**2).sum(axis=1)).mean()
    d = np.sqrt((dp**2).sum(axis=1))
    assert np.percentile(d, 99) < 0.05 * rms
    assert np.median(d) < 0.01 * rms


def test_driver_rung_run_logs_populations(tmp_path):
    """config.rungs routes run_simulation through the rung integrator;
    run.log carries per-step CONCEPT-style 'Rung population' lines."""
    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import run_simulation

    cfg = SimulationConfig(
        n_side=12, box=60.0, solver="p3m", pm_grid=48, n_steps=4,
        rungs=2, a_begin=0.2, a_end=0.3,
        output=OutputConfig(snapshot_times=(0.3,), powerspec_bins=8,
                            powerspec=False, snapshot=False,
                            energy_log=False),
    )
    res = run_simulation(cfg, seed=2, workdir=str(tmp_path))
    log = (tmp_path / "run.log").read_text()
    lines = [ln for ln in log.splitlines() if "Rung population" in ln]
    assert len(lines) == cfg.n_steps
    # populations sum to N on every step
    for ln in lines:
        pops = [int(x) for x in ln.split("matter:")[1].split(",")]
        assert sum(pops) == cfg.n_particles
    assert res.state.n == cfg.n_particles


def test_driver_rung_rejects_bad_combos():
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import run_simulation

    with pytest.raises(ValueError):
        run_simulation(
            SimulationConfig(solver="pm", rungs=2, n_side=8), workdir=""
        )


def test_adaptive_rung_runner_matches_fixed_grid_when_demand_slack():
    """With per-particle demand far above dla_max the adaptive chooser
    takes exactly dla_max steps and every particle sits on rung 0 — the
    trajectory must reproduce the fixed-grid rung integrator on the
    equivalent log-a grid (device GL tables vs host trapezoid tables
    agree to ~1e-12 for these smooth integrands)."""
    from nbody.integrate.cosmo_stepping import make_adaptive_rung_runner

    box, nmesh, n = 80.0, 32, 512
    cosmo, state = _cosmo_system(n, box, vel_scale=1e-5,
                                 dtype=jnp.float64)
    long_fn, short_fn, short_masked_fn = _force_fns(box, nmesh)

    dla_max = 0.025
    n_steps = 4
    a0 = 0.5
    a_end = float(np.exp(np.log(a0) + n_steps * dla_max))
    a_grid = log_a_steps(a0, a_end, n_steps)

    final_f, ov, ovm, ovt, occt, ovst, hists = run_cosmological_rungs(
        state, cosmo, a_grid, long_fn, short_fn, short_masked_fn,
        box, n_rungs=3, cell=box / nmesh, eta_disp=1e9,
    )
    run = make_adaptive_rung_runner(
        cosmo, long_fn, short_fn, short_masked_fn, box, box / nmesh,
        dla_max=dla_max, eta_disp=1e9, eta_acc=0.0, eps=0.0,
        max_steps=16, n_rungs=3,
    )
    final_a, n, ova, ovma, ovta, occta, ovsta, dla, hist = run(state, a_end)

    # arrival at a_end is exact up to one trailing ulp micro-step
    assert n_steps <= int(n) <= n_steps + 1
    assert int(ova) == 0 and int(ovta) == 0
    # every particle on rung 0 in the last step
    np.testing.assert_array_equal(
        np.asarray(hist), [state.pos.shape[0], 0, 0]
    )
    np.testing.assert_allclose(
        np.asarray(final_a.pos), np.asarray(final_f.pos),
        rtol=0, atol=1e-8 * box,
    )
    np.testing.assert_allclose(
        np.asarray(final_a.vel), np.asarray(final_f.vel),
        rtol=1e-6, atol=1e-9 * float(jnp.abs(final_f.vel).max()),
    )


def test_adaptive_rung_runner_mixed_rungs_sane():
    """With binding demand the adaptive-rung runner chooses steps wider
    than the demand floor (the deepest rung absorbs the fastest
    particles — the step must NOT collapse to the rung-less chooser's
    min-demand step), populates several rungs, and conserves
    finiteness."""
    from nbody.integrate.cosmo_stepping import (
        make_adaptive_cosmo_runner, make_adaptive_rung_runner,
    )

    box, nmesh, n = 80.0, 32, 768
    cosmo, state = _cosmo_system(n, box, vel_scale=0.02)
    long_fn, short_fn, short_masked_fn = _force_fns(box, nmesh)

    def acc_checked(pos, mass, a):
        g, ov = p3m_acc(
            pos, mass, box, nmesh, G=u.COSMO.G, eps=0.1,
            shortrange="cells", split="spline", with_overflow=True,
        )
        return g / a, ov

    a_end = 0.56
    run_r = make_adaptive_rung_runner(
        cosmo, long_fn, short_fn, short_masked_fn, box, box / nmesh,
        dla_max=0.03, eta_disp=0.25, eta_acc=0.0, eps=0.0,
        max_steps=64, n_rungs=3,
    )
    final, n_r, ov, ovm, ovt, occt, ovst, dla, hist = run_r(state, a_end)
    assert bool(jnp.all(jnp.isfinite(final.pos)))
    assert float(final.time) == pytest.approx(a_end, rel=1e-6)
    h = np.asarray(hist)
    assert h.sum() == n and h[1:].sum() > 0  # rungs actually used

    run_g = make_adaptive_cosmo_runner(
        cosmo, acc_checked, box, box / nmesh,
        dla_max=0.03, eta_disp=0.25, max_steps=256, n_rungs=3,
    )
    _, n_g, _, _, _ = run_g(state, a_end)
    # the global chooser pays min-demand steps for ALL particles; the
    # rung runner's background step is up to 2^(n_rungs-1) wider
    assert int(n_r) <= int(n_g)


def test_driver_adaptive_rungs_end_to_end(tmp_path):
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import run_simulation

    cfg = SimulationConfig(
        solver="p3m", n_side=12, box=60.0, pm_grid=48, n_steps=64,
        a_begin=0.3, a_end=0.4, rungs=3, time_stepping="adaptive",
    )
    res = run_simulation(cfg, seed=0, workdir=str(tmp_path))
    assert np.all(np.isfinite(np.asarray(res.state.pos)))
    log = (tmp_path / "run.log").read_text()
    assert "Rung population" in log and "dln(a)" in log
