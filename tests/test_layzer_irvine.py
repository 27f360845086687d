"""Layzer-Irvine cosmic energy budget tests."""

import numpy as np
import pytest

from nbody.diagnostics import (
    layzer_irvine_residual,
    peculiar_energies,
    run_cosmological_with_diagnostics,
)
from nbody.driver import SimulationConfig
from nbody.driver.simulate import build_cosmo_force, realize_ics
from nbody.integrate.cosmo_stepping import log_a_steps

CFG = SimulationConfig(n_side=16, box=300.0, solver="pm", pm_grid=16, n_steps=64)


def _run(cfg, steps):
    state = realize_ics(cfg, seed=2)
    acc = build_cosmo_force(cfg)
    grid = log_a_steps(cfg.a_begin, 1.0, steps)
    return run_cosmological_with_diagnostics(
        state, cfg.cosmology(), grid, acc, cfg.box, cfg.mesh_size,
        diag_every=max(1, steps // 16),
    )


def test_li_budget_holds():
    """The LI functional is conserved to the PM scheme's few-% floor
    over a = 0.02 -> 1 (mesh == particle lattice)."""
    _, a, T, W = _run(CFG, 64)
    assert layzer_irvine_residual(a, T, W) < 0.12
    # sanity: system ends gravitationally bound and virialising
    assert W[-1] < 0
    assert 0.3 < T[-1] / abs(W[-1]) < 3.0


def test_self_energy_subtraction_matters():
    """For a Poisson (random uniform) configuration the isolated-particle
    self model is exact in expectation: the corrected W is far smaller
    than the raw gathered W (which is dominated by self-energy)."""
    import jax.numpy as jnp

    from nbody.core.types import ParticleState
    from nbody.forces.pm import pm_potential_k
    from nbody.mesh.cic import cic_gather

    rng = np.random.default_rng(3)
    n = 16**3
    state = ParticleState.create(
        pos=rng.uniform(0, CFG.box, (n, 3)),
        vel=np.zeros((n, 3)),
        mass=np.full(n, 7.5e4),
        time=0.02,
        dtype=np.float64,
    )
    cosmo = CFG.cosmology()
    T, W = peculiar_energies(state, cosmo, CFG.box, CFG.mesh_size)
    a = float(state.time)
    amp = 1.5 * cosmo.Omega_m * cosmo.H0**2 / a
    phi_k = pm_potential_k(state.pos, state.mass, CFG.box, CFG.mesh_size) * amp
    phi = jnp.fft.irfftn(phi_k, s=(CFG.mesh_size,) * 3)
    W_raw = float(0.5 * jnp.sum(state.mass * cic_gather(phi, state.pos, CFG.box)))
    assert abs(float(W)) < 0.2 * abs(W_raw)


def test_energies_scale_with_growth():
    """T grows along the run (structure formation spins up velocities)."""
    _, a, T, W = _run(CFG, 32)
    assert T[-1] > 10 * T[0]
    assert a[0] == pytest.approx(CFG.a_begin) and a[-1] == pytest.approx(1.0)
