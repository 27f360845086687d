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


class TestResidualDecomposition:
    """VERDICT round-1 item #5: separate 'LI machinery / integrator bug'
    from 'momentum-conserving-PM floor' with force-consistent energy
    functionals.  With a force that IS the gradient of the sampled W,
    the residual collapses to pure time-stepping error."""

    def test_ewald_force_is_energy_gradient(self):
        """Autodiff cross-check: -grad(U_ewald)/m == ewald_pp_acc(eps=0)."""
        import jax
        import jax.numpy as jnp

        from nbody.forces.ewald import ewald_potential_energy, ewald_pp_acc

        rng = np.random.default_rng(8)
        n, box = 12, 60.0
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
        mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))
        grad = jax.grad(
            lambda p: ewald_potential_energy(p, mass, box, G=1.3)
        )(pos)
        g_from_U = np.asarray(-grad / mass[:, None])
        g = np.asarray(ewald_pp_acc(pos, mass, box, eps=0.0, G=1.3))
        # max-norm relative: components can vanish individually
        assert np.abs(g_from_U - g).max() < 1e-6 * np.abs(g).max()

    def test_li_residual_exact_pp_is_stepping_error(self):
        """Ewald PP force + exact Ewald W: residual << the PM floor."""
        import jax.numpy as jnp

        from nbody.core import units as u
        from nbody.diagnostics.layzer_irvine import peculiar_energies_exact
        from nbody.forces.ewald import ewald_pp_acc

        cfg = SimulationConfig(n_side=8, box=100.0, solver="pp", a_end=0.3)
        state = realize_ics(cfg, seed=2)
        cosmo = cfg.cosmology()

        def acc(pos, mass, a):
            return ewald_pp_acc(
                pos, mass, cfg.box, eps=0.0, G=u.COSMO.G
            ) / jnp.asarray(a, pos.dtype)

        # diag_every=1: the LI *integral* is evaluated by trapezoid over
        # the samples; with W ~ 1/a early, coarse sampling adds its own
        # O(h^2) quadrature error on top of the integrator's
        grid = log_a_steps(cfg.a_begin, 0.3, 48)
        _, a, T, W = run_cosmological_with_diagnostics(
            state, cosmo, grid, acc, cfg.box, cfg.mesh_size, diag_every=1,
            energies_fn=lambda st: peculiar_energies_exact(st, cosmo, cfg.box),
        )
        assert layzer_irvine_residual(a, T, W) < 1e-3

    def test_li_residual_energy_conserving_pm_is_stepping_error(self):
        """Energy-conserving PM force + raw sampled W: residual is pure
        stepping error even at mesh = 2x lattice and a -> 1, proving the
        production (momentum-conserving) few-% residual is the
        force/energy-functional mismatch, not a bug."""
        from nbody.forces.pm import make_pm_energy_cosmo_force

        # deconvolve_p=0 in BOTH the force and the W functional: the p=2
        # deconvolution amplifies the offset-dependent self-energy whose
        # gradient (a real force here, by construction) grid-heats the
        # system into an unconverged trajectory; the p=0 kernel keeps the
        # self-force small while preserving exact force/energy
        # consistency, so the residual shows pure dt^2 stepping error
        cfg = SimulationConfig(n_side=8, box=300.0, solver="pm", pm_grid=16)
        state = realize_ics(cfg, seed=2)
        cosmo = cfg.cosmology()
        acc = make_pm_energy_cosmo_force(
            cosmo, cfg.box, cfg.pm_grid, deconvolve_p=0
        )
        grid = log_a_steps(cfg.a_begin, 1.0, 192)
        _, a, T, W = run_cosmological_with_diagnostics(
            state, cosmo, grid, acc, cfg.box, cfg.pm_grid, diag_every=1,
            energies_fn=lambda st: peculiar_energies(
                st, cosmo, cfg.box, cfg.pm_grid, subtract_self=False,
                deconvolve_p=0,
            ),
        )
        assert layzer_irvine_residual(a, T, W) < 5e-3
