"""Spline softening kernel + subcycled split-Hamiltonian stepping.

CONCEPT parity: the reference's runs use the cubic-spline softening
kernel (exact Newton beyond h = 2.8 eps) and rung-subdivided short-range
kicks; these tests pin our equivalents.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody.forces.p3m import (
    _soft_newton_spline,
    p3m_acc,
    p3m_short_acc,
    p3m_short_cells_pallas,
    p3m_short_direct,
)


class TestSplineSoftening:
    def test_exact_newton_beyond_h(self):
        eps = 0.2
        h = 2.8 * eps
        r = jnp.asarray([h * 1.0001, 2 * h, 10 * h])
        w = _soft_newton_spline(r * r, eps * eps)
        np.testing.assert_allclose(np.asarray(w), 1.0 / np.asarray(r) ** 3,
                                   rtol=1e-12)

    def test_finite_and_continuous(self):
        eps = 0.3
        h = 2.8 * eps
        w0 = float(_soft_newton_spline(jnp.asarray(0.0), eps * eps))
        assert w0 == pytest.approx(32.0 / 3.0 / h**3, rel=1e-10)
        for u in (0.5, 1.0):
            lo = float(_soft_newton_spline(jnp.asarray((u * h - 1e-9) ** 2),
                                           eps * eps))
            hi = float(_soft_newton_spline(jnp.asarray((u * h + 1e-9) ** 2),
                                           eps * eps))
            assert lo == pytest.approx(hi, rel=1e-5)

    def test_momentum_conserved(self):
        """Newton's third law holds pairwise under spline softening."""
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(0, 50.0, (64, 3)))
        mass = jnp.asarray(rng.uniform(0.5, 2.0, (64,)))
        a = p3m_short_direct(pos, mass, 50.0, 0.5, 2.0, 9.0,
                             split="spline", softening="spline")
        ptot = np.asarray((a * mass[:, None]).sum(axis=0))
        assert np.abs(ptot).max() < 1e-10 * np.abs(np.asarray(a)).max()

    @pytest.mark.parametrize("split", ["gaussian", "spline"])
    def test_kernels_match_oracle(self, split):
        rng = np.random.default_rng(1)
        n, box = 512, 40.0
        eps, r_s, r_cut = 0.3, 1.6, 7.2
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
        mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))
        ref = p3m_short_direct(pos, mass, box, eps, r_s, r_cut,
                               split=split, softening="spline")
        dense = p3m_short_acc(pos, mass, box, eps, r_s, r_cut,
                              split=split, softening="spline")
        np.testing.assert_allclose(np.asarray(dense), np.asarray(ref),
                                   rtol=2e-5, atol=1e-10)
        cells, ov = p3m_short_cells_pallas(
            pos, mass, box, eps, r_s, r_cut, ncell=5, capacity=64,
            split=split, softening="spline",
        )
        assert int(ov) == 0
        np.testing.assert_allclose(np.asarray(cells), np.asarray(ref),
                                   rtol=2e-4, atol=2e-7)

    def test_spline_binds_tighter_than_plummer(self):
        """At r ~ few eps the spline force exceeds Plummer (the Plummer
        tail suppression this kernel removes)."""
        eps = 0.25
        r = jnp.asarray([2.0 * eps, 4.0 * eps, 8.0 * eps])
        w_p = p3m_short_direct(
            jnp.asarray([[0.0, 0, 0], [float(r[1]), 0, 0]]),
            jnp.ones(2), 100.0, eps, 2.0, 50.0, softening="plummer",
        )
        w_s = p3m_short_direct(
            jnp.asarray([[0.0, 0, 0], [float(r[1]), 0, 0]]),
            jnp.ones(2), 100.0, eps, 2.0, 50.0, softening="spline",
        )
        assert abs(float(w_s[0, 0])) > abs(float(w_p[0, 0]))


class TestSubcycledStepping:
    def _setup(self):
        from nbody.driver.config import OutputConfig, SimulationConfig
        from nbody.driver.simulate import realize_ics

        cfg = SimulationConfig(
            n_side=8, box=250.0, pm_grid=16, solver="p3m", n_steps=6,
            a_begin=0.4, shortrange="allpairs",
            output=OutputConfig(snapshot_times=(), powerspec=False,
                                snapshot=False),
        )
        return cfg, realize_ics(cfg, seed=3)

    def test_nsub1_matches_plain_kdk(self):
        """n_sub = 1 is algebraically the plain KDK (the long and short
        kicks at each half-step share the evaluation point)."""
        from nbody.driver.simulate import (
            build_cosmo_force,
            build_cosmo_force_split,
        )
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_checked,
            run_cosmological_subcycled,
        )

        cfg, state = self._setup()
        cosmo = cfg.cosmology()
        grid = log_a_steps(cfg.a_begin, 1.0, cfg.n_steps)
        acc = build_cosmo_force(cfg, checked=True)
        lf, sf = build_cosmo_force_split(cfg)
        s1, ov1 = run_cosmological_checked(state, cosmo, grid, acc, cfg.box)
        s2, ov2 = run_cosmological_subcycled(
            state, cosmo, grid, lf, sf, cfg.box, 1
        )
        assert int(ov1) == int(ov2) == 0
        np.testing.assert_allclose(
            np.asarray(s1.pos), np.asarray(s2.pos), rtol=1e-10, atol=1e-9
        )

    def test_subcycles_resolve_tight_binary(self):
        """A tight pair whose orbital period is shorter than the global
        step: subcycling the short-range force tracks the fine-step
        truth far better than plain KDK at the same global grid — the
        halo-core situation CONCEPT's rungs exist for."""
        from nbody.core.types import ParticleState
        from nbody.driver.config import OutputConfig, SimulationConfig
        from nbody.driver.simulate import (
            build_cosmo_force,
            build_cosmo_force_split,
        )
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_checked,
            run_cosmological_subcycled,
        )

        cfg = SimulationConfig(
            n_side=2, box=100.0, pm_grid=8, solver="p3m",
            shortrange="allpairs", softening_frac=0.001,
            output=OutputConfig(snapshot_times=(), powerspec=False,
                                snapshot=False),
        )
        from nbody.core import units as u

        cosmo = cfg.cosmology()
        # bound circular binary, 1 Mpc apart, orbital period ~0.3 Gyr
        # << the ~1.4 Gyr a=0.9->1 span covered by 6 global steps; six
        # light spectators keep the PM source sane
        rng = np.random.default_rng(5)
        a0, r, M = 0.9, 1.0, 1.4e8
        v_rel = np.sqrt(u.COSMO.G * M / r)
        pos = np.vstack([[50.0, 50.0, 50.0], [50.0 + r, 50.0, 50.0],
                         rng.uniform(5, 45, (6, 3))])
        vel = np.zeros((8, 3))
        vel[0, 1] = +a0 * v_rel / 2  # canonical p = a^2 dx/dt ~ a v_pec
        vel[1, 1] = -a0 * v_rel / 2
        mass = np.array([M / 2, M / 2] + [1e3] * 6)
        state = ParticleState.create(
            pos=jnp.asarray(pos), vel=jnp.asarray(vel),
            mass=jnp.asarray(mass), time=jnp.asarray(a0),
        )
        grid = log_a_steps(a0, 1.0, 6)
        acc = build_cosmo_force(cfg, checked=True)
        lf, sf = build_cosmo_force_split(cfg)

        def sep(st):
            d = np.asarray(st.pos[1]) - np.asarray(st.pos[0])
            d -= cfg.box * np.round(d / cfg.box)
            return float(np.linalg.norm(d))

        truth, _ = run_cosmological_checked(
            state, cosmo, log_a_steps(a0, 1.0, 1536), acc, cfg.box
        )
        plain, _ = run_cosmological_checked(state, cosmo, grid, acc, cfg.box)
        subc, _ = run_cosmological_subcycled(
            state, cosmo, grid, lf, sf, cfg.box, 64
        )
        # the resolved binary stays bound at ~1 Mpc; unresolved KDK
        # pumps orbital energy and disrupts it (measured: truth 0.74,
        # 64x subcycled 0.82, plain 33)
        e_plain = abs(sep(plain) - sep(truth))
        e_subc = abs(sep(subc) - sep(truth))
        assert sep(truth) < 3.0
        assert e_subc < 0.1 * e_plain

    def test_driver_subcycled_run(self, tmp_path):
        from nbody.driver.simulate import run_simulation

        cfg, state = self._setup()
        cfg = cfg.replace(
            subcycles=2,
            output=cfg.output.replace(dir=str(tmp_path),
                                      snapshot_times=(1.0,), snapshot=True),
        )
        res = run_simulation(cfg, seed=3, workdir=str(tmp_path))
        assert np.isfinite(np.asarray(res.state.pos)).all()
        assert abs(float(res.state.time) - 1.0) < 1e-9


class TestAdaptiveSubcycled:
    def test_adaptive_with_subcycles_runs_and_matches(self, tmp_path):
        """CONCEPT's actual stepping structure: adaptive background step
        + short-range subdivision.  The composed tier reaches a_end,
        logs rung populations, and lands near the plain adaptive
        trajectory (subcycling refines, not redirects)."""
        from nbody.driver.config import OutputConfig, SimulationConfig
        from nbody.driver.simulate import run_simulation

        base = SimulationConfig(
            n_side=8, box=250.0, pm_grid=16, solver="p3m", a_begin=0.5,
            shortrange="allpairs", time_stepping="adaptive",
            output=OutputConfig(snapshot_times=(), powerspec=False,
                                snapshot=False),
        )
        r1 = run_simulation(base, seed=2, workdir=str(tmp_path / "a"))
        r2 = run_simulation(base.replace(subcycles=4), seed=2,
                            workdir=str(tmp_path / "b"))
        log = open(tmp_path / "b" / "run.log").read()
        assert "Rung population: matter:" in log
        assert abs(float(r2.state.time) - 1.0) < 1e-9
        d = np.abs(np.asarray(r1.state.pos) - np.asarray(r2.state.pos)).max()
        assert d < 2.0
