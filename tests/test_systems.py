"""North-star system configs (BASELINE.json configs[0..4]) as tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody.core import units
from nbody.diagnostics import (
    center_of_mass,
    energy_drift,
    momentum,
    total_energy,
    virial_ratio,
)
from nbody.forces import direct_acc
from nbody.ic import systems
from nbody.integrate import run, run_adaptive


class TestSolarSystem:
    """Config 1: Sun + planets, 100-year integration, energy-drift check."""

    def test_hundred_year_energy_drift(self):
        state = systems.solar_system(seed=0)
        G = units.SOLAR.G
        eps = 1e-6

        def acc_fn(pos, mass):
            return direct_acc(pos, mass, eps=eps, G=G), None

        e0 = float(total_energy(state, eps=eps, G=G))
        # dt = 1 day in years; 100 years (Mercury: ~88 steps/orbit)
        dt = 1.0 / 365.25
        final = run(state, dt, int(100.0 / dt), acc_fn)
        e1 = float(total_energy(final, eps=eps, G=G))
        assert abs((e1 - e0) / e0) < 5e-6
        # momentum conserved at float64 level
        p = np.asarray(momentum(final))
        assert np.abs(p).max() < 1e-10

    def test_bodies_remain_bound(self):
        state = systems.solar_system(seed=0)
        G = units.SOLAR.G

        def acc_fn(pos, mass):
            return direct_acc(pos, mass, eps=1e-6, G=G), None

        final = run(state, 4.0 / 365.25, 2000, acc_fn)
        r = np.linalg.norm(np.asarray(final.pos) - np.asarray(final.pos[0]), axis=1)
        assert r[1:].max() < 100.0  # all inside ~2x Pluto's aphelion


class TestColdCollapse:
    """Config 3: cold uniform sphere collapses; adaptive dt follows it."""

    def test_collapse_shrinks_radius(self):
        state = systems.cold_collapse(512, seed=1)

        def acc_fn(pos, mass):
            return direct_acc(pos, mass, eps=0.05, G=1.0), None

        # free-fall time of a uniform G=M=1, R=1 sphere ~ pi/2 * sqrt(R^3/(2GM))
        t_ff = np.pi / 2 * np.sqrt(1.0 / 2.0)
        res = run_adaptive(state, 0.9 * t_ff, acc_fn, eps=0.05, eta=0.1,
                           dt_limit=0.05)
        r0 = float(jnp.median(jnp.linalg.norm(state.pos, axis=1)))
        r1 = float(jnp.median(jnp.linalg.norm(res.state.pos, axis=1)))
        assert np.isfinite(np.asarray(res.state.pos)).all()
        assert r1 < 0.6 * r0  # substantially collapsed
        assert float(res.dt_min) < float(res.dt_max)  # stepped adaptively


class TestMerger:
    """Config 5 (scaled down): two Plummer spheres approach and merge."""

    def test_galaxies_approach(self):
        state = systems.two_galaxy_merger(1024, seed=2, separation=6.0,
                                          relative_speed=0.4)
        n1 = 512

        def sep(st):
            c1 = np.asarray(st.pos[:n1]).mean(0)
            c2 = np.asarray(st.pos[n1:]).mean(0)
            return float(np.linalg.norm(c1 - c2))

        def acc_fn(pos, mass):
            return direct_acc(pos, mass, eps=0.05, G=1.0), None

        s0 = sep(state)
        final = run(state, 5e-3, 800, acc_fn)
        assert np.isfinite(np.asarray(final.pos)).all()
        assert sep(final) < 0.8 * s0  # approaching / merging
        # total momentum stays ~0 (COM frame construction)
        assert np.abs(np.asarray(momentum(final))).max() < 1e-3


class TestPlummerVirial:
    """Config 3: virial-equilibrium hold (the reference has no such
    diagnostic; BASELINE.json demands it)."""

    def test_virial_ratio_near_one(self):
        # virial_ratio = -2 E_kin / E_pot, 1.0 at equilibrium
        state = systems.plummer(4096, seed=0, dtype=jnp.float64)
        q = float(virial_ratio(state, eps=0.0, G=1.0))
        assert q == pytest.approx(1.0, abs=0.06)
