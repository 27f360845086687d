"""Integrator physics oracles (SURVEY.md §4: Kepler two-body, conservation
drift bounds, virial equilibrium)."""

import functools

import jax.numpy as jnp
import numpy as np

from nbody.core import units
from nbody.diagnostics import energy as diag
from nbody.forces.allpairs import direct_acc, direct_potential
from nbody.ic import systems
from nbody.integrate.leapfrog import run, run_with_diagnostics


def make_acc_fn(eps=0.0, G=1.0):
    def acc_fn(pos, mass):
        acc = direct_acc(pos, mass, eps=eps, G=G)
        return acc, jnp.zeros(pos.shape[0], pos.dtype)

    return acc_fn


def test_kepler_orbit_closes():
    """Earth-Sun two-body: after one period the orbit returns to its start
    (BASELINE.json configs[0])."""
    G = units.SOLAR.G
    state = systems.two_body(G=G)
    period = systems.kepler_period(1.0, 1.0 + 3.0035e-6, G=G)
    n_steps = 2048
    dt = period / n_steps
    final = run(state, dt, n_steps, make_acc_fn(G=G))
    # relative separation should return to perihelion
    sep0 = state.pos[1] - state.pos[0]
    sep1 = final.pos[1] - final.pos[0]
    np.testing.assert_allclose(np.asarray(sep1), np.asarray(sep0), atol=2e-4)


def test_kepler_energy_and_angular_momentum():
    G = units.SOLAR.G
    state = systems.two_body(G=G)
    period = systems.kepler_period(1.0, 1.0 + 3.0035e-6, G=G)
    n = 4096
    final, d0, diags = run_with_diagnostics(
        state, period / n, n, make_acc_fn(G=G), diag_every=16
    )
    e0 = float(diag.kinetic_energy(state) + diag.potential_energy(state, G=G))
    e_final = float(
        diag.kinetic_energy(final) + diag.potential_energy(final, G=G)
    )
    assert abs((e_final - e0) / e0) < 1e-8
    l0 = np.asarray(diag.angular_momentum(state))
    l1 = np.asarray(diag.angular_momentum(final))
    np.testing.assert_allclose(l1, l0, rtol=1e-12, atol=1e-15)


def test_momentum_conservation_nbody():
    state = systems.plummer(256, seed=1, dtype=jnp.float64)
    eps = 0.01
    final = run(state, 0.01, 200, make_acc_fn(eps=eps))
    p0 = np.asarray(diag.momentum(state))
    p1 = np.asarray(diag.momentum(final))
    np.testing.assert_allclose(p1, p0, atol=1e-10)


def test_plummer_energy_drift():
    """Softened Plummer sphere: |dE/E| stays small over 500 steps — the
    north-star diagnostic (BASELINE.json: |dE/E| < 1e-4 over 10k steps)."""
    eps = 0.02
    state = systems.plummer(512, seed=2, dtype=jnp.float64)

    def acc_fn(pos, mass):
        acc = direct_acc(pos, mass, eps=eps)
        return acc, jnp.zeros(pos.shape[0], pos.dtype)

    e0 = float(
        diag.kinetic_energy(state) + direct_potential(state.pos, state.mass, eps=eps)
    )
    final = run(state, 1e-3, 500, acc_fn)
    e1 = float(
        diag.kinetic_energy(final) + direct_potential(final.pos, final.mass, eps=eps)
    )
    assert abs((e1 - e0) / e0) < 1e-5


def test_plummer_virial_equilibrium():
    """Henon-units Plummer sphere: E = -1/4 and -2K/U ~ 1 (statistical)."""
    state = systems.plummer(8192, seed=0, dtype=jnp.float64)
    q = float(diag.virial_ratio(state))
    assert abs(q - 1.0) < 0.05
    e_tot = float(diag.total_energy(state))
    assert abs(e_tot - (-0.25)) < 0.02


def test_diagnostics_series():
    state = systems.plummer(128, seed=4, dtype=jnp.float64)
    eps = 0.05
    G = 1.0

    def acc_fn(pos, mass):
        from nbody.forces.allpairs import _pair_terms

        acc, pot = _pair_terms(pos, pos, mass, jnp.asarray(eps**2))
        phi = -G * (pot - mass / eps)
        return G * acc, phi

    final, d0, diags = run_with_diagnostics(state, 1e-3, 64, acc_fn, diag_every=8)
    e = np.asarray(diags.e_kin + diags.e_pot)
    e0 = float(d0.e_kin + d0.e_pot)
    assert diags.time.shape == (8,)
    assert float(diag.energy_drift(jnp.concatenate([jnp.array([e0]), e]))) < 1e-6


class TestAdaptive:
    """Adaptive global stepping + rung diagnostics (CONCEPT's adaptive
    rungs observable, SURVEY.md §0 'Rung population')."""

    def test_kepler_adaptive_conserves_energy(self):
        import jax.numpy as jnp
        import numpy as np

        from nbody.core import units
        from nbody.diagnostics import total_energy
        from nbody.forces import direct_acc, direct_potential
        from nbody.ic import systems
        from nbody.integrate import run_adaptive

        # eccentric two-body orbit: adaptive dt must shrink at pericentre
        state = systems.two_body(e=0.7)
        G = units.SOLAR.G

        def acc_fn(pos, mass):
            return direct_acc(pos, mass, eps=1e-4, G=G), None

        e0 = float(total_energy(state, eps=1e-4, G=G))
        res = run_adaptive(state, 1.0, acc_fn, eps=1e-2, eta=0.05)
        assert float(res.state.time) == 1.0
        assert int(res.n_steps) > 0
        assert float(res.dt_min) < float(res.dt_max)  # it adapted
        e1 = float(total_energy(res.state, eps=1e-4, G=G))
        assert abs((e1 - e0) / e0) < 1e-4

    def test_rung_population(self):
        import jax.numpy as jnp
        import numpy as np

        from nbody.integrate import rung_population

        acc = jnp.asarray([[1e-6, 0, 0], [1.0, 0, 0], [100.0, 0, 0]])
        pop = np.asarray(rung_population(acc, dt_base=0.1, eps=0.01, n_rungs=8))
        assert pop.sum() == 3
        assert pop[0] >= 1          # slow particle on rung 0
        assert pop[1:].sum() >= 1   # fast particle demoted to a finer rung
