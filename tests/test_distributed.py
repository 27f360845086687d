"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: "multi-chip tests that run under a mocked mesh")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody.core.cosmology import Cosmology
from nbody.diagnostics import energy as diag
from nbody.distributed.sharding import (
    device_mesh,
    make_ring_acc_fn,
    make_sharded_pm_cosmo_force,
    shard_state,
)
from nbody.forces.allpairs import direct_acc, direct_potential
from nbody.forces.pm import make_pm_cosmo_force
from nbody.ic import systems
from nbody.integrate.leapfrog import run


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return device_mesh(8)


def test_ring_matches_dense_oracle(mesh8):
    state = systems.plummer(512, seed=0, dtype=jnp.float64)
    eps, G = 0.05, 1.3
    st = shard_state(state, mesh8)
    acc_fn = make_ring_acc_fn(mesh8, eps=eps, G=G)
    acc, phi = jax.jit(acc_fn)(st.pos, st.mass)
    acc_ref = direct_acc(state.pos, state.mass, eps=eps, G=G)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref), rtol=1e-9, atol=1e-12)
    e_pot = 0.5 * float(jnp.sum(st.mass * phi))
    e_ref = float(direct_potential(state.pos, state.mass, eps=eps, G=G))
    np.testing.assert_allclose(e_pot, e_ref, rtol=1e-10)


def test_ring_simulation_conserves_energy(mesh8):
    """Full KDK run through the ring force — the multi-chip training-step
    analogue; energy must be conserved like the single-device path."""
    eps = 0.05
    state = systems.plummer(256, seed=1, dtype=jnp.float64)
    st = shard_state(state, mesh8)
    acc_fn = make_ring_acc_fn(mesh8, eps=eps)
    e0 = float(diag.kinetic_energy(st) + direct_potential(st.pos, st.mass, eps=eps))
    final = run(st, 1e-3, 100, acc_fn)
    e1 = float(
        diag.kinetic_energy(final) + direct_potential(final.pos, final.mass, eps=eps)
    )
    assert abs((e1 - e0) / e0) < 1e-6
    # output sharding preserved across the scan
    assert final.pos.sharding.spec == st.pos.sharding.spec


def test_sharded_pm_matches_single_device(mesh8):
    cosmo = Cosmology()
    box, nmesh = 500.0, 16
    rng = np.random.default_rng(3)
    n = 1024
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    mass = jnp.full((n,), 2.0, jnp.float64)
    a = jnp.asarray(0.5)

    ref_fn = make_pm_cosmo_force(cosmo, box, nmesh)
    g_ref = ref_fn(pos, mass, a)

    sharded = jax.device_put(
        pos, jax.sharding.NamedSharding(mesh8, jax.sharding.PartitionSpec("shard"))
    )
    pm_fn = make_sharded_pm_cosmo_force(cosmo, box, nmesh, mesh8)
    g = jax.jit(pm_fn)(sharded, mass, a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-8, atol=1e-12)


def test_ring_deterministic_across_shardings():
    """Seeded reproducibility: the ring result with D=4 equals D=8
    (deterministic accumulation order within each device, same total)."""
    state = systems.plummer(256, seed=5, dtype=jnp.float64)
    accs = []
    for d in (4, 8):
        mesh = device_mesh(d)
        st = shard_state(state, mesh)
        acc_fn = make_ring_acc_fn(mesh, eps=0.02)
        acc, _ = jax.jit(acc_fn)(st.pos, st.mass)
        accs.append(np.asarray(acc))
    np.testing.assert_allclose(accs[0], accs[1], rtol=1e-12)


class TestProfiling:
    def test_step_timer(self):
        import time as _time

        from nbody.diagnostics import StepTimer

        t = StepTimer(n_particles=100)
        with t.measure(steps=10):
            _time.sleep(0.01)
        rep = t.report()
        assert rep.steps == 10 and rep.wall_s >= 0.01
        assert rep.interactions_per_s > 0
        assert "steps/s" in str(rep)

    def test_benchmark_fn(self):
        import jax.numpy as jnp

        from nbody.diagnostics import benchmark_fn

        f = lambda x: (x * 2).sum()
        dt = benchmark_fn(f, jnp.ones(100), reps=3)
        assert dt > 0

    def test_pairwise_interactions(self):
        from nbody.diagnostics import pairwise_interactions

        assert pairwise_interactions(10, steps=5) == 100 * 6


class TestShardedP3M:
    def test_matches_single_device(self):
        """Slab-decomposed P3M == single-device P3M (f32 tolerance)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nbody.core import units as u
        from nbody.core.cosmology import Cosmology
        from nbody.distributed.sharding import (
            device_mesh,
            make_sharded_p3m_cosmo_force,
        )
        from nbody.forces.p3m import p3m_acc

        cosmo = Cosmology()
        # box=80, nmesh=48 -> r_cut=9.375 -> ncell=8 == axis size
        n, box, nmesh = 2048, 80.0, 48
        rho_crit = 3.0 * cosmo.H0**2 / (8.0 * np.pi * u.COSMO.G)
        pmass = float(rho_crit * cosmo.Omega_m * box**3 / n)
        rng = np.random.default_rng(4)
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
        mass = jnp.full((n,), pmass, jnp.float32)
        mesh = device_mesh(8)
        sh = NamedSharding(mesh, P("shard"))
        fn = make_sharded_p3m_cosmo_force(
            cosmo, box, nmesh, mesh, eps=0.1, split="spline"
        )
        g = jax.jit(fn)(
            jax.device_put(pos, sh), jax.device_put(mass, sh),
            jnp.asarray(0.5, jnp.float32),
        )
        ref = p3m_acc(
            pos, mass, box, nmesh, G=u.COSMO.G, eps=0.1,
            shortrange="cells", split="spline",
        ) / 0.5
        gg, rr = np.asarray(g), np.asarray(ref)
        rel = np.linalg.norm(gg - rr, axis=-1) / np.maximum(
            np.linalg.norm(rr, axis=-1), 1e-12
        )
        assert np.median(rel) < 1e-5 and rel.max() < 1e-4
        assert g.sharding.spec == P("shard")

    def test_rejects_too_few_slabs(self):
        import pytest

        from nbody.core.cosmology import Cosmology
        from nbody.distributed.sharding import (
            device_mesh,
            make_sharded_p3m_cosmo_force,
        )

        with pytest.raises(ValueError):
            make_sharded_p3m_cosmo_force(
                Cosmology(), 50.0, 16, device_mesh(8), eps=0.1
            )


class TestRingEwald:
    """Distributed exact periodic PP (round-3 VERDICT missing #4):
    ring-Ewald must match the single-device ewald_pp_acc to f32, and
    the driver must run solver='pp' with devices > 1."""

    def test_matches_single_device_ewald(self, mesh8):
        from nbody.distributed.sharding import make_ring_ewald_acc_fn
        from nbody.forces.ewald import ewald_pp_acc

        n, box = 512, 100.0
        rng = np.random.default_rng(41)
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
        mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
        acc_fn = make_ring_ewald_acc_fn(mesh8, box, eps=0.5)
        got = np.asarray(jax.jit(acc_fn)(pos, mass), np.float64)
        ref = np.asarray(
            ewald_pp_acc(pos, mass, box, eps=0.5), np.float64
        )
        scale = np.linalg.norm(ref, axis=1).max()
        err = np.linalg.norm(got - ref, axis=1) / scale
        assert err.max() < 2e-5

    def test_spline_softening(self, mesh8):
        from nbody.distributed.sharding import make_ring_ewald_acc_fn
        from nbody.forces.ewald import ewald_pp_acc

        n, box = 512, 100.0
        rng = np.random.default_rng(43)
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
        mass = jnp.ones((n,), jnp.float32)
        acc_fn = make_ring_ewald_acc_fn(
            mesh8, box, eps=0.5, softening="spline"
        )
        got = np.asarray(jax.jit(acc_fn)(pos, mass), np.float64)
        ref = np.asarray(
            ewald_pp_acc(pos, mass, box, eps=0.5, softening="spline"),
            np.float64,
        )
        scale = np.linalg.norm(ref, axis=1).max()
        err = np.linalg.norm(got - ref, axis=1) / scale
        assert err.max() < 2e-5

    def test_driver_pp_multidevice(self, tmp_path, mesh8):
        from nbody.driver.config import OutputConfig, SimulationConfig
        from nbody.driver.simulate import run_simulation

        cfg = SimulationConfig(
            n_side=8, box=200.0, solver="pp", n_steps=3, devices=8,
            output=OutputConfig(
                dir=str(tmp_path), snapshot_times=(1.0,),
                powerspec_bins=8,
            ),
        )
        res = run_simulation(cfg, seed=2, workdir=str(tmp_path))
        assert res.state.n == cfg.n_particles
        assert bool(jnp.isfinite(res.state.pos).all())
        # trajectory matches the single-device Ewald PP run
        ref = run_simulation(
            cfg.replace(devices=1,
                        output=cfg.output.replace(dir="", snapshot=False,
                                                  powerspec=False)),
            seed=2, workdir="",
        )
        np.testing.assert_allclose(
            np.asarray(res.state.pos), np.asarray(ref.state.pos),
            rtol=0, atol=5e-3,
        )
