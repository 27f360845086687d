"""Supercell PM tier (nbody/forces/pm_supercell.py): the MXU deposit
must match the XLA scatter deposit, and the fused short+PM kernel must
match the classic p3m_acc composition on the same chaining geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody.forces.p3m import p3m_acc
from nbody.forces.p3m_columns import (
    build_column_plane,
    column_window,
    ghost_slots,
    p3m_short_columns_pallas,
)
from nbody.forces.pm import pm_acc
from nbody.forces.pm_supercell import (
    p3m_supercell_acc,
    supercell_deposit_from_plane,
    supercell_geometry,
    supercell_params,
)
from nbody.mesh.cic import cic_deposit


def _uniform(n, box, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    return pos, mass


def test_supercell_geometry():
    assert supercell_geometry(128, 16) == (8, 256)
    assert supercell_geometry(128, 22) is None          # not a divisor
    assert supercell_geometry(128, 8) is None           # S = 16 > 13
    assert supercell_geometry(256, 32) == (8, 384)      # 257 -> 384 lanes


def test_supercell_params_picks_tiling_grid():
    r_s, r_cut, ncell, ck, w = supercell_params(500.0, 128, 1 << 20)
    assert 128 % ncell == 0 and 500.0 / ncell >= r_cut
    assert ncell == 16  # largest divisor <= box/r_cut = 22.7


def test_deposit_matches_cic():
    n, box, nmesh, ncell = 4000, 100.0, 32, 8
    pos, mass = _uniform(n, box)
    r_cut = 0.999 * box / ncell
    CK, W = 1024, 384
    plane, _, _, ovb, _, _, counts = build_column_plane(
        pos, mass, box, r_cut, ncell, CK, W)
    assert int(ovb) == 0
    gz = ghost_slots(CK, (r_cut / box) * CK)
    g = supercell_deposit_from_plane(
        plane, counts, box=box, nmesh=nmesh, ncell=ncell,
        stride=CK + 2 * gz, gz=gz)
    ref = cic_deposit(pos, box, nmesh, weights=mass)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               atol=5e-5 * float(ref.max()))
    np.testing.assert_allclose(float(g.sum()), float(mass.sum()), rtol=1e-5)


@pytest.mark.parametrize("split", ["spline", "gaussian"])
def test_fused_matches_classic_composition(split):
    """Fused supercell p3m == PM(part long) + columns short on the SAME
    chaining geometry (one sort + MXU deposit + in-kernel readback vs
    scatter deposit + XLA gather)."""
    n, box, nmesh = 6000, 100.0, 32
    pos, mass = _uniform(n, box, seed=3)
    r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
    acc, ov = p3m_supercell_acc(
        pos, mass, box, nmesh, eps=0.1, r_s=float(r_s),
        r_cut=float(r_cut), split=split, softening="spline",
        ncell=ncell, col_capacity=CK, window=W,
    )
    assert int(ov) == 0
    a_long = pm_acc(
        pos, mass, box, nmesh,
        longrange_split=float(r_s) if split == "gaussian" else 0.0,
        spline_split=float(r_cut) if split == "spline" else 0.0,
    )
    a_short, ov2 = p3m_short_columns_pallas(
        pos, mass, box, 0.1, float(r_s), float(r_cut),
        ncell=ncell, col_capacity=CK, window=W, split=split,
        softening="spline",
    )
    assert int(ov2) == 0
    ref = np.asarray(a_long, np.float64) + np.asarray(a_short, np.float64)
    got = np.asarray(acc, np.float64)
    scale = np.linalg.norm(ref, axis=1).max()
    err = np.linalg.norm(got - ref, axis=1) / scale
    assert err.max() < 2e-5


def test_p3m_acc_supercell_tier():
    """shortrange='supercell' through the public p3m_acc == the columns
    tier through p3m_acc (auto geometry resolution + fallbacks)."""
    n, box, nmesh = 6000, 100.0, 32
    pos, mass = _uniform(n, box, seed=5)
    a_sc, ov = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="supercell",
        split="spline", with_overflow=True,
    )
    assert int(ov) == 0
    a_cols = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="columns",
        split="spline",
    )
    ref = np.asarray(a_cols, np.float64)
    scale = np.linalg.norm(ref, axis=1).max()
    err = np.linalg.norm(np.asarray(a_sc, np.float64) - ref, axis=1) / scale
    assert err.max() < 2e-5


def test_resolved_shortrange_auto_picks_supercell():
    """The driver's auto rule mirrors p3m_acc: supercell beyond 64k
    particles when the mesh tiles a chaining grid, columns otherwise."""
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import _resolved_shortrange, _tier_ncell

    big = SimulationConfig(n_side=48, box=500.0, solver="p3m", pm_grid=128)
    assert _resolved_shortrange(big) == "supercell"
    assert _tier_ncell(big, "supercell") == 16
    # prime mesh: no divisor grid with S <= 15 -> columns
    odd = SimulationConfig(n_side=48, box=500.0, solver="p3m", pm_grid=127)
    assert _resolved_shortrange(odd) == "columns"
    small = SimulationConfig(n_side=8, box=500.0, solver="p3m", pm_grid=128)
    assert _resolved_shortrange(small) == "allpairs"


def test_stride_guard_resolves_supercell_to_columns():
    """Clustered-healed capacities whose stride would OOM the fused
    kernel's scoped VMEM resolve to the columns tier instead (measured
    compile OOM at stride 82688 — round-4 clustered bench row), in both
    the driver mirror and the pure guard helpers."""
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import _resolved_shortrange
    from nbody.forces.p3m_columns import columns_stride_ok
    from nbody.forces.pm_supercell import supercell_stride_ok

    big = SimulationConfig(n_side=48, box=500.0, solver="p3m", pm_grid=128)
    assert _resolved_shortrange(big) == "supercell"
    healed = big.replace(column_capacity=65536)
    assert _resolved_shortrange(healed) == "columns"
    # the pure guards: fine at production capacities, trip past the
    # measured budget
    assert supercell_stride_ok(500.0, 18.0, 1280)
    assert not supercell_stride_ok(500.0, 18.0, 65536)
    assert columns_stride_ok(500.0, 18.0, 20480)
    assert not columns_stride_ok(500.0, 18.0, 65536)


def test_grow_skin_heal_bounded_by_geometry():
    """The plan-stale heal grows column_skin by 1.5x toward the frozen
    geometry's hard maxima (xy slack / supercell halo) and returns None
    at the ceiling — the driver then raises instead of looping."""
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import _frozen_geometry, _grow_skin

    cfg = SimulationConfig(
        n_side=48, box=500.0, solver="p3m", pm_grid=128,
        shortrange="supercell", rungs=3,
    )
    geom = _frozen_geometry(cfg)
    assert geom is not None and geom[0] == "supercell"
    skin0 = geom[6]
    grown = _grow_skin(cfg)
    if grown is not None:
        assert grown > skin0
        # a config already AT the ceiling cannot grow
        at_max = cfg.replace(column_skin=grown)
        while _grow_skin(at_max) is not None:
            at_max = at_max.replace(column_skin=_grow_skin(at_max))
        assert _grow_skin(at_max) is None


def test_columns_stride_budget_raises_loudly():
    """Past even the columns stride budget the force API fails with an
    actionable error instead of a Mosaic scoped-VMEM compile OOM."""
    import pytest

    from nbody.forces.p3m import p3m_acc

    pos = jnp.asarray(np.random.default_rng(0).uniform(0, 500.0, (512, 3)),
                      jnp.float32)
    mass = jnp.ones((512,), jnp.float32)
    with pytest.raises(ValueError, match="too clustered"):
        p3m_acc(pos, mass, 500.0, 128, shortrange="columns",
                capacity=131072)


def test_driver_runs_supercell_tier(tmp_path):
    """run_simulation(shortrange='supercell') integrates end to end with
    the driver's column-geometry capacity bookkeeping."""
    from nbody.driver.config import OutputConfig, SimulationConfig
    from nbody.driver.simulate import run_simulation

    cfg = SimulationConfig(
        n_side=8, box=200.0, solver="p3m", pm_grid=32,
        shortrange="supercell", n_steps=3,
        output=OutputConfig(
            dir=str(tmp_path), snapshot_times=(1.0,), powerspec_bins=8,
        ),
    )
    res = run_simulation(cfg, seed=0, workdir=str(tmp_path))
    assert np.isfinite(np.asarray(res.state.pos)).all()
    # growth: final displacement power above the IC's
    assert res.powerspecs


def test_p3m_acc_part_split_fused():
    """part='split' on the supercell tier returns (long, short, ov)
    from ONE fused evaluation; each half must match its standalone
    computation (part='long' PM / columns short on the same geometry)."""
    n, box, nmesh = 6000, 100.0, 32
    pos, mass = _uniform(n, box, seed=9)
    r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
    gl, gs, ov = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="supercell",
        split="spline", softening="spline", part="split",
        capacity=CK, window=W,
    )
    assert int(ov) == 0
    ref_l = np.asarray(
        p3m_acc(pos, mass, box, nmesh, eps=0.1, split="spline",
                part="long"),
        np.float64,
    )
    ref_s, ov2 = p3m_short_columns_pallas(
        pos, mass, box, 0.1, float(r_s), float(r_cut),
        ncell=ncell, col_capacity=CK, window=W, split="spline",
        softening="spline",
    )
    assert int(ov2) == 0
    scale = np.linalg.norm(ref_l + np.asarray(ref_s), axis=1).max()
    err_l = np.linalg.norm(np.asarray(gl) - ref_l, axis=1) / scale
    err_s = np.linalg.norm(
        np.asarray(gs) - np.asarray(ref_s, np.float64), axis=1
    ) / scale
    assert err_l.max() < 2e-5
    assert err_s.max() < 2e-5


class TestFusedBoundaryTick:
    """acc_both_fn (one fused short+long boundary evaluation) must leave
    the split-Hamiltonian integrators' trajectories unchanged."""

    @staticmethod
    def _system(n=1536, box=80.0, seed=12):
        from nbody.core import units as u
        from nbody.core.cosmology import Cosmology
        from nbody.core.types import ParticleState

        cosmo = Cosmology()
        rho_crit = 3.0 * cosmo.H0**2 / (8.0 * np.pi * u.COSMO.G)
        pmass = float(rho_crit * cosmo.Omega_m * box**3 / n)
        rng = np.random.default_rng(seed)
        state = ParticleState(
            pos=jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32),
            vel=jnp.asarray(rng.normal(0, 0.002 * box, (n, 3)),
                            jnp.float32),
            mass=jnp.full((n,), pmass, jnp.float32),
            time=jnp.asarray(0.5, jnp.float32),
        )
        return cosmo, state

    @staticmethod
    def _fns(box, nmesh, eps=0.1):
        from nbody.core import units as u

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

        def both_fn(pos, mass, a_s, a_l):
            gs, ov = short_fn(pos, mass, a_s)
            return gs, long_fn(pos, mass, a_l), ov

        return long_fn, short_fn, both_fn

    def test_subcycled(self):
        from nbody.core.cosmology import Cosmology  # noqa: F401
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_subcycled,
        )

        box, nmesh = 80.0, 48
        cosmo, state = self._system()
        a_grid = log_a_steps(0.5, 0.6, 3)
        long_fn, short_fn, both_fn = self._fns(box, nmesh)
        ref, ov0 = run_cosmological_subcycled(
            state, cosmo, a_grid, long_fn, short_fn, box, 2
        )
        got, ov1 = run_cosmological_subcycled(
            state, cosmo, a_grid, long_fn, short_fn, box, 2,
            acc_both_fn=both_fn,
        )
        assert int(ov0) == int(ov1) == 0
        np.testing.assert_allclose(
            np.asarray(got.pos), np.asarray(ref.pos), rtol=0,
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got.vel), np.asarray(ref.vel), rtol=1e-4,
            atol=1e-7,
        )

    def test_rungs(self):
        from nbody.core import units as u
        from nbody.forces.p3m import (
            p3m_short_cells_pallas_masked,
            p3m_short_params,
        )
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_rungs,
        )

        box, nmesh = 80.0, 48
        cosmo, state = self._system(seed=13)
        a_grid = log_a_steps(0.5, 0.6, 3)
        long_fn, short_fn, both_fn = self._fns(box, nmesh)

        def masked_fn(pos, mass, act, a):
            r_s, r_cut, ncell, cap = p3m_short_params(
                box, nmesh, pos.shape[0]
            )
            g, ov_s, ov_t, occ_t = p3m_short_cells_pallas_masked(
                pos, mass, act, box, 0.1, r_s, r_cut, G=u.COSMO.G,
                ncell=ncell, capacity=cap, target_capacity=cap,
                split="spline",
            )
            return g / a, ov_s, ov_t, occ_t

        args = (state, cosmo, a_grid, long_fn, short_fn, masked_fn,
                box, 2, box / nmesh)
        ref = run_cosmological_rungs(*args, eta_disp=0.05)
        got = run_cosmological_rungs(
            *args, eta_disp=0.05, acc_both_fn=both_fn
        )
        np.testing.assert_array_equal(
            np.asarray(ref[6]), np.asarray(got[6])
        )  # identical rung populations
        np.testing.assert_allclose(
            np.asarray(got[0].pos), np.asarray(ref[0].pos), rtol=0,
            atol=1e-4,
        )


@pytest.mark.parametrize("split", ["spline", "gaussian"])
def test_interlaced_supercell_matches_two_pass(split):
    """interlace=True on the fused tier (second MXU deposit + second
    in-kernel triangle contraction) == the classic interlaced
    composition: pm_acc(interlace=True) + columns short (the config the
    reference shipped, `NN.param:72-76` (True, True) — VERDICT round-3
    item 6)."""
    n, box, nmesh = 6000, 100.0, 32
    pos, mass = _uniform(n, box, seed=11)
    r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
    acc, ov = p3m_supercell_acc(
        pos, mass, box, nmesh, eps=0.1, r_s=float(r_s),
        r_cut=float(r_cut), split=split, softening="spline",
        ncell=ncell, col_capacity=CK, window=W, interlace=True,
    )
    assert int(ov) == 0
    a_long = pm_acc(
        pos, mass, box, nmesh, interlace=True,
        longrange_split=float(r_s) if split == "gaussian" else 0.0,
        spline_split=float(r_cut) if split == "spline" else 0.0,
    )
    a_short, ov2 = p3m_short_columns_pallas(
        pos, mass, box, 0.1, float(r_s), float(r_cut),
        ncell=ncell, col_capacity=CK, window=W, split=split,
        softening="spline",
    )
    assert int(ov2) == 0
    ref = np.asarray(a_long, np.float64) + np.asarray(a_short, np.float64)
    got = np.asarray(acc, np.float64)
    scale = np.linalg.norm(ref, axis=1).max()
    err = np.linalg.norm(got - ref, axis=1) / scale
    # two deposits + the k-space phase combine double the f32 rounding
    # surface vs the single-pass tier, hence the looser bound
    assert err.max() < 1e-4


def test_p3m_acc_interlaced_resolves_to_supercell():
    """Interlaced configs ride the supercell tier through the public
    p3m_acc (round-3 gate removed) and match the columns composition."""
    n, box, nmesh = 6000, 100.0, 32
    pos, mass = _uniform(n, box, seed=13)
    a_sc, ov = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="supercell",
        split="spline", interlace=True, with_overflow=True,
    )
    assert int(ov) == 0
    a_cols = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="columns",
        split="spline", interlace=True,
    )
    ref = np.asarray(a_cols, np.float64)
    scale = np.linalg.norm(ref, axis=1).max()
    err = np.linalg.norm(np.asarray(a_sc, np.float64) - ref, axis=1) / scale
    assert err.max() < 1e-4


class TestFrozenSupercell:
    """p3m_supercell_frozen: the fused split evaluation on a frozen
    column plan must match a FRESH fused evaluation at the drifted
    positions (the haloed node geometry keeps the deposit/readback
    exact CIC for drift within one PM cell of the frozen column)."""

    @staticmethod
    def _setup(n=6000, box=100.0, nmesh=32, seed=21, skin=2.0):
        from nbody.forces.p3m_columns import freeze_column_plan

        pos, mass = _uniform(n, box, seed=seed)
        r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
        assert skin / 2.0 < box / nmesh  # deposit halo constraint
        plan = freeze_column_plan(
            pos, mass, box, float(r_cut), ncell, CK, W, skin=skin
        )
        assert int(plan.ov) == 0
        # drift everyone by up to skin/2 (some cross column edges and
        # the periodic wrap — the halo/ghost machinery must cover both)
        rng = np.random.default_rng(seed + 1)
        drift = rng.uniform(-skin / 2, skin / 2, (n, 3)) / np.sqrt(3.0)
        pos2 = jnp.asarray((np.asarray(pos) + drift) % box, jnp.float32)
        return pos, pos2, mass, plan, (r_s, r_cut, ncell, CK, W), skin

    def test_matches_fresh_after_drift(self):
        from nbody.forces.p3m_columns import plan_drift_ok
        from nbody.forces.pm_supercell import p3m_supercell_frozen

        box, nmesh = 100.0, 32
        pos, pos2, mass, plan, (r_s, r_cut, ncell, CK, W), skin = (
            self._setup()
        )
        assert bool(plan_drift_ok(pos2, plan, box, skin))
        gl, gs, ov = p3m_supercell_frozen(
            pos2, mass, plan, box, nmesh, eps=0.1, r_s=float(r_s),
            r_cut=float(r_cut), split="spline", softening="spline",
            ncell=ncell, col_capacity=CK, window=W, part_split=True,
        )
        assert int(ov) == 0
        gl_ref, gs_ref, ov2 = p3m_supercell_acc(
            pos2, mass, box, nmesh, eps=0.1, r_s=float(r_s),
            r_cut=float(r_cut), split="spline", softening="spline",
            ncell=ncell, col_capacity=CK, window=W, part_split=True,
        )
        assert int(ov2) == 0
        ref = np.asarray(gl_ref, np.float64) + np.asarray(gs_ref, np.float64)
        scale = np.linalg.norm(ref, axis=1).max()
        err_l = np.linalg.norm(
            np.asarray(gl) - np.asarray(gl_ref, np.float64), axis=1
        ) / scale
        err_s = np.linalg.norm(
            np.asarray(gs) - np.asarray(gs_ref, np.float64), axis=1
        ) / scale
        assert err_l.max() < 2e-5
        assert err_s.max() < 2e-5

    def test_total_force_plain(self):
        from nbody.forces.pm_supercell import p3m_supercell_frozen

        box, nmesh = 100.0, 32
        _, pos2, mass, plan, (r_s, r_cut, ncell, CK, W), _ = self._setup(
            seed=33
        )
        acc, ov = p3m_supercell_frozen(
            pos2, mass, plan, box, nmesh, eps=0.1, r_s=float(r_s),
            r_cut=float(r_cut), split="spline", softening="spline",
            ncell=ncell, col_capacity=CK, window=W,
        )
        assert int(ov) == 0
        ref, ov2 = p3m_supercell_acc(
            pos2, mass, box, nmesh, eps=0.1, r_s=float(r_s),
            r_cut=float(r_cut), split="spline", softening="spline",
            ncell=ncell, col_capacity=CK, window=W,
        )
        assert int(ov2) == 0
        refd = np.asarray(ref, np.float64)
        scale = np.linalg.norm(refd, axis=1).max()
        err = np.linalg.norm(np.asarray(acc) - refd, axis=1) / scale
        assert err.max() < 2e-5


class TestFrozenBoundaryTick:
    """The frozen-plan fused boundary tick (build_cosmo_force_frozen_both)
    must leave the split integrators' trajectories unchanged (up to the
    frozen plane's f32 assembly ordering)."""

    @staticmethod
    def _setup(rungs=0, subcycles=1):
        from nbody.core import units as u
        from nbody.core.types import ParticleState
        from nbody.driver.config import SimulationConfig
        from nbody.driver.simulate import (
            _resolved_shortrange,
            build_cosmo_force_both,
            build_cosmo_force_frozen,
            build_cosmo_force_frozen_both,
            build_cosmo_force_rungs,
            build_cosmo_force_split,
        )

        cfg = SimulationConfig(
            n_side=18, box=200.0, solver="p3m", pm_grid=32,
            shortrange="supercell", softening_kernel="spline",
            rungs=rungs, subcycles=subcycles,
        )
        assert _resolved_shortrange(cfg) == "supercell"
        cosmo = cfg.cosmology()
        n = cfg.n_particles
        rho_crit = 3.0 * cosmo.H0**2 / (8.0 * np.pi * u.COSMO.G)
        pmass = float(rho_crit * cosmo.Omega_m * cfg.box**3 / n)
        rng = np.random.default_rng(17)
        state = ParticleState(
            pos=jnp.asarray(rng.uniform(0, cfg.box, (n, 3)), jnp.float32),
            vel=jnp.asarray(rng.normal(0, 0.002 * cfg.box, (n, 3)),
                            jnp.float32),
            mass=jnp.full((n,), pmass, jnp.float32),
            time=jnp.asarray(0.5, jnp.float32),
        )
        fns = {
            "split": build_cosmo_force_split(cfg),
            "both": build_cosmo_force_both(cfg),
            "frozen": build_cosmo_force_frozen(cfg),
            "frozen_both": build_cosmo_force_frozen_both(cfg),
            "rungs": build_cosmo_force_rungs(cfg) if rungs else None,
        }
        assert fns["frozen_both"] is not None
        return cfg, cosmo, state, fns

    def test_subcycled(self):
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_subcycled,
        )

        cfg, cosmo, state, fns = self._setup(subcycles=2)
        a_grid = log_a_steps(0.5, 0.6, 3)
        long_fn, short_fn = fns["split"]
        ref, ov0 = run_cosmological_subcycled(
            state, cosmo, a_grid, long_fn, short_fn, cfg.box, 2,
            acc_both_fn=fns["both"],
        )
        got, ov1 = run_cosmological_subcycled(
            state, cosmo, a_grid, long_fn, short_fn, cfg.box, 2,
            acc_both_fn=fns["both"], frozen_fns=fns["frozen"],
            frozen_both_fn=fns["frozen_both"][1],
        )
        assert int(ov0) == int(ov1) == 0
        np.testing.assert_allclose(
            np.asarray(got.pos), np.asarray(ref.pos), rtol=0, atol=2e-4
        )

    def test_rungs_compact_kick_bit_exact(self):
        """active_capacity > 0 (the compact slot-table readback +
        scatter-add kicks) matches the full-N gather path to f32
        rounding (the full path's p + g*Fk fuses to an FMA; the
        compact mul-then-scatter-add rounds separately), and
        truncation (n_act > capacity) is loud on the ov_t channel."""
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_rungs,
        )

        cfg, cosmo, state, fns = self._setup(rungs=2)
        a_grid = log_a_steps(0.5, 0.6, 2)
        args = (state, cosmo, a_grid, fns["rungs"][0], fns["rungs"][1],
                fns["rungs"][2], cfg.box, 2, cfg.box / cfg.mesh_size)
        kw = dict(eta_disp=0.05, acc_both_fn=fns["both"],
                  frozen_both_fns=fns["frozen_both"])
        full = run_cosmological_rungs(*args, **kw)
        n = state.pos.shape[0]
        cap = -(-n // 128) * 128  # >= every particle: no truncation
        compact = run_cosmological_rungs(*args, **kw, active_capacity=cap)
        assert int(compact[3]) == 0
        np.testing.assert_allclose(
            np.asarray(compact[0].pos), np.asarray(full[0].pos),
            rtol=0, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(compact[0].vel), np.asarray(full[0].vel),
            rtol=1e-5,
            atol=1e-6 * float(jnp.abs(full[0].vel).max()),
        )
        trunc = run_cosmological_rungs(*args, **kw, active_capacity=128)
        assert int(trunc[3]) > 0  # loud active-row truncation

    def test_rungs(self):
        from nbody.integrate.cosmo_stepping import (
            log_a_steps,
            run_cosmological_rungs,
        )

        cfg, cosmo, state, fns = self._setup(rungs=2)
        a_grid = log_a_steps(0.5, 0.6, 3)
        args = (state, cosmo, a_grid, fns["rungs"][0], fns["rungs"][1],
                fns["rungs"][2], cfg.box, 2, cfg.box / cfg.mesh_size)
        ref = run_cosmological_rungs(
            *args, eta_disp=0.05, acc_both_fn=fns["both"]
        )
        got = run_cosmological_rungs(
            *args, eta_disp=0.05, acc_both_fn=fns["both"],
            frozen_both_fns=fns["frozen_both"],
        )
        np.testing.assert_array_equal(
            np.asarray(ref[6]), np.asarray(got[6])
        )  # identical rung populations
        assert int(got[1]) == 0
        np.testing.assert_allclose(
            np.asarray(got[0].pos), np.asarray(ref[0].pos), rtol=0,
            atol=2e-4,
        )


def test_supercell_overflow_reports():
    """Undersized capacity must surface on the bucket field."""
    n, box, nmesh = 4000, 100.0, 32
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, box, (4, 3))
    pos = jnp.asarray(
        (centers[rng.integers(0, 4, n)] + rng.normal(0, 2.0, (n, 3))) % box,
        jnp.float32,
    )
    mass = jnp.ones((n,), jnp.float32)
    r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
    _, ov = p3m_supercell_acc(
        pos, mass, box, nmesh, eps=0.1, r_s=float(r_s),
        r_cut=float(r_cut), split="spline", softening="spline",
        ncell=ncell, col_capacity=128, window=256,
    )
    assert int(ov) >= 65536
