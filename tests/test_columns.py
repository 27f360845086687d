"""Column-packed short-range tier (nbody/forces/p3m_columns.py).

Oracle is the dense jnp short-range sum; the tier must either match it
or REPORT overflow (bucket, z-window, or z-ghost demand) — never
silently drop force."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody.forces.p3m import p3m_acc, p3m_short_direct
from nbody.forces.p3m_columns import (
    column_params,
    column_window,
    p3m_short_columns_pallas,
)


def _uniform(n, box, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    return pos, mass


def _clustered(n, box, seed=0, nblob=6, sigma=3.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, box, (nblob, 3))
    pos = (centers[rng.integers(0, nblob, n)]
           + rng.normal(0, sigma, (n, 3))) % box
    return (jnp.asarray(pos, jnp.float32),
            jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32))


@pytest.mark.parametrize("split", ["spline", "gaussian"])
def test_uniform_matches_oracle(split):
    n, box, nmesh = 4000, 100.0, 32
    r_s, r_cut, ncell, CK, W = column_params(box, nmesh, n)
    pos, mass = _uniform(n, box)
    ref = p3m_short_direct(pos, mass, box, 0.1, r_s, r_cut, split=split,
                           softening="spline")
    acc, ov = p3m_short_columns_pallas(
        pos, mass, box, 0.1, r_s, r_cut,
        ncell=ncell, col_capacity=CK, window=W, split=split,
        softening="spline",
    )
    assert int(ov) == 0
    rel = np.linalg.norm(
        np.asarray(acc, np.float64) - np.asarray(ref), axis=1
    ) / np.maximum(np.linalg.norm(np.asarray(ref), axis=1), 1e-10)
    assert rel.max() < 1e-4 and np.median(rel) < 1e-5


def test_clustered_selfheal_matches_oracle():
    """Clustered z-boundary blobs: the default capacity must REPORT
    overflow; doubling until clean must then match the oracle (the
    driver's self-heal loop)."""
    n, box, nmesh = 3000, 100.0, 24
    r_s, r_cut, ncell, CK, _ = column_params(box, nmesh, n)
    pos, mass = _clustered(n, box)
    ref = p3m_short_direct(pos, mass, box, 0.1, r_s, r_cut, split="spline",
                           softening="spline")
    ck = CK
    for _ in range(6):
        acc, ov = p3m_short_columns_pallas(
            pos, mass, box, 0.1, r_s, r_cut,
            ncell=ncell, col_capacity=ck,
            window=column_window(box, r_cut, ck),
            split="spline", softening="spline",
        )
        if int(ov) == 0:
            break
        ck *= 2
    assert int(ov) == 0
    rel = np.linalg.norm(
        np.asarray(acc, np.float64) - np.asarray(ref), axis=1
    ) / np.maximum(np.linalg.norm(np.asarray(ref), axis=1), 1e-10)
    assert rel.max() < 1e-4


def test_undersized_capacity_reports_overflow():
    n, box, nmesh = 3000, 100.0, 24
    r_s, r_cut, ncell, CK, W = column_params(box, nmesh, n)
    pos, mass = _clustered(n, box)
    _, ov = p3m_short_columns_pallas(
        pos, mass, box, 0.1, r_s, r_cut,
        ncell=ncell, col_capacity=max(128, CK // 2), window=256,
        split="spline", softening="spline",
    )
    assert int(ov) > 0


def test_p3m_acc_columns_tier_matches_cells():
    """shortrange='columns' through the public p3m_acc == the cells
    tier (same split physics, different packing)."""
    n, box, nmesh = 4000, 100.0, 32
    pos, mass = _uniform(n, box, seed=5)
    a_cells, ov1 = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="cells",
        split="spline", with_overflow=True,
    )
    a_cols, ov2 = p3m_acc(
        pos, mass, box, nmesh, eps=0.1, shortrange="columns",
        split="spline", with_overflow=True,
    )
    assert int(ov1) == 0 and int(ov2) == 0
    rel = np.linalg.norm(
        np.asarray(a_cols, np.float64) - np.asarray(a_cells, np.float64),
        axis=1,
    ) / np.maximum(np.linalg.norm(np.asarray(a_cells), axis=1), 1e-12)
    assert rel.max() < 1e-4


def test_overflow_field_encoding_staged_heal():
    """overflow is field-encoded (bucket/ghost spills * 65536 + z-window
    misses) so the driver can widen the right knob: an undersized WINDOW
    with ample capacity reports a window-only code (high field 0), and
    widening ONLY the window heals it to an oracle match — the staged
    self-heal `run_simulation` performs."""
    n, box, nmesh = 4000, 100.0, 32
    r_s, r_cut, ncell, CK, W = column_params(box, nmesh, n)
    pos, mass = _uniform(n, box, seed=9)

    _, ov = p3m_short_columns_pallas(
        pos, mass, box, 0.1, r_s, r_cut,
        ncell=ncell, col_capacity=CK, window=128,  # starved z-window
        split="spline", softening="spline",
    )
    ov = int(ov)
    assert ov > 0
    assert (ov >> 16) == 0, "ample capacity must not report bucket spills"
    assert (ov & 0xFFFF) > 0

    # widen the window only (the driver's +50% ladder) until clean
    w = 128
    for _ in range(6):
        acc, ov = p3m_short_columns_pallas(
            pos, mass, box, 0.1, r_s, r_cut,
            ncell=ncell, col_capacity=CK, window=w,
            split="spline", softening="spline",
        )
        if int(ov) == 0:
            break
        w = -(-int(1.5 * w) // 128) * 128
    assert int(ov) == 0
    ref = p3m_short_direct(pos, mass, box, 0.1, r_s, r_cut, split="spline",
                           softening="spline")
    rel = np.linalg.norm(
        np.asarray(acc, np.float64) - np.asarray(ref), axis=1
    ) / np.maximum(np.linalg.norm(np.asarray(ref), axis=1), 1e-10)
    assert rel.max() < 1e-4


def test_col_z_order_large_column_counts():
    """Regression: the packed (col << 21) | zq sort key wraps int32 for
    col >= 1024 and silently scrambles the bucketing; large grids must
    take the two-pass stable sort.  Verify grouping + z order at
    ncol = 2048."""
    from nbody.forces.p3m_columns import _col_z_order

    rng = np.random.default_rng(0)
    n, ncol, box = 20000, 2048, 100.0
    col = jnp.asarray(rng.integers(0, ncol, n), jnp.int32)
    z = jnp.asarray(rng.uniform(0, box, n), jnp.float32)
    order = np.asarray(_col_z_order(col, z, ncol, box))
    cs = np.asarray(col)[order]
    zs = np.asarray(z)[order]
    assert (np.diff(cs) >= 0).all()  # columns grouped ascending
    same = np.diff(cs) == 0
    # z ascending within a column (up to the 2^21 quantisation)
    assert (np.diff(zs)[same] > -box / 2**20).all()


class TestFrozenPlan:
    """Frozen column plans (skin reuse): p3m_short_columns_frozen on a
    drifted state must match the fresh tier exactly while drift stays
    within skin/2 — including particles that cross the periodic wrap —
    and plan_drift_ok must flag budget violations."""

    def _setup(self, seed=0):
        from nbody.forces.p3m_columns import freeze_column_plan

        n, box, nmesh = 6000, 120.0, 32
        r_s, r_cut, ncell, CK, W = column_params(box, nmesh, n)
        pos, mass = _uniform(n, box, seed=seed)
        skin = 0.05 * float(r_cut)
        plan = freeze_column_plan(
            pos, mass, box, float(r_cut), ncell, CK, W, skin=skin
        )
        return pos, mass, box, r_s, r_cut, ncell, CK, W, skin, plan

    def test_matches_fresh_under_drift(self):
        from nbody.forces.p3m_columns import (
            p3m_short_columns_frozen, plan_drift_ok,
        )

        pos, mass, box, r_s, r_cut, ncell, CK, W, skin, plan = self._setup()
        kw = dict(ncell=ncell, col_capacity=CK, window=W,
                  split="spline", softening="spline")
        rng = np.random.default_rng(1)
        drift = jnp.asarray(
            rng.uniform(-0.57, 0.57, pos.shape) * (skin / 2), jnp.float32
        )
        pos2 = jnp.mod(pos + drift, box)  # wrap-crossers included
        assert bool(plan_drift_ok(pos2, plan, box, skin))
        a_frozen, ov = p3m_short_columns_frozen(
            pos2, mass, plan, box, 0.1, r_s, r_cut, **kw
        )
        assert int(ov) == 0
        a_fresh, _ = p3m_short_columns_pallas(
            pos2, mass, box, 0.1, r_s, r_cut, **kw
        )
        rel = np.linalg.norm(
            np.asarray(a_frozen, np.float64) - np.asarray(a_fresh),
            axis=1,
        ) / np.maximum(
            np.linalg.norm(np.asarray(a_fresh), axis=1), 1e-10
        )
        assert rel.max() < 1e-4

    def test_drift_budget_flagged(self):
        from nbody.forces.p3m_columns import plan_drift_ok

        pos, mass, box, *_, skin, plan = self._setup()
        far = jnp.mod(
            pos.at[0].add(jnp.asarray([1.1 * skin, 0, 0], jnp.float32)),
            box,
        )
        assert not bool(plan_drift_ok(far, plan, box, skin))

    def test_subcycled_integrator_matches(self):
        """run_cosmological_subcycled with frozen_fns (the production
        wiring through build_cosmo_force_frozen) tracks the fresh-eval
        integrator to f32 across several global steps."""
        from nbody.core.cosmology import Cosmology
        from nbody.driver.config import SimulationConfig
        from nbody.driver.simulate import (
            build_cosmo_force_both,
            build_cosmo_force_frozen,
            build_cosmo_force_split,
            realize_ics,
        )
        from nbody.integrate.cosmo_stepping import (
            log_a_steps, run_cosmological_subcycled,
        )

        cfg = SimulationConfig(
            n_side=20, box=120.0, solver="p3m", pm_grid=32,
            softening_kernel="spline", subcycles=4, shortrange="columns",
        )
        state = realize_ics(cfg, 0)
        state = state.replace(
            pos=state.pos.astype(jnp.float32),
            vel=state.vel.astype(jnp.float32),
            mass=state.mass.astype(jnp.float32),
            time=state.time.astype(jnp.float32),
        )
        cosmo = Cosmology()
        long_fn, short_fn = build_cosmo_force_split(cfg)
        both_fn = build_cosmo_force_both(cfg)
        frozen = build_cosmo_force_frozen(cfg)
        assert frozen is not None
        a_grid = log_a_steps(0.1, 0.5, 6)
        f0, ov0 = run_cosmological_subcycled(
            state, cosmo, a_grid, long_fn, short_fn, cfg.box, 4,
            acc_both_fn=both_fn,
        )
        f1, ov1 = run_cosmological_subcycled(
            state, cosmo, a_grid, long_fn, short_fn, cfg.box, 4,
            acc_both_fn=both_fn, frozen_fns=frozen,
        )
        assert int(ov0) == 0 and int(ov1) == 0
        scale = float(jnp.abs(f0.vel).max())
        assert float(jnp.abs(f1.pos - f0.pos).max()) < 1e-3
        assert float(jnp.abs(f1.vel - f0.vel).max()) / scale < 1e-4


def test_wide_window_subsliced_matches_oracle(monkeypatch):
    """Windows wider than _WMAX lanes run as sub-sliced pair blocks
    (bounded scoped VMEM — clustered states can heal W to ~20k lanes,
    which OOMs as one (chunk, W) block; measured, round-4 clustered
    bench row).  Shrinking _WMAX makes an ordinary config take the
    sub-sliced path, including the non-multiple remainder slice; eps
    differs from the other tests so the jit cache cannot serve a
    pre-monkeypatch executable."""
    import nbody.forces.p3m_columns as pc

    n, box, nmesh = 4000, 100.0, 32
    r_s, r_cut, ncell, CK, W = column_params(box, nmesh, n)
    W = max(-(-W // 128) * 128, 3 * 128)
    if W % 256 == 0:
        W += 128  # force a remainder sub-slice
    monkeypatch.setattr(pc, "_WMAX", 256)
    pos, mass = _uniform(n, box, seed=3)
    ref = p3m_short_direct(pos, mass, box, 0.11, r_s, r_cut,
                           split="spline", softening="spline")
    acc, ov = p3m_short_columns_pallas(
        pos, mass, box, 0.11, r_s, r_cut,
        ncell=ncell, col_capacity=CK, window=W, split="spline",
        softening="spline",
    )
    assert int(ov) == 0
    rel = np.linalg.norm(
        np.asarray(acc, np.float64) - np.asarray(ref), axis=1
    ) / np.maximum(np.linalg.norm(np.asarray(ref), axis=1), 1e-10)
    assert rel.max() < 1e-4 and np.median(rel) < 1e-5
