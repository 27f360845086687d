"""Cell-list tests: build correctness, short-range force vs dense oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody.forces.p3m import (
    p3m_acc,
    p3m_short_cells,
    p3m_short_direct,
    p3m_short_params,
)
from nbody.mesh.cells import build_cell_list, cell_capacity


class TestBuild:
    def test_every_particle_binned_once(self):
        rng = np.random.default_rng(0)
        n, box, ncell = 500, 50.0, 4
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
        cl = build_cell_list(pos, box, ncell, capacity=64)
        assert int(cl.overflow) == 0
        idx = np.asarray(cl.indices).ravel()
        real = np.sort(idx[idx < n])
        np.testing.assert_array_equal(real, np.arange(n))
        assert int(cl.counts.sum()) == n

    def test_bucket_membership(self):
        """Each bucketed particle really lies in its cell."""
        rng = np.random.default_rng(1)
        n, box, ncell = 300, 30.0, 3
        pos = np.asarray(rng.uniform(0, box, (n, 3)))
        cl = build_cell_list(jnp.asarray(pos), box, ncell, capacity=64)
        idx = np.asarray(cl.indices)
        for cid in range(ncell**3):
            members = idx[cid][idx[cid] < n]
            if members.size == 0:
                continue
            c = np.floor(pos[members] / box * ncell).astype(int)
            lin = (c[:, 0] * ncell + c[:, 1]) * ncell + c[:, 2]
            np.testing.assert_array_equal(lin, cid)

    def test_overflow_counted(self):
        pos = jnp.zeros((20, 3))  # all in one cell
        cl = build_cell_list(pos, 10.0, 3, capacity=8)
        assert int(cl.overflow) == 12
        assert int(cl.counts.max()) == 20

    def test_unwrapped_positions(self):
        pos = jnp.asarray([[11.0, -1.0, 25.0]])
        cl = build_cell_list(pos, 10.0, 5, capacity=8)
        assert int(cl.overflow) == 0
        assert int(cl.counts.sum()) == 1

    def test_capacity_heuristic(self):
        cap = cell_capacity(1_000_000, 22)
        assert cap % 8 == 0
        # mean + 5 sigma: tight enough to stay under the next 128-lane
        # boundary when possible, safe for near-uniform occupancies
        mean = 1_000_000 / 22**3
        assert mean + 4.0 * mean**0.5 <= cap <= 2 * mean


class TestShortRangeCells:
    def setup_method(self):
        self.rng = np.random.default_rng(2)
        self.box = 100.0
        self.n = 2000
        self.mass = jnp.asarray(self.rng.uniform(0.5, 1.5, (self.n,)))
        self.r_s, self.r_cut, self.ncell, self.cap = p3m_short_params(
            self.box, 32, self.n
        )

    def _check(self, pos, capacity=None):
        acc, ov = p3m_short_cells(
            pos, self.mass, self.box, 0.1, self.r_s, self.r_cut,
            ncell=self.ncell, capacity=capacity or self.cap,
        )
        assert int(ov) == 0
        ref = p3m_short_direct(pos, self.mass, self.box, 0.1, self.r_s, self.r_cut)
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(ref), rtol=1e-10, atol=1e-12
        )

    def test_uniform_matches_oracle(self):
        self._check(jnp.asarray(self.rng.uniform(0, self.box, (self.n, 3))))

    def test_clustered_matches_oracle(self):
        blob = self.rng.normal(50.0, 10.0, (self.n // 2, 3))
        rest = self.rng.uniform(0, self.box, (self.n - self.n // 2, 3))
        pos = jnp.asarray(np.concatenate([blob, rest]) % self.box)
        self._check(pos, capacity=512)

    def test_periodic_wrap_pairs(self):
        """Particles straddling the box boundary interact correctly."""
        pos = jnp.asarray([[0.5, 50.0, 50.0], [self.box - 0.5, 50.0, 50.0]])
        mass = jnp.ones((2,))
        acc, ov = p3m_short_cells(
            pos, mass, self.box, 0.1, self.r_s, self.r_cut,
            ncell=self.ncell, capacity=8,
        )
        ref = p3m_short_direct(pos, mass, self.box, 0.1, self.r_s, self.r_cut)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(ref), rtol=1e-10)
        # and they attract along x
        assert float(acc[0, 0]) < 0 and float(acc[1, 0]) > 0

    def test_overflow_reported(self):
        pos = jnp.asarray(
            np.concatenate(
                [np.full((600, 3), 50.0) + self.rng.normal(0, 0.1, (600, 3)),
                 self.rng.uniform(0, self.box, (self.n - 600, 3))]
            )
        )
        _, ov = p3m_short_cells(
            pos, self.mass, self.box, 0.1, self.r_s, self.r_cut,
            ncell=self.ncell, capacity=self.cap,
        )
        assert int(ov) > 0

    def test_cell_size_guard(self):
        with pytest.raises(ValueError):
            p3m_short_cells(
                jnp.zeros((8, 3)), jnp.ones((8,)), self.box, 0.1,
                self.r_s, self.r_cut, ncell=50, capacity=8,
            )


class TestP3MShortrangeSelection:
    def test_cells_vs_allpairs_same_force(self):
        rng = np.random.default_rng(3)
        n, box, nmesh = 1500, 80.0, 32
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
        mass = jnp.ones((n,))
        a1 = p3m_acc(pos, mass, box, nmesh, eps=0.1, shortrange="allpairs")
        a2 = p3m_acc(pos, mass, box, nmesh, eps=0.1, shortrange="cells")
        # cells tier runs the f32 Pallas kernel -> f32-level agreement
        scale = float(np.linalg.norm(np.asarray(a1), axis=-1).mean())
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a2), rtol=2e-3, atol=1e-4 * scale
        )


class TestShortRangeCellsPallas:
    """Ghost-padded Pallas cell-pair kernel vs the dense oracle."""

    def setup_method(self):
        self.rng = np.random.default_rng(7)
        self.box = 100.0
        self.n = 1200
        self.mass = jnp.asarray(
            self.rng.uniform(0.5, 1.5, (self.n,)), jnp.float32
        )
        self.r_s, self.r_cut, self.ncell, self.cap = p3m_short_params(
            self.box, 32, self.n
        )

    def _check(self, pos, rtol=3e-4, capacity=None):
        from nbody.forces.p3m import p3m_short_cells_pallas

        acc, ov = p3m_short_cells_pallas(
            pos, self.mass, self.box, 0.1, self.r_s, self.r_cut,
            ncell=self.ncell, capacity=capacity or self.cap,
        )
        assert int(ov) == 0
        ref = p3m_short_direct(
            pos.astype(jnp.float32), self.mass, self.box, 0.1,
            self.r_s, self.r_cut,
        )
        a, r = np.asarray(acc), np.asarray(ref)
        rel = np.linalg.norm(a - r, axis=-1) / np.maximum(
            np.linalg.norm(r, axis=-1), 1e-8
        )
        assert rel.max() < rtol, rel.max()

    def test_uniform(self):
        self._check(
            jnp.asarray(self.rng.uniform(0, self.box, (self.n, 3)), jnp.float32)
        )

    def test_boundary_wrap(self):
        """Ghost layer carries the +/-box shift: cross-boundary pairs."""
        pos = np.asarray(self.rng.uniform(0, self.box, (self.n, 3)))
        pos[:100] = self.rng.uniform(0, 0.5, (100, 3))          # corner
        pos[100:200] = self.rng.uniform(self.box - 0.5, self.box, (100, 3))
        self._check(jnp.asarray(pos, jnp.float32), capacity=160)

    def test_matches_jnp_tier(self):
        from nbody.forces.p3m import p3m_short_cells, p3m_short_cells_pallas

        pos = jnp.asarray(
            self.rng.uniform(0, self.box, (self.n, 3)), jnp.float32
        )
        a1, _ = p3m_short_cells_pallas(
            pos, self.mass, self.box, 0.1, self.r_s, self.r_cut,
            ncell=self.ncell, capacity=self.cap,
        )
        a2, _ = p3m_short_cells(
            pos, self.mass, self.box, 0.1, self.r_s, self.r_cut,
            ncell=self.ncell, capacity=self.cap,
        )
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a2), rtol=2e-3, atol=1e-6
        )


class TestSplineSplit:
    """Polynomial spline force split: short weight + matching k filter."""

    def test_weight_boundary_conditions(self):
        from nbody.forces.p3m import _spline_short_weight

        rc = 10.0
        # exactly zero at r_cut, pure Newton at small r (eps2=0; r_s is
        # unused by the spline split)
        w_rc = float(_spline_short_weight(jnp.asarray(rc**2), 0.0, 0.0, rc))
        assert abs(w_rc) < 1e-10
        r = 0.01 * rc
        w0 = float(_spline_short_weight(jnp.asarray(r**2), 0.0, 0.0, rc))
        assert w0 == pytest.approx(1.0 / r**3, rel=1e-3)
        # beyond cutoff: identically zero
        assert (
            float(_spline_short_weight(jnp.asarray((1.5 * rc) ** 2), 0.0, 0.0, rc))
            == 0.0
        )

    def test_matches_gaussian_split_total(self):
        """Both splits approximate the same periodic force."""
        rng = np.random.default_rng(13)
        n, box, nmesh = 800, 100.0, 32
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
        mass = jnp.ones((n,), jnp.float32)
        a_g = p3m_acc(pos, mass, box, nmesh, eps=0.05,
                      shortrange="allpairs", split="gaussian")
        a_s = p3m_acc(pos, mass, box, nmesh, eps=0.05,
                      shortrange="allpairs", split="spline")
        rel = np.linalg.norm(np.asarray(a_s - a_g), axis=-1) / np.linalg.norm(
            np.asarray(a_g), axis=-1
        )
        assert np.median(rel) < 0.03

    def test_isolated_force_law(self):
        """Two bodies far from the walls: total ~ Newton at all r."""
        box, nmesh = 1000.0, 64
        rc = 4.5 * 1.25 * box / nmesh
        m2 = jnp.ones((2,), jnp.float32)
        for r in (0.3 * rc, 0.9 * rc, 1.5 * rc):
            p2 = jnp.asarray(
                [[500.0, 500.0, 500.0], [500.0 + r, 500.0, 500.0]], jnp.float32
            )
            a2 = p3m_acc(p2, m2, box, nmesh, eps=1e-3,
                         shortrange="allpairs", split="spline")
            f, exact = float(a2[0, 0]), 1.0 / r**2
            assert abs(f - exact) / exact < 0.03, (r / rc, f, exact)

    def test_spline_cells_pallas_vs_direct(self):
        from nbody.forces.p3m import (
            p3m_short_cells_pallas,
            p3m_short_direct,
            p3m_short_params,
        )

        rng = np.random.default_rng(17)
        n, box = 1000, 100.0
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
        mass = jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32)
        r_s, r_cut, ncell, cap = p3m_short_params(box, 32, n)
        acc, ov = p3m_short_cells_pallas(
            pos, mass, box, 0.1, r_s, r_cut,
            ncell=ncell, capacity=cap, split="spline",
        )
        assert int(ov) == 0
        ref = p3m_short_direct(pos, mass, box, 0.1, r_s, r_cut, split="spline")
        rel = np.linalg.norm(np.asarray(acc) - np.asarray(ref), axis=-1) / (
            np.maximum(np.linalg.norm(np.asarray(ref), axis=-1), 1e-8)
        )
        assert rel.max() < 3e-4
