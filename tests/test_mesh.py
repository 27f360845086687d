"""CIC + power-spectrum estimator tests (components C6-C9).

Mirrors the reference's implicit checks: CIC weight sums (reference
`CiC/3D startbetingelser1.py:375-387`), window deconvolution behavior, and
the realization -> measurement round trip against the input P(k)
(the §4.1 oracle comparison)."""

import jax
import jax.numpy as jnp
import numpy as np

from nbody.ic.gaussian import GRFSpec, gaussian_field
from nbody.mesh.cic import (
    cic_deposit,
    cic_gather,
    cic_window,
    density_to_delta,
    cic_deposit_interlaced_k,
)
from nbody.mesh.spectrum import power_spectrum


def test_cic_mass_conservation():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 100.0, (1000, 3)))
    grid = cic_deposit(pos, 100.0, 16)
    np.testing.assert_allclose(float(grid.sum()), 1000.0, rtol=1e-12)
    assert (np.asarray(grid) >= 0).all()


def test_cic_single_particle_center():
    # particle exactly on a node -> all mass in that cell
    pos = jnp.array([[25.0, 50.0, 75.0]])
    grid = np.asarray(cic_deposit(pos, 100.0, 4))
    assert grid[1, 2, 3] == 1.0
    assert grid.sum() == 1.0
    # particle at a cell center -> mass split 1/8 over 8 cells
    pos = jnp.array([[12.5 + 25.0, 12.5, 12.5]])
    grid = np.asarray(cic_deposit(pos, 100.0, 4))
    np.testing.assert_allclose(grid[grid > 0], 0.125)


def test_cic_periodic_wrap():
    pos = jnp.array([[99.9, 0.05, 0.0]])
    grid = np.asarray(cic_deposit(pos, 100.0, 4))
    np.testing.assert_allclose(grid.sum(), 1.0, rtol=1e-12)
    # weight must wrap to x=0 plane, not clip
    assert grid[0].sum() > 0


def test_gather_of_constant_field():
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(0, 10.0, (100, 3)))
    grid = jnp.full((8, 8, 8), 3.5)
    vals = cic_gather(grid, pos, 10.0)
    np.testing.assert_allclose(np.asarray(vals), 3.5, rtol=1e-12)


def test_uniform_lattice_gives_uniform_grid():
    from nbody.mesh.grids import lattice

    pos = lattice(8, 50.0, dtype=jnp.float64)
    grid = np.asarray(cic_deposit(pos, 50.0, 8))
    np.testing.assert_allclose(grid, 1.0, atol=1e-10)
    delta = np.asarray(density_to_delta(jnp.asarray(grid), 512))
    np.testing.assert_allclose(delta, 0.0, atol=1e-10)


def test_window_limits():
    W = np.asarray(cic_window(16, 100.0, p=2))
    assert abs(W[0, 0, 0] - 1.0) < 1e-12       # k=0: no suppression
    # corner mode (all axes at Nyquist): (2/pi)^6 ~ 0.0665
    np.testing.assert_allclose(W.min(), (2 / np.pi) ** 6, rtol=1e-5)
    assert (W <= 1.0 + 1e-12).all()


def test_grf_power_roundtrip():
    """Realize a power-law P(k), measure it back — amplitude and slope must
    match in the 'grid' convention (the reference's CLASS-vs-measured
    check, `CiC/3D startbetingelser1.py:321-348`)."""
    nmesh, box = 64, 200.0

    def power(k):
        return 500.0 * (k / 0.1) ** -1.5

    keys = jax.random.split(jax.random.key(0), 6)
    spec = GRFSpec(nmesh=nmesh, box=box)
    ps = []
    for key in keys:
        delta = gaussian_field(key, spec, power)
        res = power_spectrum(delta, box, n_bins=24)
        ps.append(np.asarray(res.power))
    pmean = np.mean(ps, axis=0)
    res0 = power_spectrum(gaussian_field(keys[0], spec, power), box, n_bins=24)
    k = np.asarray(res0.k)
    nm = np.asarray(res0.n_modes)
    good = (nm > 20) & (k < 0.7 * np.pi * nmesh / box)  # below ~0.7 k_Ny
    ratio = pmean[good] / np.asarray(power(jnp.asarray(k[good])))
    np.testing.assert_allclose(ratio, 1.0, atol=0.25)


def test_fac_convention_ratio():
    """'fac' convention = 'grid' / 2pi (reference Power_compare.py:176-184)."""
    delta = gaussian_field(
        jax.random.key(1), GRFSpec(16, 100.0), lambda k: 100.0 * k**-1
    )
    grid_res = power_spectrum(delta, 100.0, n_bins=8, convention="grid")
    fac_res = power_spectrum(delta, 100.0, n_bins=8, convention="fac")
    good = np.asarray(grid_res.n_modes) > 0
    np.testing.assert_allclose(
        np.asarray(fac_res.power)[good] * 2 * np.pi,
        np.asarray(grid_res.power)[good],
        rtol=1e-6,
    )


def test_deconvolve_raises_power():
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, 100.0, (4096, 3)))
    grid = cic_deposit(pos, 100.0, 32)
    delta = density_to_delta(grid, 4096)
    raw = power_spectrum(delta, 100.0, n_bins=16, deconvolve_p=0)
    dec = power_spectrum(delta, 100.0, n_bins=16, deconvolve_p=1)
    good = np.asarray(raw.n_modes) > 0
    assert (np.asarray(dec.power)[good] >= np.asarray(raw.power)[good] - 1e-12).all()
    # at the highest k the correction must be substantial (>20%)
    hi = np.flatnonzero(good)[-1]
    assert dec.power[hi] / raw.power[hi] > 1.2


def test_interlaced_matches_plain_at_low_k():
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 100.0, (2048, 3)))
    dk = cic_deposit_interlaced_k(pos, 100.0, 16)
    plain = jnp.fft.rfftn(cic_deposit(pos, 100.0, 16))
    # DC mode (total mass) identical
    np.testing.assert_allclose(
        complex(dk[0, 0, 0]), complex(plain[0, 0, 0]), rtol=1e-10
    )


class TestBlockedCIC:
    """MXU-contraction deposit/gather tier (nbody.mesh.blocked): exactly
    CIC, kept as an alternative backend (measured on-chip at parity with
    the scatter path at N=2^20 — bucketing dominates both)."""

    def test_blocked_deposit_matches_cic(self):
        from nbody.mesh.blocked import blocked_cic_deposit
        from nbody.mesh.cic import cic_deposit

        rng = np.random.default_rng(7)
        pos = jnp.asarray(rng.uniform(0, 80.0, (4000, 3)))
        w = jnp.asarray(rng.uniform(0.5, 2.0, (4000,)))
        ref = cic_deposit(pos, 80.0, 32, weights=w)
        g, ov = blocked_cic_deposit(pos, 80.0, 32, weights=w, chunks=4)
        assert int(ov) == 0
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    def test_blocked_gather_matches_cic(self):
        from nbody.mesh.blocked import blocked_cic_gather_vec
        from nbody.mesh.cic import cic_gather_vec

        rng = np.random.default_rng(8)
        pos = jnp.asarray(rng.uniform(0, 80.0, (4000, 3)))
        grids = jnp.asarray(rng.normal(size=(3, 32, 32, 32)))
        ref = cic_gather_vec(grids, pos, 80.0)
        v, ov = blocked_cic_gather_vec(grids, pos, 80.0, chunks=4)
        assert int(ov) == 0
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)

    def test_overflow_reported(self):
        from nbody.mesh.blocked import blocked_cic_deposit

        pos = jnp.full((300, 3), 1.0)  # all in one block
        _, ov = blocked_cic_deposit(pos, 80.0, 32, capacity=64, chunks=4)
        assert int(ov) == 300 - 64
