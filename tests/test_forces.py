"""Force-kernel correctness: oracle cross-checks (SURVEY.md §4.2 —
"cross-implementation consistency: Pallas kernel vs jnp reference vs
float64 host reference")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody.forces.allpairs import (
    direct_acc,
    direct_acc_chunked,
    direct_potential,
)
from nbody.forces.pallas_pp import allpairs_pallas


def random_system(n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(0, 1, (n, 3)), dtype)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), dtype)
    return pos, mass


def test_two_body_analytic():
    # two unit masses at distance 2 on the x axis, no softening
    pos = jnp.array([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    mass = jnp.array([1.0, 1.0])
    acc = direct_acc(pos, mass, eps=0.0, G=1.0)
    # |a| = G m / r^2 = 1/4, pointing at the other body
    np.testing.assert_allclose(acc[0], [0.25, 0, 0], atol=1e-12)
    np.testing.assert_allclose(acc[1], [-0.25, 0, 0], atol=1e-12)


def test_newtons_third_law():
    pos, mass = random_system(128)
    acc = direct_acc(pos, mass, eps=0.01)
    total_force = jnp.sum(mass[:, None] * acc, axis=0)
    np.testing.assert_allclose(total_force, 0.0, atol=1e-10)


def test_potential_matches_hand_sum():
    pos, mass = random_system(16)
    eps = 0.1
    e = float(direct_potential(pos, mass, eps=eps, G=2.0))
    pos_np, mass_np = np.asarray(pos), np.asarray(mass)
    expected = 0.0
    for i in range(16):
        for j in range(i + 1, 16):
            r2 = np.sum((pos_np[i] - pos_np[j]) ** 2) + eps**2
            expected -= 2.0 * mass_np[i] * mass_np[j] / np.sqrt(r2)
    np.testing.assert_allclose(e, expected, rtol=1e-12)


def test_chunked_matches_dense():
    pos, mass = random_system(300)
    eps, G = 0.05, 1.7
    acc_dense = direct_acc(pos, mass, eps=eps, G=G)
    pot_dense = direct_potential(pos, mass, eps=eps, G=G)
    acc_c, pot_c = direct_acc_chunked(pos, mass, eps=eps, G=G, chunk=128)
    np.testing.assert_allclose(acc_c, acc_dense, rtol=1e-10)
    np.testing.assert_allclose(float(pot_c), float(pot_dense), rtol=1e-10)


@pytest.mark.parametrize("n", [64, 500, 1024])
def test_pallas_matches_oracle(n):
    pos, mass = random_system(n, seed=n)
    eps, G = 0.05, 1.3
    acc_ref = direct_acc(pos, mass, eps=eps, G=G)
    pot_ref = direct_potential(pos, mass, eps=eps, G=G)
    acc, phi = allpairs_pallas(pos, mass, eps=eps, G=G, ti=128, tj=256)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref), rtol=1e-9, atol=1e-9)
    e_pot = 0.5 * float(jnp.sum(mass * phi))
    np.testing.assert_allclose(e_pot, float(pot_ref), rtol=1e-9)


def test_pallas_f32():
    pos, mass = random_system(256, seed=3, dtype=jnp.float32)
    eps = 0.05
    acc_ref = direct_acc(pos.astype(jnp.float64), mass.astype(jnp.float64), eps=eps)
    acc, _ = allpairs_pallas(pos, mass, eps=eps, ti=128, tj=128)
    scale = float(jnp.max(jnp.abs(acc_ref)))
    np.testing.assert_allclose(
        np.asarray(acc) / scale, np.asarray(acc_ref) / scale, atol=3e-6
    )


def test_pallas_requires_softening():
    pos, mass = random_system(8)
    with pytest.raises(ValueError):
        allpairs_pallas(pos, mass, eps=0.0)


# ---------------------------------------------------------------------------
# MXU Gram-matrix kernel (nbody/forces/pallas_mxu.py)
# ---------------------------------------------------------------------------

from nbody.forces.pallas_mxu import allpairs_pallas_mxu, morton_codes


@pytest.mark.parametrize("n", [200, 700, 1500])
def test_mxu_matches_oracle(n):
    """Gram kernel vs dense jnp oracle (f64 backend: cancellation
    negligible, agreement should be near-exact; self-pair rows are
    zeroed inside the kernel)."""
    rng = np.random.default_rng(n)
    pos = jnp.asarray(rng.uniform(0, 300.0, (n, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n))
    eps, G = 0.2, 1.7
    acc_ref = direct_acc(pos, mass, eps=eps, G=G)
    pot_ref = direct_potential(pos, mass, eps=eps, G=G)
    acc, phi = allpairs_pallas_mxu(pos, mass, eps=eps, G=G, ti=128, tj=256)
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(acc_ref), rtol=1e-8, atol=1e-10
    )
    e_pot = 0.5 * float(jnp.sum(mass * phi))
    np.testing.assert_allclose(e_pot, float(pot_ref), rtol=1e-9)


def test_mxu_unsorted_matches_sorted():
    """sort=False takes the same kernel without the Morton permutation."""
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(0, 50.0, (384, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 384))
    a1, p1 = allpairs_pallas_mxu(pos, mass, eps=0.1, ti=128, tj=128)
    a2, p2 = allpairs_pallas_mxu(pos, mass, eps=0.1, ti=128, tj=128,
                                 sort=False)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-9)


def test_mxu_matches_exact_kernel_f32():
    """f32 envelope vs the exact-dx Pallas kernel on a box-scale system
    (the documented Gram-cancellation envelope, RESULTS.md round 3)."""
    rng = np.random.default_rng(9)
    n = 2048
    pos = jnp.asarray(rng.uniform(0, 500.0, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    eps = 0.5
    a_ref = direct_acc(
        pos.astype(jnp.float64), mass.astype(jnp.float64), eps=eps
    )
    acc, _ = allpairs_pallas_mxu(pos, mass, eps=eps, ti=128, tj=256)
    err = np.linalg.norm(
        np.asarray(acc, np.float64) - np.asarray(a_ref), axis=1
    ) / np.linalg.norm(np.asarray(a_ref), axis=1)
    assert np.median(err) < 1e-4 and err.max() < 1e-2


def test_mxu_requires_softening():
    pos, mass = random_system(8)
    with pytest.raises(ValueError):
        allpairs_pallas_mxu(pos, mass, eps=0.0)


def test_morton_codes_locality():
    """Sorted neighbours in code order are spatially close on average."""
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, 1.0, (4096, 3)))
    order = np.asarray(jnp.argsort(morton_codes(pos)))
    p = np.asarray(pos)[order]
    d_sorted = np.linalg.norm(np.diff(p, axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(np.asarray(pos), axis=0), axis=1).mean()
    assert d_sorted < 0.4 * d_rand
