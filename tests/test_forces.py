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
