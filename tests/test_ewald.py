"""Exact periodic PP (Ewald) tests.

The decisive check is split invariance: the Ewald sum must not depend on
the split scale r_s (each choice moves weight between the real-space and
k-space halves), so agreement across very different splits validates both
halves including signs and normalisation."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody.forces.ewald import ewald_pp_acc


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(42)
    n, box = 24, 100.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))
    return pos, mass, box


def test_split_invariance(system):
    pos, mass, box = system
    a1 = ewald_pp_acc(pos, mass, box, eps=0.0, G=1.0, r_s=box / 16, n_max=10)
    a2 = ewald_pp_acc(pos, mass, box, eps=0.0, G=1.0, r_s=box / 20, n_max=14)
    rel = np.linalg.norm(np.asarray(a1 - a2), axis=-1) / np.linalg.norm(
        np.asarray(a1), axis=-1
    )
    assert rel.max() < 1e-5


def test_momentum_conservation(system):
    pos, mass, box = system
    acc = ewald_pp_acc(pos, mass, box, eps=0.5, G=1.0)
    net = np.asarray(jnp.sum(mass[:, None] * acc, axis=0))
    scale = float(jnp.sum(mass[:, None] * jnp.abs(acc)))
    assert np.abs(net).max() < 1e-10 * scale


def test_perfect_lattice_force_is_zero():
    """Exact symmetry oracle: on a uniform simple-cubic lattice of equal
    masses every periodic force vanishes identically.  (A brute-force sum
    over a cube of images is NOT a valid oracle — the conditionally
    convergent lattice sum retains a non-vanishing shape-dependent
    anisotropy term; the split-invariance test above plays that role.)"""
    from nbody.mesh.grids import lattice

    box = 100.0
    pos = lattice(4, box, dtype=jnp.float64) + box / 8  # cell-centred 4^3
    mass = jnp.ones((64,))
    acc = ewald_pp_acc(pos, mass, box, eps=0.0, G=1.0)
    # scale: the force one perturbed particle would feel
    probe = pos.at[0, 0].add(box / 16)
    scale = np.linalg.norm(
        np.asarray(ewald_pp_acc(probe, mass, box, eps=0.0, G=1.0)[0])
    )
    assert np.abs(np.asarray(acc)).max() < 1e-8 * scale


def test_reduces_to_newton_for_tight_cluster():
    """A compact cluster far from its images: the periodic force inside
    the cluster approaches the isolated Newtonian force."""
    from nbody.forces.allpairs import direct_acc

    rng = np.random.default_rng(1)
    box = 1000.0
    n = 16
    pos = jnp.asarray(box / 2 + rng.uniform(-2.0, 2.0, (n, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))
    a_ew = ewald_pp_acc(pos, mass, box, eps=0.1, G=1.0)
    a_new = direct_acc(pos, mass, eps=0.1, G=1.0)
    rel = np.linalg.norm(np.asarray(a_ew - a_new), axis=-1) / np.linalg.norm(
        np.asarray(a_new), axis=-1
    )
    assert rel.max() < 1e-4


def test_ewald_agrees_with_p3m():
    """Cross-solver consistency (VERDICT item #8 done-criterion at force
    level): the exact Ewald PP force and the P3M force agree to mesh
    accuracy — including the box-scale modes where the old minimum-image
    PP carried a systematic."""
    from nbody.forces.p3m import p3m_acc

    from nbody.forces.pallas_pp import allpairs_pallas

    rng = np.random.default_rng(5)
    n, box, nmesh = 256, 100.0, 32
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))
    a_ew = np.asarray(ewald_pp_acc(pos, mass, box, eps=0.5, G=1.0))
    rms = np.sqrt((np.linalg.norm(a_ew, axis=-1) ** 2).mean())
    a_p3m = np.asarray(
        p3m_acc(pos, mass, box, nmesh, G=1.0, eps=0.5, split="spline")
    )
    err_p3m = np.linalg.norm(a_p3m - a_ew, axis=-1) / rms
    assert np.median(err_p3m) < 1e-2 and err_p3m.max() < 5e-2
    # and the old minimum-image PP really was systematically off (~6%
    # median): Ewald must sit far closer to P3M than min-image does
    a_mi, _ = allpairs_pallas(pos, mass, eps=0.5, G=1.0, box=box)
    err_mi = np.linalg.norm(np.asarray(a_mi) - a_ew, axis=-1) / rms
    assert np.median(err_mi) > 5 * np.median(err_p3m)
