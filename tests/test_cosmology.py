"""Cosmology background / growth / P(k) sanity oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody.core.cosmology import Cosmology, TabulatedPowerSpectrum


COSMO = Cosmology(h=0.674, omega_b=0.02237, omega_cdm=0.1200, A_s=2.1e-9, n_s=0.965)


def test_background():
    assert abs(float(COSMO.E(1.0)) - 1.0) < 1e-12
    # matter domination: E ~ sqrt(Om) a^-1.5
    a = 0.01
    expected = np.sqrt(COSMO.Omega_m) * a**-1.5
    np.testing.assert_allclose(float(COSMO.E(a)), expected, rtol=1e-3)
    # H0 ~ 0.0689 Gyr^-1 for h=0.674 (1/H0 ~ 14.5 Gyr)
    np.testing.assert_allclose(COSMO.H0, 0.0689, rtol=1e-2)


def test_growth_factor():
    # D(1) = 1 by normalization
    np.testing.assert_allclose(float(COSMO.growth_D(1.0)), 1.0, rtol=1e-6)
    # deep matter domination: D proportional to a
    d1, d2 = float(COSMO.growth_D(0.01)), float(COSMO.growth_D(0.02))
    np.testing.assert_allclose(d2 / d1, 2.0, rtol=1e-3)
    # f -> 1 in matter domination, ~0.53 today for Planck-ish params
    assert abs(float(COSMO.growth_f(0.01)) - 1.0) < 0.01
    assert 0.4 < float(COSMO.growth_f(1.0)) < 0.65


def test_sigma8_planck_ballpark():
    """EH98 + A_s normalisation should land near the Planck sigma8 ~ 0.81
    (the reference gets its spectra from CLASS with similar params)."""
    s8 = float(COSMO.sigma8())
    assert 0.70 < s8 < 0.92, s8


def test_linear_power_shape():
    k = jnp.asarray(np.geomspace(1e-4, 10, 256))
    P = np.asarray(COSMO.linear_power(k))
    assert (P > 0).all()
    # turnover: P rises at low k, falls at high k
    ipk = int(np.argmax(P))
    assert 0 < ipk < len(k) - 1
    k_eq = float(k[ipk])
    assert 0.005 < k_eq < 0.05  # matter-radiation equality scale ~0.01-0.02/Mpc
    # low-k slope ~ n_s
    slope = np.log(P[10] / P[0]) / np.log(k[10] / k[0])
    np.testing.assert_allclose(slope, COSMO.n_s, atol=0.05)


def test_bbks_close_to_eh():
    k = jnp.asarray(np.geomspace(1e-3, 1, 64))
    P_eh = np.asarray(COSMO.linear_power(k, transfer="eh"))
    P_bbks = np.asarray(COSMO.linear_power(k, transfer="bbks"))
    ratio = P_bbks / P_eh
    assert (np.abs(np.log(ratio)) < 0.5).all()  # same ballpark everywhere


def test_tabulated_roundtrip(tmp_path):
    k = np.geomspace(1e-3, 10, 128)
    P = np.asarray(COSMO.linear_power(jnp.asarray(k)))
    path = tmp_path / "pk.dat"
    np.savetxt(path, np.column_stack([k, P]), header="k P")
    tab = TabulatedPowerSpectrum.from_file(path)
    k_test = jnp.asarray([0.01, 0.1, 1.0])
    np.testing.assert_allclose(
        np.asarray(tab(k_test)),
        np.asarray(COSMO.linear_power(k_test)),
        rtol=0.02,
    )


def test_growth_D2_sign():
    d2 = float(COSMO.growth_D2(1.0))
    assert -0.6 < d2 < -0.3  # ~ -3/7


class TestClassyAdapter:
    """Contract test for classy_power_spectrum (cosmology.py) against a
    mocked classy module — classy itself is not in this image, but the
    adapter's code path (params dict shape, pk sampling, tabulated
    ingestion) is the reference's entire L0
    (`CiC/3D startbetingelser1.py:16-59`)."""

    def _install_fake_classy(self, monkeypatch, pk_fn, seen):
        import sys
        import types

        class FakeClass:
            def set(self, params):
                seen["params"] = dict(params)

            def compute(self):
                seen["computed"] = True

            def pk(self, k, z):
                seen.setdefault("z", z)
                return float(pk_fn(k))

            def struct_cleanup(self):
                seen["cleaned"] = True

        mod = types.ModuleType("classy")
        mod.Class = FakeClass
        monkeypatch.setitem(sys.modules, "classy", mod)

    def test_adapter_matches_mocked_class(self, monkeypatch):
        from nbody.core.cosmology import Cosmology, classy_power_spectrum

        cosmo = Cosmology(h=0.7, omega_b=0.023, omega_cdm=0.118,
                          A_s=2.0e-9, n_s=0.96)
        truth = lambda k: float(
            cosmo.linear_power(jnp.asarray(float(k)), a=1.0)
        )
        seen = {}
        self._install_fake_classy(monkeypatch, truth, seen)
        tab = classy_power_spectrum(cosmo, z=0.0, kmax=10.0)

        # params dict carries the reference's shape (H0 = 100 h, mPk
        # output, P_k_max cutoff)
        p = seen["params"]
        assert p["output"] == "mPk"
        assert abs(p["H0"] - 70.0) < 1e-12
        assert p["omega_b"] == cosmo.omega_b
        assert p["omega_cdm"] == cosmo.omega_cdm
        assert p["A_s"] == cosmo.A_s and p["n_s"] == cosmo.n_s
        assert p["P_k_max_1/Mpc"] == 10.0
        assert seen["computed"] and seen["cleaned"] and seen["z"] == 0.0

        # the tabulated spectrum reproduces the mocked P(k) within
        # log-log interpolation error on interior k
        ks = np.geomspace(2e-3, 5.0, 64)
        got = np.asarray(tab(jnp.asarray(ks)))
        want = np.array([truth(k) for k in ks])
        np.testing.assert_allclose(got, want, rtol=2e-3)

    def test_adapter_import_error_without_classy(self, monkeypatch):
        import sys

        from nbody.core.cosmology import Cosmology, classy_power_spectrum

        monkeypatch.setitem(sys.modules, "classy", None)
        with pytest.raises(ImportError, match="classy is not installed"):
            classy_power_spectrum(Cosmology(), z=0.0)
