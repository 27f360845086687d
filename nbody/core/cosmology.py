"""Background cosmology, growth factors, and linear matter power spectra.

Rebuilds the role of the reference's CLASS wrapper
(`get_matter_power_spectrum`, reference `CiC/3D startbetingelser1.py:16-59`
and `TheFeedingPipeline/Cosmo data create (new).py:49-112` — component C1 in
SURVEY.md §2) without any C dependency: the linear P(k) comes from an
analytic Eisenstein–Hu (1998) transfer function normalised by the
primordial amplitude A_s (the parameter the reference's emulator infers),
or from a tabulated spectrum file (e.g. CLASS output).  An optional
``classy`` adapter is provided and gated on import availability.

Growth factors are integrated on the host with numpy at construction time
and exposed as jnp-interpolated tables, so everything downstream stays
jittable with static shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from nbody.core import units

# Primordial pivot scale used by CLASS/Planck, in 1/Mpc.
K_PIVOT = 0.05


@dataclasses.dataclass(frozen=True)
class Cosmology:
    """Flat LCDM background + primordial power-law spectrum.

    Parameters mirror the ones the reference varies for its emulator
    (A_s, n_s, omega_cdm — reference
    `TheFeedingPipeline/Cosmo data create (new).py:139-214`): we store the
    physical densities omega_b = Omega_b h^2 and omega_cdm = Omega_cdm h^2.
    """

    h: float = 0.67
    omega_b: float = 0.022
    omega_cdm: float = 0.12
    A_s: float = 2.1e-9
    n_s: float = 0.965
    T_cmb: float = 2.7255

    # -- derived densities -------------------------------------------------
    @property
    def Omega_b(self) -> float:
        return self.omega_b / self.h**2

    @property
    def Omega_cdm(self) -> float:
        return self.omega_cdm / self.h**2

    @property
    def Omega_m(self) -> float:
        return self.Omega_b + self.Omega_cdm

    @property
    def Omega_L(self) -> float:
        return 1.0 - self.Omega_m

    @property
    def H0(self) -> float:
        """H0 in Gyr^-1 (cosmo unit system)."""
        return units.hubble_gyr(self.h)

    # -- background --------------------------------------------------------
    def E(self, a):
        """Dimensionless Hubble rate H(a)/H0 (flat, matter + Lambda)."""
        a = jnp.asarray(a)
        return jnp.sqrt(self.Omega_m / a**3 + self.Omega_L)

    def H(self, a):
        """H(a) in Gyr^-1."""
        return self.H0 * self.E(a)

    # -- growth ------------------------------------------------------------
    @functools.cached_property
    def _growth_table(self):
        """Host-side tabulation of D(a), f(a) on a log-a grid.

        D(a) = (5 Omega_m / 2) E(a) \\int_0^a da' / (a' E(a'))^3, normalised
        to D(a=1) = 1; f = dlnD/dlna.  Pure numpy — runs once, cached.
        """
        lna = np.linspace(np.log(1e-4), np.log(2.0), 1024)
        a = np.exp(lna)
        E = np.sqrt(self.Omega_m / a**3 + self.Omega_L)
        integrand = 1.0 / (a * E) ** 3
        # cumulative trapezoid of integrand da = integrand * a dlna
        w = integrand * a
        integral = np.concatenate(
            [[0.0], np.cumsum(0.5 * (w[1:] + w[:-1]) * np.diff(lna))]
        )
        # contribution from 0..a_min in matter domination: int a'^{-3}E^{-3} da'
        # with E ~ sqrt(Om) a^-3/2  ->  int a^{3/2}/Om^{3/2} da = (2/5) a^{5/2}/Om^{3/2}
        integral += 0.4 * a[0] ** 2.5 / self.Omega_m**1.5
        # D_md: normalised so D_md(a) -> a in matter domination (this is
        # what the Poisson-equation amplitude formula needs; its value at
        # a=1 is the Lambda suppression factor g0 ~ 0.78)
        D_md = 2.5 * self.Omega_m * E * integral
        D0 = float(np.interp(0.0, lna, D_md))
        D = D_md / D0  # user-facing convention: D(1) = 1
        f = np.gradient(np.log(D), lna)
        # cache NUMPY arrays: this property may first be hit inside a jit
        # trace, and caching jnp arrays created there would leak tracers
        return lna, D, f, D0

    def growth_D(self, a):
        """Linear growth factor D(a), normalised so D(1)=1."""
        lna_t, D_t, _, _ = self._growth_table
        return jnp.interp(
            jnp.log(jnp.asarray(a)), jnp.asarray(lna_t), jnp.asarray(D_t)
        )

    def growth_f(self, a):
        """Logarithmic growth rate f = dlnD/dlna."""
        lna_t, _, f_t, _ = self._growth_table
        return jnp.interp(
            jnp.log(jnp.asarray(a)), jnp.asarray(lna_t), jnp.asarray(f_t)
        )

    @property
    def growth_suppression(self) -> float:
        """g0 = D_md(1): growth normalised to a in matter domination,
        evaluated today (~0.78 for Planck LCDM)."""
        return self._growth_table[3]

    def growth_D2(self, a):
        """Second-order growth factor, D2 ~ -3/7 D^2 Omega_m(a)^{-1/143}."""
        D = self.growth_D(a)
        a = jnp.asarray(a)
        Om_a = self.Omega_m / a**3 / self.E(a) ** 2
        return -3.0 / 7.0 * D**2 * Om_a ** (-1.0 / 143.0)

    # -- transfer functions --------------------------------------------------
    def transfer_eh(self, k):
        """Eisenstein & Hu (1998) zero-baryon-wiggle transfer function.

        ``k`` in 1/Mpc (not h/Mpc).  Includes the baryon suppression of the
        effective shape parameter (EH98 eqs. 26, 28-31).
        """
        k = jnp.asarray(k)
        h = self.h
        om = self.Omega_m * h**2
        ob = self.Omega_b * h**2
        theta = self.T_cmb / 2.7
        fb = self.Omega_b / self.Omega_m
        # sound horizon fit, EH98 eq. 26 (Mpc)
        s = 44.5 * jnp.log(9.83 / om) / jnp.sqrt(1.0 + 10.0 * ob**0.75)
        alpha = (
            1.0
            - 0.328 * jnp.log(431.0 * om) * fb
            + 0.38 * jnp.log(22.3 * om) * fb**2
        )
        gamma_eff = self.Omega_m * h * (
            alpha + (1.0 - alpha) / (1.0 + (0.43 * k * s) ** 4)
        )
        q = k * theta**2 / (gamma_eff * h)
        L0 = jnp.log(2.0 * jnp.e + 1.8 * q)
        C0 = 14.2 + 731.0 / (1.0 + 62.5 * q)
        return L0 / (L0 + C0 * q**2)

    def transfer_bbks(self, k):
        """BBKS (1986) transfer function with the Sugiyama (1995) shape."""
        k = jnp.asarray(k)
        h = self.h
        gamma = self.Omega_m * h * jnp.exp(
            -self.Omega_b * (1.0 + jnp.sqrt(2.0 * h) / self.Omega_m)
        )
        q = k / (gamma * h)
        q = jnp.maximum(q, 1e-12)
        return (
            jnp.log(1.0 + 2.34 * q)
            / (2.34 * q)
            * (1.0 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3 + (6.71 * q) ** 4)
            ** -0.25
        )

    # -- linear power spectrum ----------------------------------------------
    def linear_power(self, k, a=1.0, transfer: str = "eh"):
        """Linear matter power spectrum P(k, a) in Mpc^3 (k in 1/Mpc).

        P(k) = (8 pi^2 / 25) (A_s / Omega_m^2) (k / k_pivot)^{n_s - 1}
               k T(k)^2 D(a)^2 (c / H0)^4 / k_pivot^... — written below in
               the standard form via the Poisson relation between the
               primordial curvature spectrum and delta_m.
        """
        k = jnp.asarray(k)
        T = self.transfer_eh(k) if transfer == "eh" else self.transfer_bbks(k)
        D = self.growth_D(a)
        # c/H0 in Mpc
        c_over_H0 = units.C_KMS / (100.0 * self.h)
        # delta_m(k) = (2/5) (k c/H0)^2 T(k) D(a) / Omega_m  * R_prim(k)
        # P_m(k) = (2 pi^2 / k^3) A_s (k/kp)^{ns-1} * [above bracket]^2
        # the Poisson relation needs matter-domination-normalised growth
        D_md = D * self.growth_suppression
        bracket = 0.4 * (k * c_over_H0) ** 2 * T * D_md / self.Omega_m
        prim = (
            2.0
            * jnp.pi**2
            / jnp.maximum(k, 1e-30) ** 3
            * self.A_s
            * (k / K_PIVOT) ** (self.n_s - 1.0)
        )
        return prim * bracket**2

    def sigma_R(self, R, a=1.0, transfer: str = "eh"):
        """RMS of delta smoothed with a top-hat of radius R Mpc."""
        lnk = jnp.linspace(jnp.log(1e-5), jnp.log(1e3), 2048)
        k = jnp.exp(lnk)
        P = self.linear_power(k, a=a, transfer=transfer)
        x = k * R
        W = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x**3
        integrand = k**3 * P * W**2 / (2.0 * jnp.pi**2)
        return jnp.sqrt(jnp.trapezoid(integrand, lnk))

    def sigma8(self, a=1.0, transfer: str = "eh"):
        """sigma_8: top-hat radius 8 Mpc/h (the reference's convention,
        `SnapVsPK/Uncertain.param` sigma_8 tophat= 8*Mpc/h)."""
        return self.sigma_R(8.0 / self.h, a=a, transfer=transfer)


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash, so
# instances are valid static jit arguments despite holding arrays
class TabulatedPowerSpectrum:
    """Linear P(k) from a table (e.g. a CLASS ``..._pk.dat`` output).

    The reference obtains P(k) by calling classy directly
    (`CiC/3D startbetingelser1.py:16-59`); here the engine consumes a
    host-loaded table and interpolates in log-log on device, so the TPU
    program has no C dependency.
    """

    logk: jnp.ndarray  # ascending log k [1/Mpc]
    logP: jnp.ndarray  # log P [Mpc^3]

    @classmethod
    def from_arrays(cls, k, P, extrapolate: bool = True) -> "TabulatedPowerSpectrum":
        """``extrapolate=True`` extends the table three decades past each
        end along the boundary log-log slopes (power-law tails), so IC
        corner modes beyond the tabulated k_max and the small-k side of
        integrals stay physical instead of clamping flat."""
        k = np.asarray(k, dtype=np.float64)
        P = np.asarray(P, dtype=np.float64)
        good = (k > 0) & (P > 0)
        k, P = k[good], P[good]
        order = np.argsort(k)
        logk, logP = np.log(k[order]), np.log(P[order])
        if extrapolate and logk.size >= 2:
            s_lo = (logP[1] - logP[0]) / (logk[1] - logk[0])
            s_hi = (logP[-1] - logP[-2]) / (logk[-1] - logk[-2])
            span = 3.0 * np.log(10.0)
            logk = np.concatenate([[logk[0] - span], logk, [logk[-1] + span]])
            logP = np.concatenate(
                [[logP[0] - s_lo * span], logP, [logP[-1] + s_hi * span]]
            )
        return cls(logk=jnp.asarray(logk), logP=jnp.asarray(logP))

    @classmethod
    def from_file(cls, path, h: float = 1.0, in_h_units: bool = False):
        """Load a linear P(k) table: either a two-column (k, P) text file
        or a CONCEPT powerspec output, whose ``P_linear`` column then
        supplies the spectrum (lets runs consume the reference's own
        CLASS-grade linear theory, removing the EH-vs-CLASS transfer
        confounder from parity studies —
        `PPPMP3M/PP/powerspec/powerspec_a=1.00` columns).

        ``in_h_units=True`` converts CLASS/CAMB convention (k in h/Mpc,
        P in (Mpc/h)^3) to plain Mpc units.
        """
        with open(path, encoding="utf-8", errors="ignore") as f:
            head = f.read(400)
        if "Power spectrum from" in head:
            return cls.from_powerspec(path)
        data = np.loadtxt(path, comments="#")
        k, P = data[:, 0], data[:, 1]
        if in_h_units:
            k = k * h
            P = P / h**3
        return cls.from_arrays(k, P)

    @classmethod
    def from_powerspec(cls, path) -> "TabulatedPowerSpectrum":
        """Linear spectrum from a CONCEPT powerspec file's P_linear column
        (k [Mpc⁻¹], P [Mpc³] — already in this framework's units)."""
        from nbody.io.powerspec import read_powerspec

        tab = read_powerspec(path)
        if tab.P_linear is None:
            raise ValueError(f"{path} has no linear-P column")
        return cls.from_arrays(tab.k, tab.P_linear)

    def __call__(self, k):
        k = jnp.asarray(k)
        logP = jnp.interp(jnp.log(jnp.maximum(k, 1e-30)), self.logk, self.logP)
        return jnp.exp(logP)


def classy_power_spectrum(cosmo: Cosmology, z: float, kmax: float = 20.0):
    """Optional classy adapter: returns a TabulatedPowerSpectrum from CLASS.

    Mirrors the reference's `get_matter_power_spectrum`
    (`CiC/3D startbetingelser1.py:16-59`): same params dict shape, same
    P_k_max_1/Mpc-style cutoff.  Gated on classy being importable — the
    engine never requires it.
    """
    try:
        from classy import Class  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - classy not in image
        raise ImportError(
            "classy is not installed; use Cosmology.linear_power (EH98) or "
            "TabulatedPowerSpectrum.from_file instead"
        ) from e
    params = {
        "output": "mPk",
        "H0": 100.0 * cosmo.h,
        "omega_b": cosmo.omega_b,
        "omega_cdm": cosmo.omega_cdm,
        "A_s": cosmo.A_s,
        "n_s": cosmo.n_s,
        "P_k_max_1/Mpc": kmax,
        "z_max_pk": max(z, 0.0),
    }
    m = Class()
    m.set(params)
    m.compute()
    k = np.logspace(-4, np.log10(kmax), 512)
    P = np.array([m.pk(kk, z) for kk in k])
    m.struct_cleanup()
    return TabulatedPowerSpectrum.from_arrays(k, P)
