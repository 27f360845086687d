"""Particle-Mesh (PM) gravity solver: CIC deposit -> FFT Poisson -> k-space
gradient -> CIC gather.

TPU-native replacement for CONCEPT's PM solver (Cython/C + FFTW + MPI; the
reference selects it via ``'gravity': 'pm'`` with
``potential_options['gridsize']`` — `TheFeedingPipeline/NN.param:53-77`,
`SnapVsPK/Uncertain.param:66-90`; SURVEY.md §2.2).  The FFT is a single
``jnp.fft.rfftn`` that XLA executes on the MXU-adjacent units and can shard
over a device mesh; deposit/gather are the vectorized CIC ops from
:mod:`nbody.mesh.cic`; deconvolution and interlacing are k-space
multipliers exactly like CONCEPT's "second interlacing pass" log lines.

Two source modes:
  * Newtonian periodic:  lap phi = 4 pi G (rho - rho_mean)
  * Comoving cosmological (canonical momenta, see
    nbody.integrate.cosmo_stepping):  lap phi = (3/2) Omega_m H0^2 delta / a
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbody.core.cosmology import Cosmology
from nbody.mesh.cic import (
    cic_deposit,
    cic_deposit_interlaced_k,
    cic_gather,
    cic_gather_vec,
    cic_window,
)
from nbody.mesh.grids import kvecs


@functools.partial(
    jax.jit,
    static_argnames=("box", "nmesh", "deconvolve_p", "interlace"),
)
def pm_potential_k(
    pos,
    mass,
    box: float,
    nmesh: int,
    deconvolve_p: int = 2,
    interlace: bool = False,
    grid_shift: float = 0.0,
):
    """-delta_k / k^2 on the rfft grid (unit source strength), from CIC
    deposit of the particles.  delta is the mass overdensity; the DC mode
    is zeroed (background subtraction — Jeans swindle).  ``grid_shift``
    (cells) offsets the deposit grid — 0.5 is CONCEPT's cell-centered
    discretization (``cell_centered = True``; the default 0 is its
    "vertex-diskretisering", `Different_Sizes/Giant.param:62`); the
    force gather must read back with the same shift."""
    if interlace:
        rho_k = cic_deposit_interlaced_k(
            pos, box, nmesh, weights=mass, base_shift=grid_shift
        )
    else:
        rho_k = jnp.fft.rfftn(
            cic_deposit(pos, box, nmesh, weights=mass, shift=grid_shift)
        )
    mean_mass_per_cell = jnp.sum(mass) / nmesh**3
    delta_k = rho_k / mean_mass_per_cell  # delta_k + N^3*delta(k); DC fixed below

    if deconvolve_p:
        # deconvolve_p = exponent on the per-axis sinc in the amplitude
        # window divided out: p=2 (default) removes exactly the CIC
        # DEPOSIT smoothing.  Deliberately NOT doubled for the gather:
        # deconvolving the interpolation too ((prod sinc)^4) amplifies
        # the point-source Nyquist content into Gibbs ringing — measured
        # pair forces at 6 cells drop to 0.69 +- 0.12 of Newton vs
        # 0.98 +- 0.02 with deposit-only deconvolution
        W = cic_window(nmesh, box, p=deconvolve_p, dtype=pos.dtype)
        delta_k = delta_k / jnp.maximum(W, 1e-8)

    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=pos.dtype)
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    phi_k = -delta_k * inv_k2           # zero at k=0: background removed
    return phi_k


def gradient_kernel(nmesh: int, box: float, order: str, dtype):
    """k-space differentiation kernels (kx, ky, kz replacements).

    * "spectral": i k — exact for band-limited fields but Gibbs-rings
      badly on particle (delta-like) sources: the force spectrum decays
      only as 1/k. Kept for smooth-field use.
    * "fd2": i sin(k h)/h — 2-point centered difference.
    * "fd4": i (8 sin(k h) - sin(2 k h)) / (6 h) — 4-point difference,
      the kernel CONCEPT/Gadget-class PM solvers use ("diff_order" in
      CONCEPT's force options).  Default.

    The sin-based kernels vanish at the Nyquist plane automatically, which
    is also the correct Hermitian-symmetry treatment.
    """
    h = box / nmesh
    kx, ky, kz = kvecs(
        nmesh, box, rfft=True, dtype=dtype, zero_nyquist=(order == "spectral")
    )
    if order == "spectral":
        return kx, ky, kz
    if order == "fd2":
        return tuple(jnp.sin(k * h) / h for k in (kx, ky, kz))
    if order == "fd4":
        return tuple(
            (8.0 * jnp.sin(k * h) - jnp.sin(2.0 * k * h)) / (6.0 * h)
            for k in (kx, ky, kz)
        )
    raise ValueError(f"unknown gradient kernel {order!r}")


@functools.lru_cache(maxsize=32)
def _spline_filter_radial(r_cut: float, k_max: float, n_tab: int = 4096):
    """Radial table of the spline-split long-range Green's function.

    Potential split 1/r = psi_s + psi_l with psi_l = q(r/r_cut)/r_cut
    inside r_cut (q(u) = (35 - 35u^2 + 21u^4 - 5u^6)/16, C^3-matched to
    1/r at r_cut) and 1/r outside.  Then

      psi_l_hat(k) / (4 pi) = 1/k^2 + I(k)/k,
      I(k) = r_cut * int_0^1 (u q(u) - 1) sin(k r_cut u) du,

    evaluated by trapezoid on a fine u grid (host numpy, cached per
    (r_cut, nmesh/box)).  This replaces the Ewald Gaussian exp(-k^2 r_s^2)
    filter of the classic split — its real-space complement needs only
    polynomial arithmetic in the short-range kernel (no exp/erfc), which
    is what makes the P3M inner loop VPU-cheap.
    """
    import numpy as np

    u = np.linspace(0.0, 1.0, 8192)
    q = (35.0 - 35.0 * u**2 + 21.0 * u**4 - 5.0 * u**6) / 16.0
    g = u * q - 1.0  # integrand factor, -> 0 at u=1
    ks = np.linspace(0.0, k_max, n_tab)
    # I(k) for every tabulated k: trapezoid over u
    kr = np.outer(ks, u) * r_cut
    I = r_cut * np.trapezoid(g[None, :] * np.sin(kr), u, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        F = np.where(ks > 0, 1.0 / np.maximum(ks, 1e-30) ** 2
                     + I / np.maximum(ks, 1e-30), 0.0)
    F[0] = 0.0  # DC removed (delta has no k=0 power)
    return ks, F


@functools.lru_cache(maxsize=32)
def _spline_longrange_filter_np(nmesh: int, box: float, r_cut: float,
                                dtype_name: str):
    """Host-side (numpy) 3D spline-split filter, cached per geometry.

    Computing this traced cost ~30 ms per force eval on the v5e: the
    1M-point interp ran over an emulated-f64 |k| grid inside every jit.
    The filter depends only on static args, so it is a constant."""
    import numpy as np

    two_pi = 2.0 * np.pi
    k1 = np.fft.fftfreq(nmesh, d=box / nmesh) * two_pi
    kz = np.fft.rfftfreq(nmesh, d=box / nmesh) * two_pi
    km = np.sqrt(
        k1[:, None, None] ** 2 + k1[None, :, None] ** 2
        + kz[None, None, :] ** 2
    )
    k_max = float(3.0**0.5 * np.pi * nmesh / box) * 1.0001
    ks, F = _spline_filter_radial(float(r_cut), k_max)
    return np.interp(km, ks, F).astype(dtype_name)


def spline_longrange_filter(nmesh: int, box: float, r_cut: float, dtype):
    """3D rfft-layout multiplier replacing inv_k2 * gaussian for the
    polynomial-spline force split (see _spline_filter_radial)."""
    np_name = str(jnp.dtype(dtype))
    return jnp.asarray(
        _spline_longrange_filter_np(int(nmesh), float(box), float(r_cut),
                                    np_name)
    )


def _fd_gradient_grids(phi, box: float, order: str):
    """Real-space centered-difference force grids from the potential.

    Circular shifts make these EXACTLY the k-space sin kernels of
    :func:`gradient_kernel` (fd2: i sin(kh)/h; fd4: the 4-point symbol)
    — same operator, one irfftn instead of three.  The three rolls per
    axis cost ~100 MB of contiguous traffic at 128^3 vs ~28 ms of extra
    inverse FFTs (measured on the v5e)."""
    h = box / phi.shape[0]
    grids = []
    for ax in range(3):
        p1 = jnp.roll(phi, -1, ax)
        m1 = jnp.roll(phi, 1, ax)
        if order == "fd2":
            g = (p1 - m1) * (0.5 / h)
        else:  # fd4
            p2 = jnp.roll(phi, -2, ax)
            m2 = jnp.roll(phi, 2, ax)
            g = (8.0 * (p1 - m1) - (p2 - m2)) * (1.0 / (12.0 * h))
        grids.append(-g)  # force = -grad phi
    return jnp.stack(grids)


def _force_grids(phi_k, box: float, nmesh: int, grad_order: str, dtype,
                 phase=None):
    """(3, nmesh^3) force grids from the rfft-layout potential.

    fd2/fd4: one irfftn of phi (optionally phase-shifted for the second
    interlacing pass) + real-space stencils; spectral: three irfftn with
    the exact ik kernel (no real-space equivalent)."""
    shape = (nmesh,) * 3
    if grad_order in ("fd2", "fd4"):
        pk = phi_k if phase is None else phi_k * phase
        phi = jnp.fft.irfftn(pk, s=shape)
        return _fd_gradient_grids(phi, box, grad_order)
    kx, ky, kz = gradient_kernel(nmesh, box, grad_order, dtype)
    if phase is not None:
        phi_k = phi_k * phase
    return jnp.stack(
        [jnp.fft.irfftn(-1j * kj * phi_k, s=shape) for kj in (kx, ky, kz)]
    )


def pm_force_grids_from_rho(
    rho,
    mass_sum,
    box: float,
    nmesh: int,
    *,
    source_amp,
    deconvolve_p: int = 2,
    longrange_split: float = 0.0,
    spline_split: float = 0.0,
    grad_order: str = "fd4",
):
    """(3, nmesh^3) force grids from a deposited mass grid.

    The mesh half of the PM solve with the deposit factored out — the
    supercell tier (nbody.forces.pm_supercell) deposits with its MXU
    kernel and reads forces back inside the fused column kernel, so it
    needs the k-space middle standalone.  ``source_amp`` multiplies the
    overdensity Poisson source (4 pi G rho_mean for Newtonian gravity).
    """
    dtype = rho.dtype
    rho_k = jnp.fft.rfftn(rho)
    delta_k = rho_k / (mass_sum / nmesh**3)
    phi_k = _phi_from_delta_k(
        delta_k, box, nmesh, source_amp, deconvolve_p, longrange_split,
        spline_split, dtype,
    )
    return _force_grids(phi_k, box, nmesh, grad_order, dtype)


def _phi_from_delta_k(delta_k, box, nmesh, source_amp, deconvolve_p,
                      longrange_split, spline_split, dtype):
    """Deconvolution + (split-filtered) Poisson solve in k space —
    shared by the from-rho grid builders."""
    if deconvolve_p:
        W = cic_window(nmesh, box, p=deconvolve_p, dtype=dtype)
        delta_k = delta_k / jnp.maximum(W, 1e-8)
    if spline_split > 0.0:
        filt = spline_longrange_filter(nmesh, box, spline_split, dtype)
        return -delta_k * filt * source_amp
    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=dtype)
    k2 = kx**2 + ky**2 + kz**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    phi_k = -delta_k * inv_k2 * source_amp
    if longrange_split > 0.0:
        phi_k = phi_k * jnp.exp(-k2 * (longrange_split**2))
    return phi_k


def pm_force_grids_from_rho_pair(
    rho0,
    rho1,
    mass_sum,
    box: float,
    nmesh: int,
    *,
    source_amp,
    deconvolve_p: int = 2,
    longrange_split: float = 0.0,
    spline_split: float = 0.0,
    grad_order: str = "fd4",
):
    """Interlaced sibling of :func:`pm_force_grids_from_rho`: ``rho1``
    deposited at a +half-cell shift, the deposits alias-cancelled in k
    (phase e^{-i k.d/2} — CLAUDE.md measurement convention), and BOTH
    force-readback grid sets returned stacked (6, nmesh^3): rows 0-2
    the unshifted grids, rows 3-5 the half-cell-shifted ones (phase
    e^{+i k.d/2}), for the two-pass force gather CONCEPT's interlacing
    requires (`nbody.forces.pm._pm_acc_impl`; supercell consumer:
    `nbody.forces.pm_supercell`)."""
    dtype = rho0.dtype
    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=dtype)
    d = box / nmesh
    ph_c = jnp.exp(-1j * ((kx + ky + kz) * (d / 2.0)).astype(dtype))
    delta_k = (
        0.5 * (jnp.fft.rfftn(rho0) + jnp.fft.rfftn(rho1) * ph_c)
        / (mass_sum / nmesh**3)
    )
    phi_k = _phi_from_delta_k(
        delta_k, box, nmesh, source_amp, deconvolve_p, longrange_split,
        spline_split, dtype,
    )
    grids = _force_grids(phi_k, box, nmesh, grad_order, dtype)
    ph_f = jnp.exp(1j * ((kx + ky + kz) * (d / 2.0)).astype(dtype))
    grids1 = _force_grids(phi_k, box, nmesh, grad_order, dtype, phase=ph_f)
    return jnp.concatenate([grids, grids1], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "nmesh", "deconvolve_p", "interlace", "longrange_split",
        "grad_order", "spline_split", "grid_shift",
    ),
)
def _pm_acc_impl(
    pos,
    mass,
    source_amp,
    box: float,
    nmesh: int,
    deconvolve_p: int,
    interlace: bool,
    longrange_split: float,
    grad_order: str = "fd4",
    spline_split: float = 0.0,
    grid_shift: float = 0.0,
):
    """acc_i = -grad phi(x_i) with lap phi = source_amp * delta.

    ``longrange_split`` > 0 multiplies the potential by the Ewald-style
    Gaussian filter exp(-k^2 r_s^2) (used by P3M's far field).
    ``spline_split`` > 0 (an r_cut) instead swaps the whole 1/k^2 Green's
    function for the polynomial-spline long-range filter — pair it with
    the spline short-range kernel in nbody.forces.p3m.
    """
    if spline_split > 0.0:
        phi_k = pm_potential_k(
            pos, mass, box, nmesh,
            deconvolve_p=deconvolve_p, interlace=interlace,
            grid_shift=grid_shift,
        )
        # pm_potential_k already divided by k^2; undo and apply the table
        kxs, kys, kzs = kvecs(nmesh, box, rfft=True, dtype=pos.dtype)
        k2 = kxs**2 + kys**2 + kzs**2
        filt = spline_longrange_filter(nmesh, box, spline_split, pos.dtype)
        phi_k = phi_k * source_amp * (k2 * filt)
        grids = _force_grids(phi_k, box, nmesh, grad_order, pos.dtype)
        return cic_gather_vec(grids, pos, box, shift=grid_shift)

    phi_k = pm_potential_k(
        pos, mass, box, nmesh, deconvolve_p=deconvolve_p,
        interlace=interlace, grid_shift=grid_shift,
    )
    phi_k = phi_k * source_amp
    if longrange_split > 0.0:
        kxs, kys, kzs = kvecs(nmesh, box, rfft=True, dtype=pos.dtype)
        k2 = kxs**2 + kys**2 + kzs**2
        phi_k = phi_k * jnp.exp(-k2 * (longrange_split**2))

    # force = -grad phi; all three components are read back in ONE fused
    # CIC gather (the readback is gather-bound)
    grids = _force_grids(phi_k, box, nmesh, grad_order, pos.dtype)
    if not interlace:
        return cic_gather_vec(grids, pos, box, shift=grid_shift)
    # CONCEPT's two interlacing passes for FORCES: the combined
    # (alias-cancelled) potential is read back from BOTH the unshifted
    # and the half-cell-shifted grid (phase-aligned with e^{+i k.d/2}),
    # and the passes average — gathering only from one grid would
    # re-introduce interpolation-side aliasing with catastrophic
    # particle-placement scatter (measured +-200% on pair forces)
    d = box / nmesh
    kxs, kys, kzs = kvecs(nmesh, box, rfft=True, dtype=pos.dtype)
    ph = jnp.exp(1j * ((kxs + kys + kzs) * (d / 2.0)).astype(pos.dtype))
    grids1 = _force_grids(phi_k, box, nmesh, grad_order, pos.dtype, phase=ph)
    return 0.5 * (
        cic_gather_vec(grids, pos, box, shift=grid_shift)
        + cic_gather_vec(grids1, pos, box, shift=grid_shift + 0.5)
    )


def pm_acc(
    pos,
    mass,
    box: float,
    nmesh: int,
    G: float = 1.0,
    deconvolve_p: int = 2,
    interlace: bool = False,
    longrange_split: float = 0.0,
    spline_split: float = 0.0,
    grad_order: str = "fd4",
    cell_centered: bool = False,
):
    """Newtonian periodic PM acceleration.

    lap phi = 4 pi G (rho - rho_mean); rho = mass / cell volume. The source
    amplitude entering the delta-Poisson solve is
    4 pi G rho_mean = 4 pi G M_tot / V.

    ``grad_order`` picks the k-space differentiation kernel (see
    :func:`gradient_kernel`) — CONCEPT's ``differentiation`` force option
    ('Fourier' = 'spectral', reference `TheFeedingPipeline/NN.param:58`).

    ``cell_centered`` offsets the deposit/gather grid by half a cell —
    CONCEPT's default discretization (its ``cell_centered = True``; the
    reference's PM study sets ``False``, "vertex-diskretisering",
    `Different_Sizes/Giant.param:62`, which is this solver's native
    convention).  The two differ only at the grid-aliasing level (every
    particle's sub-cell phase flips), which is exactly what the PM
    growth-convention bracketing probes.
    """
    V = box**3
    amp = 4.0 * jnp.pi * G * jnp.sum(mass) / V
    return _pm_acc_impl(
        pos, mass, amp, box, nmesh, deconvolve_p, interlace, longrange_split,
        spline_split=spline_split, grad_order=grad_order,
        grid_shift=0.5 if cell_centered else 0.0,
    )


def make_pm_energy_cosmo_force(
    cosmo: Cosmology,
    box: float,
    nmesh: int,
    deconvolve_p: int = 2,
):
    """Energy-conserving comoving PM force: the EXACT gradient of the
    sampled energy functional W = 1/2 sum_G rho_G phi_G (symmetric
    k-space operator), i.e. g_i = -sum_G grad_w(x_i, G) phi_G via
    :func:`nbody.mesh.cic.cic_gather_grad`.

    Classic energy-conserving (vs momentum-conserving) PM: with this
    force, T + W obeys Layzer-Irvine to pure time-stepping error — the
    validation tier for the LI diagnostic (it trades exact momentum
    conservation for exact functional consistency, so production keeps
    the momentum-conserving solver).
    """
    from nbody.mesh.cic import cic_gather_grad

    base = 1.5 * cosmo.Omega_m * cosmo.H0**2

    def acc_fn(pos, mass, a):
        amp = base / jnp.asarray(a, pos.dtype)
        phi_k = pm_potential_k(
            pos, mass, box, nmesh, deconvolve_p=deconvolve_p
        ) * amp
        phi = jnp.fft.irfftn(phi_k, s=(nmesh,) * 3)
        return -cic_gather_grad(phi, pos, box)

    return acc_fn


def make_pm_cosmo_force(
    cosmo: Cosmology,
    box: float,
    nmesh: int,
    deconvolve_p: int = 2,
    interlace: bool = False,
    grad_order: str = "fd4",
    cell_centered: bool = False,
):
    """Factory for the comoving canonical-momentum force
    g(pos, mass, a) = -grad phi, lap phi = (3/2) Omega_m H0^2 delta / a —
    plugs straight into nbody.integrate.run_cosmological."""
    base = 1.5 * cosmo.Omega_m * cosmo.H0**2
    shift = 0.5 if cell_centered else 0.0

    def acc_fn(pos, mass, a):
        amp = base / jnp.asarray(a, pos.dtype)
        return _pm_acc_impl(
            pos, mass, amp, box, nmesh, deconvolve_p, interlace, 0.0,
            grad_order=grad_order, grid_shift=shift,
        )

    return acc_fn
