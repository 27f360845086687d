"""Cloud-in-Cell mass assignment, window function, deconvolution, interlacing.

Rebuilds the reference's five near-identical CIC implementations (component
C6, SURVEY.md §2.1: numba-JIT per-particle scatter loops, e.g.
`SnapVsPK/Power_compare.py:100-132`) the TPU way: the 8-corner trilinear
scatter is a fully vectorized ``.at[].add`` over flattened cell indices —
no host loop, differentiable, jittable, and shardable (each particle shard
deposits to a local grid that is psum-reduced, SURVEY.md §5.8).

Window/deconvolution follow `cic_window_ft`/`deconvolve_cic`
(`SnapVsPK/Power_compare.py:80-97`): W(k) = prod_i sinc^2(k_i d / 2 pi) per
CIC deposit; interlacing matches CONCEPT's second-grid half-cell shift
(reference param `Giant.param` powerspec_options interlace).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from nbody.mesh.grids import kvecs


@functools.partial(jax.jit, static_argnames=("nmesh",))
def cic_deposit(pos, box, nmesh: int, weights=None, shift: float = 0.0):
    """CIC deposit of particles onto an (nmesh,)*3 grid.

    Returns the *mass-weighted count* grid (sum of weights = sum of particle
    weights; each particle spreads trilinear weights over its 8 cells with
    periodic wrap-around).  ``shift`` (in cells) offsets the grid origin —
    used for interlacing.
    """
    dtype = pos.dtype
    n = pos.shape[0]
    if weights is None:
        weights = jnp.ones((n,), dtype)
    s = pos * (nmesh / box) - shift
    i0 = jnp.floor(s)
    f = s - i0                     # (n, 3) in [0, 1)
    i0 = i0.astype(jnp.int32)

    flat = jnp.zeros((nmesh * nmesh * nmesh,), dtype)
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        w = (
            (f[:, 0] if dx else 1.0 - f[:, 0])
            * (f[:, 1] if dy else 1.0 - f[:, 1])
            * (f[:, 2] if dz else 1.0 - f[:, 2])
            * weights
        )
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        lin = (ix * nmesh + iy) * nmesh + iz
        flat = flat.at[lin].add(w)
    return flat.reshape((nmesh, nmesh, nmesh))


@functools.partial(jax.jit, static_argnames=())
def cic_gather(grid, pos, box):
    """Trilinear (CIC) interpolation of a grid field at particle positions —
    the adjoint of cic_deposit; used by PM to read forces back."""
    nmesh = grid.shape[0]
    s = pos * (nmesh / box)
    i0 = jnp.floor(s)
    f = s - i0
    i0 = i0.astype(jnp.int32)
    flat = grid.reshape(-1)
    out = jnp.zeros(pos.shape[:1], grid.dtype)
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        w = (
            (f[:, 0] if dx else 1.0 - f[:, 0])
            * (f[:, 1] if dy else 1.0 - f[:, 1])
            * (f[:, 2] if dz else 1.0 - f[:, 2])
        )
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        lin = (ix * nmesh + iy) * nmesh + iz
        out = out + w * flat[lin]
    return out


def cic_gather_vec(grids, pos, box, shift: float = 0.0):
    """CIC-interpolate C grids at once: grids (C, N, N, N) -> (n, C).

    One index/weight computation + one fused gather of (C,)-vectors per
    corner instead of C full passes — the PM force readback (3 components)
    is gather-bound on TPU, so this is ~3x cheaper than 3 cic_gather
    calls.  ``shift`` (cells) reads from a half-cell-offset grid (the
    second interlacing pass).
    """
    C = grids.shape[0]
    nmesh = grids.shape[1]
    s = pos * (nmesh / box) - shift
    i0 = jnp.floor(s)
    f = s - i0
    i0 = i0.astype(jnp.int32)
    flat = grids.reshape(C, -1).T  # (N^3, C) — corner fetch is one row
    out = jnp.zeros((pos.shape[0], C), grids.dtype)
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        w = (
            (f[:, 0] if dx else 1.0 - f[:, 0])
            * (f[:, 1] if dy else 1.0 - f[:, 1])
            * (f[:, 2] if dz else 1.0 - f[:, 2])
        )
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        lin = (ix * nmesh + iy) * nmesh + iz
        out = out + w[:, None] * flat[lin]
    return out


def bspline_deposit(pos, box, nmesh: int, order: int = 2, weights=None,
                    shift: float = 0.0):
    """B-spline mass assignment of arbitrary order on a node-centred
    grid: 2 = CIC, 3 = TSC, 4 = PCS.

    CONCEPT's measurement machinery interpolates with PCS by default
    ('interpolation' in powerspec_options — the reference's
    `SnapVsPK/Uncertain.param:89` switches it to CIC for that study);
    higher orders suppress the assignment's aliasing images much faster
    near the Nyquist.  The matching Fourier window is sinc^order per
    axis (:func:`assignment_window`).
    """
    if order == 2:
        return cic_deposit(pos, box, nmesh, weights=weights, shift=shift)
    dtype = pos.dtype
    n = pos.shape[0]
    if weights is None:
        weights = jnp.ones((n,), dtype)
    s = pos * (nmesh / box) - shift

    if order == 3:  # TSC: 3 nodes around the nearest node
        ic = jnp.floor(s + 0.5).astype(jnp.int32)
        offsets = (-1, 0, 1)

        def W(u):
            au = jnp.abs(u)
            return jnp.where(
                au <= 0.5, 0.75 - u * u,
                jnp.where(au < 1.5, 0.5 * (1.5 - au) ** 2, 0.0),
            )
    elif order == 4:  # PCS: 4 nodes from floor-1
        ic = jnp.floor(s).astype(jnp.int32)
        offsets = (-1, 0, 1, 2)

        def W(u):
            au = jnp.abs(u)
            return jnp.where(
                au <= 1.0, (4.0 - 6.0 * au * au + 3.0 * au**3) / 6.0,
                jnp.where(au < 2.0, (2.0 - au) ** 3 / 6.0, 0.0),
            )
    else:
        raise ValueError(f"unsupported assignment order {order}")

    wx = [W(s[:, 0] - (ic[:, 0] + o)) for o in offsets]
    wy = [W(s[:, 1] - (ic[:, 1] + o)) for o in offsets]
    wz = [W(s[:, 2] - (ic[:, 2] + o)) for o in offsets]
    flat = jnp.zeros((nmesh * nmesh * nmesh,), dtype)
    for a, ox in enumerate(offsets):
        ix = jnp.mod(ic[:, 0] + ox, nmesh)
        for b, oy in enumerate(offsets):
            iy = jnp.mod(ic[:, 1] + oy, nmesh)
            wxy = wx[a] * wy[b]
            for c, oz in enumerate(offsets):
                iz = jnp.mod(ic[:, 2] + oz, nmesh)
                lin = (ix * nmesh + iy) * nmesh + iz
                flat = flat.at[lin].add(wxy * wz[c] * weights)
    return flat.reshape((nmesh, nmesh, nmesh))


def assignment_window(nmesh: int, box: float, order: int,
                      dtype=jnp.float32):
    """Fourier window of a B-spline assignment of the given order:
    prod_i sinc(k_i d / 2 pi)^order (2 = CIC, 3 = TSC, 4 = PCS)."""
    return cic_window(nmesh, box, p=order, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("nmesh", "order"))
def bspline_deposit_interlaced_k(pos, box, nmesh: int, order: int = 2,
                                 weights=None):
    """Interlaced B-spline deposit in k space (order-generalised
    :func:`cic_deposit_interlaced_k`).

    Jitted: the TPU relay backend cannot execute rfftn (and other complex
    ops) eagerly op-by-op — measured round 3, the eager interlaced
    measurement path died with UNIMPLEMENTED on chip while every jitted
    caller worked."""
    g0 = bspline_deposit(pos, box, nmesh, order=order, weights=weights)
    g1 = bspline_deposit(pos, box, nmesh, order=order, weights=weights,
                         shift=0.5)
    k0 = jnp.fft.rfftn(g0)
    k1 = jnp.fft.rfftn(g1)
    d = box / nmesh
    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=g0.dtype)
    # the half-cell-shifted deposit samples rho((j + 1/2) d), so its
    # transform carries e^{+i k.d/2} relative to the unshifted grid —
    # align with e^{-i k.d/2} (the + sign SUPPRESSES high-k power by
    # cos^2 instead of cancelling the odd alias images)
    phase = jnp.exp(-1j * ((kx + ky + kz) * (d / 2.0)).astype(k0.real.dtype))
    return 0.5 * (k0 + k1 * phase)


def cic_gather_grad(grid, pos, box):
    """Gradient of the CIC-interpolated field wrt particle position:
    out_i = sum_G (d w(x_i - x_G) / d x_i) grid_G,  shape (n, 3).

    This is the *energy-conserving* PM readback: the exact derivative of
    the trilinear interpolation (piecewise-constant +/-1/h factors per
    axis), so a force built from it is the exact gradient of the sampled
    energy functional 1/2 sum rho_G phi_G — used by the Layzer-Irvine
    validation to separate integrator error from the momentum-conserving
    PM's force/energy mismatch.
    """
    nmesh = grid.shape[0]
    h = box / nmesh
    s = pos * (nmesh / box)
    i0 = jnp.floor(s)
    f = s - i0
    i0 = i0.astype(jnp.int32)
    flat = grid.reshape(-1)
    out = jnp.zeros((pos.shape[0], 3), grid.dtype)
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        wx = f[:, 0] if dx else 1.0 - f[:, 0]
        wy = f[:, 1] if dy else 1.0 - f[:, 1]
        wz = f[:, 2] if dz else 1.0 - f[:, 2]
        sx = (1.0 if dx else -1.0) / h
        sy = (1.0 if dy else -1.0) / h
        sz = (1.0 if dz else -1.0) / h
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        g = flat[(ix * nmesh + iy) * nmesh + iz]
        out = out + jnp.stack(
            [sx * wy * wz * g, wx * sy * wz * g, wx * wy * sz * g], axis=-1
        )
    return out


def density_to_delta(count_grid, n_particles: int):
    """Overdensity delta = rho/rho_mean - 1 from a CIC count grid
    (the reference's `compute_delta`, `FraP_kTilDelta.py:126-127`)."""
    mean = n_particles / count_grid.size
    return count_grid / mean - 1.0


def cic_window(nmesh: int, box: float, p: int = 2, dtype=jnp.float32):
    """CIC Fourier window on the rfft grid: prod_i sinc(k_i d / 2 pi)^p.

    p=2 matches the reference's deposit-only deconvolution
    (`cic_window_ft`, `SnapVsPK/Power_compare.py:80-91`); p=4 additionally
    corrects force interpolation (deposit + gather, the PM case).
    """
    d = box / nmesh
    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=dtype)

    def sinc(k):
        x = k * (d / (2.0 * np.pi))  # np.sinc convention: sin(pi x)/(pi x)
        return jnp.sinc(x)

    return (sinc(kx) * sinc(ky) * sinc(kz)) ** p


def deconvolve(delta_k, nmesh: int, box: float, p: int = 2):
    """Divide an rfft-layout field by the CIC window (zero-guarded)."""
    W = cic_window(nmesh, box, p=p, dtype=delta_k.real.dtype)
    return delta_k / jnp.maximum(W, 1e-8)


@functools.partial(jax.jit, static_argnames=("nmesh",))
def cic_deposit_interlaced_k(pos, box, nmesh: int, weights=None,
                             base_shift: float = 0.0):
    """Interlaced CIC deposit, returned in k-space (rfft layout).

    Two grids offset by half a cell are combined in Fourier space with the
    phase factor exp(i (kx+ky+kz) d/2), cancelling the leading aliasing
    images — the "second interlacing pass" CONCEPT logs during its
    powerspec measurements (SURVEY.md §2.2).  ``base_shift`` offsets BOTH
    grids (CONCEPT's cell-centered discretization, ``cell_centered =
    True`` — the alias-cancel phase between the passes is unchanged; the
    force readback must gather with the same base shift).
    """
    g0 = cic_deposit(pos, box, nmesh, weights=weights, shift=base_shift)
    g1 = cic_deposit(pos, box, nmesh, weights=weights,
                     shift=base_shift + 0.5)
    k0 = jnp.fft.rfftn(g0)
    k1 = jnp.fft.rfftn(g1)
    d = box / nmesh
    kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=g0.dtype)
    # the half-cell-shifted deposit samples rho((j + 1/2) d), so its
    # transform carries e^{+i k.d/2} relative to the unshifted grid —
    # align with e^{-i k.d/2} (the + sign SUPPRESSES high-k power by
    # cos^2 instead of cancelling the odd alias images)
    phase = jnp.exp(-1j * ((kx + ky + kz) * (d / 2.0)).astype(k0.real.dtype))
    return 0.5 * (k0 + k1 * phase)
