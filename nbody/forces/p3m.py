"""P3M gravity: PM far field + short-range particle-particle correction.

TPU-native replacement for CONCEPT's P3M solver (``'gravity': 'p3m'``,
`TheFeedingPipeline/NN.param:81-83`; the reference's accuracy-vs-cost study
PP/PM/P3M is `PPPMP3M/pppmp3mplotter.py`; SURVEY.md §2.2).

Ewald-style Gaussian force splitting with scale r_s:
  * far field:  phi_k *= exp(-k^2 r_s^2)   (done inside the PM solve)
  * short range, pairwise for r < r_cut (~5 r_s):
      F(r) = G m (x_j - x_i) / r^3 * C(r),
      C(r) = erfc(r / (2 r_s)) + (r / (r_s sqrt(pi))) exp(-r^2 / (4 r_s^2))
    C -> 1 as r -> 0 (pure Newton) and -> 0 beyond the split scale, so the
    sum of the two parts is the exact periodic force up to the mesh's
    aliasing error.

The short-range sum runs as a Pallas tiled kernel (same SoA (4, N) layout
as nbody.forces.pallas_pp) with the cutoff applied as a mask — every pair
is *evaluated* but only nearby ones contribute.  This is the dense
tier for <= ~256k particles; a neighbor-binned kernel is the planned
upgrade path for larger N (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody.forces.pm import pm_acc

_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


def _erfc_pos(x, expmx2):
    """erfc(x) for x >= 0 via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7).

    Mosaic has no erfc lowering, and this form reuses the exp(-x^2) the
    short-range kernel already needs for its second term.
    """
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * expmx2


def _short_weight(r2, eps2: float, r_s: float, r_cut: float):
    """C(r) / (r^2 + eps^2)^(3/2), masked beyond r_cut. r2 includes eps2."""
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r  # r = sqrt(r2), one rsqrt + one mul
    x = r / (2.0 * r_s)
    expmx2 = jnp.exp(-x * x)
    corr = _erfc_pos(x, expmx2) + (r / r_s) * _INV_SQRT_PI * expmx2
    w = corr * inv_r * inv_r * inv_r
    return jnp.where(r2 < r_cut * r_cut, w, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("box", "eps", "r_s", "r_cut", "G", "ti", "tj", "interpret"),
)
def p3m_short_acc(
    pos,
    mass,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    ti: int = 1024,
    tj: int = 1024,
    interpret: bool | None = None,
):
    """Short-range P3M correction force (minimum-image periodic).

    Pairs are evaluated under the minimum-image convention, valid because
    r_cut << box/2.  The self-pair contributes zero force automatically
    (d = 0).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pos.shape[0]
    dtype = pos.dtype
    block = max(ti, tj)
    npad = -(-n // block) * block
    ni, nj = npad // ti, npad // tj

    # wrap positions into [0, box) then fold the minimum image into the
    # kernel by recentring each pair difference with mod
    packed = jnp.zeros((4, npad), dtype=dtype)
    packed = packed.at[:3, :n].set(jnp.mod(pos, box).T)
    packed = packed.at[3, :n].set(mass)

    def kernel(pi_ref, pj_ref, out_ref):
        j = pl.program_id(1)
        xi = pi_ref[0, :][:, None]
        yi = pi_ref[1, :][:, None]
        zi = pi_ref[2, :][:, None]
        xj = pj_ref[0, :][None, :]
        yj = pj_ref[1, :][None, :]
        zj = pj_ref[2, :][None, :]
        mj = pj_ref[3, :][None, :]

        def mimg(d):
            # minimum image: fold into [-box/2, box/2)
            return d - box * jnp.round(d * (1.0 / box))

        dx = mimg(xj - xi)
        dy = mimg(yj - yi)
        dz = mimg(zj - zi)
        r2 = dx * dx + dy * dy + dz * dz + eps * eps
        w = mj * _short_weight(r2, eps * eps, r_s, r_cut)
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        az = jnp.sum(w * dz, axis=1)
        update = jnp.stack([ax, ay, az, jnp.zeros_like(ax)])

        @pl.when(j == 0)
        def _():
            out_ref[:] = update

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + update

    out = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((4, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, npad), dtype),
        interpret=interpret,
    )(packed, packed)
    return out[:3, :n].T * G


def p3m_short_direct(pos, mass, box, eps, r_s, r_cut, G=1.0):
    """Dense jnp oracle for the short-range sum (tests)."""
    d = pos[None, :, :] - pos[:, None, :]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, pos.dtype) ** 2
    w = mass[None, :] * _short_weight(r2, eps**2, r_s, r_cut)
    n = pos.shape[0]
    w = jnp.where(jnp.eye(n, dtype=bool), 0.0, w)
    return G * jnp.einsum("ij,ijk->ik", w, d)


def p3m_acc(
    pos,
    mass,
    box: float,
    nmesh: int,
    G: float = 1.0,
    eps: float = 0.0,
    r_s: float | None = None,
    r_cut: float | None = None,
    deconvolve_p: int = 2,
    interlace: bool = False,
    interpret: bool | None = None,
):
    """Full P3M acceleration: Gaussian-filtered PM far field + Pallas
    short-range correction.

    Defaults follow the usual P3M practice: r_s = 1.25 cell widths,
    r_cut = 4.5 r_s (C(r_cut) < 2e-3).
    """
    cell = box / nmesh
    if r_s is None:
        r_s = 1.25 * cell
    if r_cut is None:
        r_cut = 4.5 * r_s
    acc_long = pm_acc(
        pos,
        mass,
        box,
        nmesh,
        G=G,
        deconvolve_p=deconvolve_p,
        interlace=interlace,
        longrange_split=float(r_s),
    )
    acc_short = p3m_short_acc(
        pos, mass, box, float(eps), float(r_s), float(r_cut), G=G,
        interpret=interpret,
    )
    return acc_long + acc_short
