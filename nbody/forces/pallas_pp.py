"""Pallas tiled all-pairs gravity kernel (the PP solver's hot path).

TPU-native replacement for CONCEPT's Cython/C PP direct-summation solver
(the reference selects it with ``'gravity': 'pp'``,
`Different_Sizes/Giant.param:66-68`; CONCEPT PP takes ~2d23h for N=64^3 on
the author's desktop, `PPPMP3M/pppmp3mplotter.py:18-22`).

Design (tpu-first, not a translation):
  * Particle data is packed as one (4, N) SoA array — rows x, y, z, mass —
    so the lane dimension (last, 128-wide) runs over particles and a j-tile
    is a single contiguous VMEM block.
  * Grid = (N/TI, N/TJ). The i-tile is revisited across the j dimension and
    the output block accumulates in VMEM (standard Pallas reduction
    pattern); j is the minor grid dimension so the accumulator never leaves
    VMEM between visits.
  * The same pass accumulates the per-particle potential  sum_j m_j / r
    in the 4th output row — energy diagnostics come for free with the
    force (the reference has no energy diagnostic at all; SURVEY.md §5.5).
  * Softening must be > 0: the self-pair then contributes exactly zero
    force (d = 0) and a known m_i/eps potential term that the wrapper
    subtracts — no masking needed in the inner loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pp_kernel(pi_ref, pj_ref, out_ref, *, eps2: float, box: float = 0.0):
    j = pl.program_id(1)

    xi = pi_ref[0, :][:, None]   # (TI, 1)
    yi = pi_ref[1, :][:, None]
    zi = pi_ref[2, :][:, None]
    xj = pj_ref[0, :][None, :]   # (1, TJ)
    yj = pj_ref[1, :][None, :]
    zj = pj_ref[2, :][None, :]
    mj = pj_ref[3, :][None, :]

    dx = xj - xi                 # (TI, TJ)
    dy = yj - yi
    dz = zj - zi
    if box > 0.0:  # periodic minimum image (static branch, VPU-only cost)
        inv_box = 1.0 / box
        dx = dx - box * jnp.round(dx * inv_box)
        dy = dy - box * jnp.round(dy * inv_box)
        dz = dz - box * jnp.round(dz * inv_box)
    r2 = dx * dx + dy * dy + dz * dz + eps2
    inv_r = jax.lax.rsqrt(r2)
    mw = mj * inv_r              # m_j / r       -> potential term
    w = mw * inv_r * inv_r       # m_j / r^3     -> force weight

    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)
    pot = jnp.sum(mw, axis=1)
    update = jnp.stack([ax, ay, az, pot])   # (4, TI)

    @pl.when(j == 0)
    def _():
        out_ref[:] = update

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + update


@functools.partial(
    jax.jit, static_argnames=("eps", "G", "ti", "tj", "interpret", "box")
)
def allpairs_pallas(
    pos,
    mass,
    eps: float,
    G: float = 1.0,
    *,
    ti: int = 512,
    tj: int = 2048,
    interpret: bool | None = None,
    box: float = 0.0,
):
    """All-pairs softened gravity via the tiled Pallas kernel.

    Args:
      pos: (N, 3) positions.
      mass: (N,) masses.
      eps: Plummer softening, must be > 0.
      G: gravitational constant.
      ti, tj: tile sizes (multiples of 128 for lane alignment).  Default
        (512, 2048) measured fastest on v5e (ti*tj intermediates are
        VMEM-bound at ~4 MB; larger j-tiles amortise grid overhead).
      interpret: run the kernel in interpreter mode (auto-True off-TPU so
        the same code path is testable on a CPU host).
      box: if > 0, apply periodic minimum-image separations (cosmological
        PP; nearest image only — no Ewald sum, use P3M for sub-percent
        periodic accuracy).

    Returns:
      acc: (N, 3) accelerations.
      phi: (N,) potential per unit mass (self-term removed), so
        E_pot = 0.5 * sum(mass * phi).
    """
    if eps <= 0:
        raise ValueError("allpairs_pallas requires eps > 0 (self-pair handling)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = pos.shape[0]
    dtype = pos.dtype
    block = max(ti, tj)
    npad = -(-n // block) * block
    ni, nj = npad // ti, npad // tj

    packed = jnp.zeros((4, npad), dtype=dtype)
    packed = packed.at[:3, :n].set(pos.T)
    packed = packed.at[3, :n].set(mass)

    eps2 = float(eps) ** 2
    out = pl.pallas_call(
        functools.partial(_pp_kernel, eps2=eps2, box=float(box)),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((4, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, npad), dtype),
        cost_estimate=pl.CostEstimate(
            flops=20 * npad * npad,
            bytes_accessed=4 * npad * 4 * (ni + nj + 2),
            transcendentals=npad * npad,
        ),
        interpret=interpret,
    )(packed, packed)

    acc = out[:3, :n].T * G
    phi = -G * (out[3, :n] - mass * (eps2**-0.5))
    return acc, phi


@functools.partial(
    jax.jit, static_argnames=("eps", "ti", "tj", "interpret")
)
def block_acc_pallas(
    pos_i,
    pos_j,
    mass_j,
    eps: float,
    *,
    ti: int = 512,
    tj: int = 2048,
    interpret: bool | None = None,
):
    """Raw cross-block accumulation: targets i against sources (j, m_j).

    Returns (acc_raw (Ni,3), pot_raw (Ni,)) WITHOUT the G factor and
    WITHOUT self-term removal: acc_raw = sum_j m_j d / (r^2+eps^2)^1.5,
    pot_raw = sum_j m_j / sqrt(r^2+eps^2).  This is the building block the
    distributed ring exchange accumulates across devices
    (nbody.distributed.sharding); the caller applies G / self-term once.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ni_, nj_ = pos_i.shape[0], pos_j.shape[0]
    dtype = pos_i.dtype
    ti = min(ti, max(128, ni_))
    tj = min(tj, max(128, nj_))
    nip = -(-ni_ // ti) * ti
    njp = -(-nj_ // tj) * tj

    pi = jnp.zeros((4, nip), dtype).at[:3, :ni_].set(pos_i.T)
    pj = jnp.zeros((4, njp), dtype).at[:3, :nj_].set(pos_j.T)
    pj = pj.at[3, :nj_].set(mass_j)

    out = pl.pallas_call(
        functools.partial(_pp_kernel, eps2=float(eps) ** 2),
        grid=(nip // ti, njp // tj),
        in_specs=[
            pl.BlockSpec((4, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, nip), dtype),
        interpret=interpret,
    )(pi, pj)
    return out[:3, :ni_].T, out[3, :ni_]


def interactions_per_call(n: int, ti: int = 512, tj: int = 2048) -> int:
    """Pairwise interactions evaluated by one allpairs_pallas call
    (including padding work — what the hardware actually executes)."""
    block = max(ti, tj)
    npad = -(-n // block) * block
    return npad * npad
