"""MXU Gram-matrix all-pairs gravity kernel.

The round-2 dense kernel (`nbody.forces.pallas_pp`) plateaued at the VPU
instruction-issue bound (~12 VPU slots/pair: explicit dx/dy/dz, r^2
assembly, and three weighted row-sum reductions all ride the 8x128 vector
unit).  This kernel moves the two O(pairs) dense contractions onto the
128x128 systolic array (MXU) and leaves only ``rsqrt`` plus two multiplies
per pair on the VPU:

  1. **Squared distances as a matmul.**  With per-i-tile centres c,
         r^2_ji + eps^2 = |xj-c|^2 + |xi-c|^2 + eps^2 - 2 (xj-c).(xi-c)
     is one K=8 contraction  A(TJ,8) @ B(8,TI)  where row j of A is
         [xjc_x^2, xjc_y^2, xjc_z^2, -2 xjc_x, -2 xjc_y, -2 xjc_z, 1, 0]
     and column i of B is
         [1, 1, 1, xic_x, xic_y, xic_z, |xic|^2 + eps^2, 0].
  2. **Force accumulation as a matmul.**  sum_j m_j w_ji (xj - xi) =
     [sum_j (m_j xjc_j) w_ji] - xic_i [sum_j m_j w_ji], i.e. an
     (8,TJ) @ (TJ,TI) contraction of mass-scaled centred coordinates
     against the weight matrix w = (r^2+eps^2)^(-3/2); the potential
     sum_j m_j (r^2+eps^2)^(-1/2) rides a second contraction against
     ``inv`` at zero extra VPU cost.

Precision: the Gram form subtracts like-magnitude squares, so the f32
error in r^2 is ~|x-c|^2 * 2^-22.  Particles are therefore Morton-sorted
so that every i-tile is spatially compact and centred on its own tile
centroid; the measured envelope vs the exact-dx kernel is recorded in
RESULTS.md.  Tests on the f64 CPU backend see ~1e-12 agreement with the
dense jnp oracle (`nbody.forces.allpairs`).  Periodic minimum-image
separations are NOT supported (the wrap depends on the pair, which has no
bilinear form); use the exact kernel or P3M for periodic boxes.

Zero-mass padding is NaN-safe by construction: mass scales the
accumulation matrix (step 2), never the weight matrix, and padded rows
keep finite r^2 > 0.

Reference role: CONCEPT's Cython/C PP solver (`'gravity': 'pp'`,
`Different_Sizes/Giant.param:66-68`) — this is its speed-of-light TPU
counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _morton_spread(x):
    """Spread the low 10 bits of x so consecutive bits are 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(pos, bits: int = 6):
    """Morton (Z-order) codes of positions on a 2^bits^3 grid spanning
    their bounding box.  Sorting by these makes contiguous index ranges
    spatially compact — the locality the Gram kernel's per-tile centring
    relies on."""
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    n_side = 1 << bits
    q = jnp.clip(
        ((pos - lo) / jnp.maximum(hi - lo, 1e-30) * n_side).astype(jnp.int32),
        0,
        n_side - 1,
    )
    return (
        _morton_spread(q[:, 0])
        | (_morton_spread(q[:, 1]) << 1)
        | (_morton_spread(q[:, 2]) << 2)
    )


def _mxu_kernel(cts_ref, asub_ref, lane_ref, bi_ref, out_ref, *, eps2):
    """One (i-tile, j-tile) visit; j is the minor grid dim so the output
    block accumulates in VMEM across j."""
    j = pl.program_id(1)
    acc_t = out_ref.dtype

    # centroids arrive as a scalar-prefetch array (full (ni,8) table in
    # SMEM; blocked (1,8) VMEM/SMEM specs violate the sublane-tiling
    # rule); build tiny broadcast rows via iota selects
    i_ct = pl.program_id(0)
    c0, c1, c2 = cts_ref[i_ct, 0], cts_ref[i_ct, 1], cts_ref[i_ct, 2]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    zero8 = jnp.zeros((1, 8), acc_t)
    crow = jnp.where(
        lane8 == 0, c0, jnp.where(lane8 == 1, c1, jnp.where(lane8 == 2, c2, zero8))
    )
    xc = asub_ref[:, :] - crow                       # (TJ,8) [xjc,0,0,0,1,0]
    sq = xc * xc
    lane = jax.lax.broadcasted_iota(jnp.int32, xc.shape, 1)
    # lanes 0-2: xjc^2 ; lane 6: 1 (=1^2) ; lanes 3-5: -2*xjc (rolled)
    a = jnp.where((lane < 3) | (lane == 6), sq, -2.0 * pltpu.roll(xc, 3, 1))

    r2 = jax.lax.dot_general(
        a, bi_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.HIGHEST,
    )                                                # (TJ,TI) = r^2+eps^2
    # The true softened r^2 is >= eps^2 by construction; Gram cancellation
    # can round a self/near pair slightly below it (even negative ->
    # rsqrt NaN).  Clamping at eps^2 is therefore strictly
    # error-reducing, never masking.
    r2 = jnp.maximum(r2, jnp.asarray(eps2, acc_t))
    inv = jax.lax.rsqrt(r2)
    w = (inv * inv) * inv

    # Zero the self-pair weights.  The self term W_ii * xic_i cancels
    # exactly against xic_i * W_ii in the epilogue algebra, but it is
    # ~eps^-3 * |xic| — orders of magnitude above the net force — and
    # poisons the f32 matmul partial sums (measured: median force error
    # 7e-2 with the diagonal in, 2e-6 with it zeroed).  Only the block
    # on the global diagonal pays the masking ops.
    i = pl.program_id(0)
    tj_sz, ti_sz = w.shape
    off = i * ti_sz - j * tj_sz

    def _mask_diag(ops):
        w_, inv_ = ops
        sub = jax.lax.broadcasted_iota(jnp.int32, w_.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, w_.shape, 1)
        eq = sub - lane == off
        zero = jnp.asarray(0.0, acc_t)
        return jnp.where(eq, zero, w_), jnp.where(eq, zero, inv_)

    w, inv = jax.lax.cond(
        jnp.logical_and(off > -ti_sz, off < tj_sz),
        _mask_diag,
        lambda ops: ops,
        (w, inv),
    )

    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    ccol = jnp.where(
        row8 == 0, c0,
        jnp.where(row8 == 1, c1, jnp.where(row8 == 2, c2, jnp.zeros((8, 1), acc_t))),
    )
    plb = lane_ref[:, :] - ccol                      # rows [xjc,yjc,zjc,1,m,..]
    m = plb[4:5, :]                                  # (1,TJ) raw masses
    pl8 = plb * m                                    # rows [m*xjc,...,m,m^2,..]
    upd = jax.lax.dot_general(
        pl8, w, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.HIGHEST,
    )                                                # (8,TI)
    pot = jax.lax.dot_general(
        m, inv, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.HIGHEST,
    )                                                # (1,TI)
    row = jax.lax.broadcasted_iota(jnp.int32, upd.shape, 0)
    upd = jnp.where(row == 4, jnp.broadcast_to(pot, upd.shape), upd)

    @pl.when(j == 0)
    def _():
        out_ref[:] = upd

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + upd


@functools.partial(
    jax.jit,
    static_argnames=("eps", "G", "ti", "tj", "sort", "interpret", "bits"),
)
def allpairs_pallas_mxu(
    pos,
    mass,
    eps: float,
    G: float = 1.0,
    *,
    ti: int = 256,
    tj: int = 1024,
    sort: bool = True,
    bits: int = 6,
    interpret: bool | None = None,
):
    """All-pairs softened gravity with both dense contractions on the MXU.

    Args:
      pos: (N, 3) positions (open boundary — no periodic images).
      mass: (N,) masses.
      eps: Plummer softening, must be > 0.
      G: gravitational constant.
      ti, tj: tile sizes (multiples of 128/8 for lane/sublane alignment).
      sort: Morton-sort particles first so i-tiles are spatially compact
        (bounds the f32 Gram cancellation error; see module docstring).
      bits: Morton grid depth (2^bits cells per axis).
      interpret: Pallas interpreter mode (auto-True off-TPU).

    Returns:
      acc: (N, 3) accelerations.
      phi: (N,) potential per unit mass (self-term removed), so
        E_pot = 0.5 * sum(mass * phi).
    """
    if eps <= 0:
        raise ValueError("allpairs_pallas_mxu requires eps > 0")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = pos.shape[0]
    dtype = jnp.float32 if pos.dtype == jnp.float32 else pos.dtype
    pos = pos.astype(dtype)
    mass = mass.astype(dtype)

    if sort:
        perm = jnp.argsort(morton_codes(pos, bits=bits))
        pos_s = pos[perm]
        mass_s = mass[perm]
    else:
        perm = None
        pos_s, mass_s = pos, mass

    block = max(ti, tj)
    npad = -(-n // block) * block
    ni, nj = npad // ti, npad // tj
    pad = npad - n
    if pad:
        # park padding on the last real particle (mass 0 => no force)
        pos_s = jnp.concatenate([pos_s, jnp.broadcast_to(pos_s[-1:], (pad, 3))])
        mass_s = jnp.concatenate([mass_s, jnp.zeros((pad,), dtype)])

    valid = (jnp.arange(npad) < n).astype(dtype)
    # per-i-tile centroids over REAL particles only
    vt = valid.reshape(ni, ti)
    cnt = jnp.maximum(jnp.sum(vt, axis=1), 1.0)
    ctr = jnp.sum(pos_s.reshape(ni, ti, 3) * vt[:, :, None], axis=1) / cnt[:, None]
    cts = jnp.zeros((ni, 8), dtype).at[:, :3].set(ctr)

    xic = pos_s - jnp.repeat(ctr, ti, axis=0)
    eps2 = jnp.asarray(float(eps) ** 2, dtype)
    bi = jnp.zeros((8, npad), dtype)
    bi = bi.at[0:3, :].set(1.0)
    bi = bi.at[3:6, :].set(xic.T)
    bi = bi.at[6, :].set(jnp.sum(xic * xic, axis=1) + eps2)

    asub = jnp.zeros((npad, 8), dtype)
    asub = asub.at[:, 0:3].set(pos_s)
    asub = asub.at[:, 6].set(1.0)

    lane_arr = jnp.zeros((8, npad), dtype)
    lane_arr = lane_arr.at[0:3, :].set(pos_s.T)
    lane_arr = lane_arr.at[3, :].set(1.0)
    lane_arr = lane_arr.at[4, :].set(mass_s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((tj, 8), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tj), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ti), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, ti), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_mxu_kernel, eps2=float(eps) ** 2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), dtype),
        cost_estimate=pl.CostEstimate(
            flops=40 * npad * npad,
            bytes_accessed=4 * npad * 24 * (ni + nj + 2),
            transcendentals=npad * npad,
        ),
        interpret=interpret,
    )(cts, asub, lane_arr, bi)

    # self-pair rows are zeroed inside the kernel (W and INV diagonals),
    # so no self-term subtraction is needed here
    acc_s = (out[0:3, :].T - xic * out[3, :][:, None]) * G
    phi_s = -G * out[4, :]
    acc_s, phi_s = acc_s[:n], phi_s[:n]
    if perm is not None:
        acc = jnp.zeros((n, 3), dtype).at[perm].set(acc_s)
        phi = jnp.zeros((n,), dtype).at[perm].set(phi_s)
        return acc, phi
    return acc_s, phi_s
