"""Column-packed short-range P3M tier: z-sorted cell COLUMNS with
dynamic z-windows.

Why: the per-cell bucket kernel (`nbody.forces.p3m.run_cell_plane`) pads
every chaining cell to a lane-aligned width K >= 128 and evaluates
K x 3K slot-pairs per cell — at production occupancies (~25-100
particles/cell) most slots are sentinel padding, so useful-pair
efficiency is a few percent (measured round 3: 204 ms of a 521 ms P3M
eval at N=2^20, 60% slot throughput but ~(occ/K)^2 utilisation).

Here the unit is an (x, y) chaining COLUMN: its particles are z-sorted
into one contiguous bucket of capacity CK, padding amortises once per
COLUMN instead of once per cell, and each 128-particle i-chunk interacts
only with the z-WINDOW of the 9 neighbour columns that its z-range
+- r_cut can reach (window starts precomputed per chunk by vectorised
searchsorted, fed to the kernel as scalar-prefetch data; lane-aligned).
Slot-pair work drops ~4x at N=2^20 and more for clustered states.

Geometry is identical to the cell tier (columns of side >= r_cut), so
the same r_cut/split/softening physics applies; xy periodicity is one
ring of ghost columns (+-box baked into coordinates), z periodicity is a
GZ-slot ghost copy at each end of every column (so the kernel needs no
minimum-image arithmetic at all).  Both bucket and window overflow are
counted and returned — the driver's capacity self-heal doubles the
right knob (col_capacity / window).

Reference role: CONCEPT's P3M short-range pass (its tiling lives in C;
`TheFeedingPipeline/NN.param:81-83`); this is the TPU-shaped packing of
the same O(N * neighbourhood) idea.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody.forces.p3m import _weight_fn

_ZBITS = 21


def ghost_slots(col_capacity: int, rc_slots: float | None = None) -> int:
    """z-ghost capacity per column end.

    With ``rc_slots`` (the z-extent of r_cut in slots at CAPACITY
    density, (r_cut/box) * CK): 2.2x that demand, lane-aligned — ghost
    need is the wrap margin's population, not a fraction of the column.
    Without it (legacy callers): CK/4.  Demand beyond gz is counted as
    overflow and heals via col_capacity (which scales the ghosts too).
    Oversizing is pure cost: stride = CK + 2 gz multiplies every VMEM
    column load in the kernel and every row of the plane build (moving
    CK/4 -> 2.2 rc_slots cut stride 20% at bench conditions)."""
    if rc_slots is not None:
        return max(128, -(-int(2.2 * rc_slots) // 128) * 128)
    return max(128, (col_capacity // 4 // 128) * 128)


def column_window(box: float, r_cut: float, col_capacity: int) -> int:
    """Auto z-window for a given column capacity: a 128-slot chunk's
    z-span + 2 r_cut of margin (in slots, conservatively scaled by the
    CAPACITY rather than the mean, with Poisson headroom) + ghost
    duplication near the z boundary + up to 127 slots of start
    alignment.  Correctness never depends on this — window misses are
    counted as overflow — it only sets the work/robustness trade."""
    rc_slots = (r_cut / box) * col_capacity
    # 256 chunk + 2 r_cut margins + 127 start-alignment slack (the
    # window start is the EXACT in-band slot aligned down to 128)
    span = 256.0 + 2.2 * rc_slots + 127.0
    window = max(384, -(-int(span) // 128) * 128)
    return min(window, col_capacity + 2 * ghost_slots(col_capacity, rc_slots))


def column_params(box: float, nmesh: int, n: int):
    """(r_s, r_cut, ncell, col_capacity, window) defaults for the column
    tier.  col_capacity covers the mean column + 6 sigma Poisson tail.
    Clustered states exceed it — the driver self-heal doubles it (the
    window scales along via :func:`column_window`)."""
    from nbody.forces.p3m import p3m_short_params

    r_s, r_cut, ncell, _ = p3m_short_params(box, nmesh, n)
    mean_col = n / ncell**2
    cap = int(mean_col + 6.0 * mean_col**0.5 + 8)
    col_capacity = -(-cap // 128) * 128
    return r_s, r_cut, ncell, col_capacity, column_window(
        box, r_cut, col_capacity
    )


def _col_z_order(col, z, ncol: int, box: float):
    """argsort by (column id, z) — z-ascending within each column.

    For small column counts this packs both into one int32 key; the
    packed key needs col < 2^(31 - _ZBITS) = 1024 or the shift wraps
    int32 and SILENTLY scrambles the bucketing (forces corrupted with
    overflow possibly 0), so larger grids take the two-pass stable-sort
    path instead (jnp.argsort is stable)."""
    zq = jnp.clip(
        (z * ((1 << _ZBITS) / box)).astype(jnp.int32),
        0, (1 << _ZBITS) - 1,
    )
    if ncol <= (2**31 - 1) >> _ZBITS:
        return jnp.argsort((col << _ZBITS) | zq)
    o1 = jnp.argsort(zq)
    return o1[jnp.argsort(col[o1])]


def _slot_sources(starts, counts, CK: int, gz: int, stride: int):
    """Per-slot source index into the SORTED particle rows plus the
    structural band masks, from the per-column starts/counts alone.

    Slot layout per column (ascending z): [0, gz) front ghosts (last
    reals, z - box), [gz, gz + cnt) reals, [gz + cnt, gz + cnt + gz)
    back ghosts (first reals, z + box), rest padding.  Pure broadcast
    arithmetic — the frozen-plan path recomputes it per eval rather
    than storing the masks."""
    cnt = jnp.minimum(counts, CK)[:, None]  # (ncol, 1)
    r = (jnp.arange(stride, dtype=jnp.int32) - gz)[None, :]  # (1, stride)
    is_front = r < 0
    is_interior = (r >= 0) & (r < cnt)
    g_b = r - cnt
    is_back = (r >= cnt) & (g_b < gz)
    src = jnp.where(
        is_front,
        starts[:, None] + cnt + r,  # r in [-gz, 0): last |r| reals
        jnp.where(is_back, starts[:, None] + g_b, starts[:, None] + r),
    )
    src_ok = (src >= starts[:, None]) & (src < starts[:, None] + cnt)
    return src, src_ok, is_front, is_interior, is_back


def _rows_to_buf(rows, src_ok, is_front, is_interior, is_back,
                 box: float, r_cut: float, zmargin: float):
    """(ncol, stride, 4) SoA buffer from gathered particle rows: ghost
    validity tested on the rows' CURRENT z, +-box z shifts applied,
    invalid slots parked at sentinels that keep each column's z
    ascending (front padding below all, everything else above all).
    Returns (buf, z_raw) — z_raw feeds the ghost-demand check."""
    z_pad = box + 3.0 * r_cut
    z_raw = rows[..., 2]
    valid = (
        is_interior
        | (is_front & src_ok & (z_raw >= box - zmargin))
        | (is_back & src_ok & (z_raw <= zmargin))
    )
    shift = jnp.where(is_front, -box, jnp.where(is_back, box, 0.0))
    default_z = jnp.where(is_front, -2.0 * box, z_pad)
    xy = jnp.where(valid[..., None], rows[..., 0:2], -8.0 * r_cut)
    zf_ = jnp.where(valid, z_raw + shift, default_z)
    mf_ = jnp.where(valid, rows[..., 3], 0.0)
    buf = jnp.concatenate(
        [xy, zf_[..., None], mf_[..., None]], axis=-1
    )  # (ncol, stride, 4)
    return buf, z_raw


def _plane_from_buf(buf, box: float, ncell: int, stride: int):
    """xy ghost ring (+-box baked into coordinates) + the (8, P2*stride)
    SoA plane layout the column kernels consume."""
    P = ncell + 2
    P2 = P * P
    dtype = buf.dtype
    grid4 = buf.reshape(ncell, ncell, stride, 4)
    padded = jnp.pad(grid4, ((1, 1), (1, 1), (0, 0), (0, 0)), mode="wrap")
    for ax in range(2):

        def shifted(sl, delta):
            lo_ = padded[(slice(None),) * ax + (sl,)]
            return lo_.at[..., ax].add(
                jnp.where(lo_[..., 3] > 0, delta, 0.0)
            )

        padded = padded.at[(slice(None),) * ax + (0,)].set(shifted(0, -box))
        padded = padded.at[(slice(None),) * ax + (P - 1,)].set(
            shifted(P - 1, box)
        )

    return jnp.concatenate(
        [
            jnp.moveaxis(padded.reshape(P2 * stride, 4), -1, 0),
            jnp.zeros((4, P2 * stride), dtype),
        ],
        axis=0,
    )


def build_column_plane(pos, mass, box: float, r_cut: float, ncell: int,
                       col_capacity: int, window: int, chunk: int = 256,
                       skin: float = 0.0, with_plan: bool = False):
    """Sort particles into z-ordered (x, y)-column buckets and assemble
    the ghost-padded SoA plane plus the per-chunk window tables.

    Returns (plane (8, P2 * stride), ws (ncol * 9 * maxch,) int32,
    nch (ncol,) int32, overflow_bucket, overflow_window, gidx (n,),
    counts (ncol,) int32 — stored reals per column, min(raw, CK), which
    the supercell PM deposit/gather kernels use to mask z-ghost slots):
    P2 = (ncell+2)^2 padded columns of stride = CK + 2 GZ slots each,
    every column ascending in z (front ghosts < reals < back ghosts <
    sentinel padding); ``ws`` holds each (i-column, neighbour, chunk)'s
    lane-aligned j-window start; ``gidx`` maps particles to their padded
    slot for the gather-back.

    ``skin`` widens the window thresholds and ghost margins exactly as
    :func:`freeze_column_plan` does (the extra sources beyond r_cut are
    cut off by the kernel's weight function, so the immediate eval is
    unchanged); with ``with_plan=True`` a :class:`ColumnPlan` is
    appended to the return tuple — the boundary tick's FRESH fused
    evaluation then emits the next step's interior plan from the SAME
    sort instead of paying freeze_column_plan's separate argsort +
    tables (round-4 rung-tier protocol).

    The (ncol, stride) buffer — interior AND both z-ghost bands — is
    assembled by ONE slot->source GATHER from the sorted particle rows
    (each slot's source index and +-box z shift are pure arithmetic on
    ``starts``/``counts``), never by scatters: scatter-set of n rows +
    two ghost scatters measured 2x slower than the fused gather at
    N=2^20 on the v5e, and column starts come from searchsorted on the
    (already sorted) column keys instead of a bincount scatter-add.
    """
    n = pos.shape[0]
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    stride = CK + 2 * gz
    W = -(-window // 128) * 128
    maxch = CK // chunk
    ncol = ncell * ncell
    P = ncell + 2
    P2 = P * P
    zmargin = 1.0001 * r_cut + 0.5 * skin

    posw = jnp.mod(pos, box).astype(dtype)
    massf = mass.astype(dtype)
    cx = jnp.clip((posw[:, 0] * (ncell / box)).astype(jnp.int32), 0, ncell - 1)
    cy = jnp.clip((posw[:, 1] * (ncell / box)).astype(jnp.int32), 0, ncell - 1)
    col = cx * ncell + cy
    order = _col_z_order(col, posw[:, 2], ncol, box)
    pos_s = posw[order]
    mass_s = massf[order]
    col_s = col[order]

    # col_s is ascending -> column starts/counts via two vectorized
    # binary searches (no bincount scatter-add)
    cols = jnp.arange(ncol, dtype=jnp.int32)
    starts = jnp.searchsorted(col_s, cols, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(col_s, cols, side="right").astype(jnp.int32)
    counts = ends - starts
    rank = jnp.arange(n, dtype=jnp.int32) - starts[col_s]
    ok = rank < CK
    overflow_b = jnp.sum(~ok).astype(jnp.int32)

    # ---- fused interior + z-ghost assembly (one gather) ----------------
    src, src_ok, is_front, is_interior, is_back = _slot_sources(
        starts, counts, CK, gz, stride
    )
    src_c = jnp.clip(src, 0, max(n - 1, 0))
    rows = jnp.concatenate([pos_s, mass_s[:, None]], axis=1)[src_c]
    buf, z_raw = _rows_to_buf(
        rows, src_ok, is_front, is_interior, is_back, box, r_cut, zmargin
    )

    # ghost-demand overflow: stored reals in the wrap margins beyond the
    # gz ghost capacity would be silently missing wrap partners — count
    # them (per-column fused reduction over the assembled interior) so
    # the self-heal grows the column capacity (gz scales with CK)
    nb = jnp.sum(is_interior & (z_raw <= zmargin), axis=1)
    nf = jnp.sum(is_interior & (z_raw >= box - zmargin), axis=1)
    ov_g = (
        jnp.sum(jnp.maximum(nb - gz, 0)) + jnp.sum(jnp.maximum(nf - gz, 0))
    ).astype(jnp.int32)

    # ---- window tables (before xy padding; ghost columns share their
    # source column's z content) ----------------------------------------
    zcols = buf[:, :, 2]  # (ncol, stride) ascending
    ch = jnp.arange(maxch, dtype=jnp.int32)
    nch = -(-jnp.minimum(counts, CK) // chunk)
    idx0 = starts[:, None] + ch[None, :] * chunk
    last = starts[:, None] + jnp.minimum(counts, CK)[:, None] - 1
    zmin = pos_s[jnp.clip(idx0, 0, max(n - 1, 0)), 2]
    zmax = pos_s[
        jnp.clip(jnp.minimum(idx0 + chunk - 1, last), 0, max(n - 1, 0)), 2
    ]
    chunk_ok = ch[None, :] < nch[:, None]

    # per-(column, neighbour, chunk) windows: exact per-slot counts on
    # the (already ascending) neighbour column z's, starts aligned down
    # to the kernel's 128-lane quantum.
    ic_x = cols // ncell
    ic_y = cols % ncell
    ws_list = []
    ov_w = jnp.int32(0)
    for o2 in range(9):
        dxo, dyo = o2 // 3 - 1, o2 % 3 - 1
        nc = (
            jnp.mod(ic_x + dxo, ncell) * ncell + jnp.mod(ic_y + dyo, ncell)
        )  # (ncol,)
        zj = zcols[nc]  # (ncol, stride) ascending
        qlo = (zmin - r_cut - skin)[:, :, None]    # (ncol, maxch, 1)
        qhi = (zmax + r_cut + skin)[:, :, None]
        # start = first slot inside the band, aligned DOWN to 128 (the
        # kernel's lane alignment): slots before lo_exact all have
        # z < qlo, so the low side never misses.  EXACT per-slot count —
        # a fence-block bound wasted up to 128 extra slots of W per
        # window (12.5% of the kernel's pair visits at bench geometry)
        lo_exact = jnp.sum(zj[:, None, :] < qlo, axis=-1)
        start = jnp.clip(
            (lo_exact // 128) * 128, 0, stride - W
        ).astype(jnp.int32)
        # hi side: count TRUE misses (exact per-slot comparison, not the
        # fence bound — the <=128/side fence slack read as phantom
        # overflow on overflow-free states and triggered needless
        # capacity-doubling re-jits, measured round 3)
        hi_exact = jnp.sum(zj[:, None, :] < qhi, axis=-1)
        ov_w = ov_w + jnp.sum(
            jnp.where(
                chunk_ok, jnp.maximum(hi_exact - (start + W), 0), 0
            )
        ).astype(jnp.int32)
        ws_list.append(start)
    ws = jnp.stack(ws_list, axis=1).reshape(ncol * 9 * maxch)  # (ncol,9,maxch)
    # ghost-capacity demand heals via col_capacity (gz scales with CK),
    # NOT via the window — report it on the bucket channel so the
    # driver's staged heal widens the right knob first
    overflow_b = overflow_b + ov_g

    plane = _plane_from_buf(buf, box, ncell, stride)

    # particle -> padded slot (for the gather-back)
    pc = (cx + 1) * P + (cy + 1)
    gidx_s = jnp.where(ok, pc[order] * stride + gz + rank, P2 * stride)
    gidx = jnp.zeros((n,), jnp.int32).at[order].set(gidx_s.astype(jnp.int32))
    base = (plane, ws, nch.astype(jnp.int32), overflow_b, ov_w, gidx,
            jnp.minimum(counts, CK).astype(jnp.int32))
    if not with_plan:
        return base
    ov = (
        jnp.minimum(overflow_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
    )
    plan = ColumnPlan(
        pos0=posw, src_g=order[src_c].astype(jnp.int32), starts=starts,
        counts=counts, ws=ws, nch=nch.astype(jnp.int32), gidx=gidx, ov=ov,
    )
    return base + (plan,)


# Largest column stride (slots) the column kernels' scoped VMEM
# affords: the i/j/out (8, stride) f32 blocks are capacity-
# proportional (measured compile OOM at stride 37872 with 1024-lane
# pair sub-slices: 16.58 MB scoped vs the 16 MB limit; 512-lane
# sub-slices halve the ~11 MB of pair temporaries, affording ~49k).
# Past it the CELLS tier's 3-D buckets carry the short range
# (p3m_acc falls back).
_STRIDE_MAX = 49152


def columns_stride_ok(box: float, r_cut: float, col_capacity: int) -> bool:
    """True when the column kernels compile at this capacity (clustered
    states heal col_capacity far past the uniform sizing; the
    (8, stride) VMEM blocks are the binding limit — `_STRIDE_MAX`)."""
    CK = -(-int(col_capacity) // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    return CK + 2 * gz <= _STRIDE_MAX


def _smem_table(t, ngroup: int, maxch: int):
    """Pack a flat per-(group, chunk) int32 scalar table into
    (ngroup * 8, cols) rows for an (8, cols)-blocked SMEM input
    (cols = ceil(maxch / 8) padded to 128 — Pallas TPU block shapes
    must be (8k, 128m)).  Entry k of group g lives at row
    g * 8 + k // cols, lane k % cols.

    This replaces scalar-prefetching the whole table: the prefetched
    operand must fit SMEM (1 MB), and clustered states heal capacities
    to maxch ~ 128 chunks/column, putting ncol x 9 x maxch words past
    the limit (measured compile OOM, round-4 clustered bench row).  The
    blocked form is O(1) in the healed capacity: one (8, cols) tile
    per grid step."""
    cols = ((maxch + 7) // 8 + 127) // 128 * 128
    pad = jnp.zeros((ngroup, 8 * cols), jnp.int32)
    pad = pad.at[:, :maxch].set(t.reshape(ngroup, maxch))
    return pad.reshape(ngroup * 8, cols)


def _smem_lookup(ref, k):
    """Entry k of this group's (8, cols) SMEM block (see _smem_table)."""
    cols = ref.shape[1]
    return ref[k // cols, k % cols]


_WMAX = 512  # lanes per pair sub-block: bounds the kernel's scoped
# VMEM at (chunk x _WMAX) pair temporaries (~10-12 live values of
# chunk x _WMAX f32 inside one sub-slice, measured from Mosaic's
# scoped-vmem accounting) — clustered states can heal the z-window to
# W ~ 20k lanes, and a single (chunk, W) block then needs ~60 MB of
# scoped VMEM (measured OOM, round-4 clustered bench row) regardless
# of tier; 2048 exceeded the 16 MB limit by 10% and 1024 left no room
# for the capacity-proportional (8, stride) column blocks at
# clustered-healed strides (~6 MB of temps at 512 affords strides to
# `_STRIDE_MAX`).  The sub-slice loop is lane-count-neutral: the VPU
# work is identical, only the fori_loop trip count grows.


def _pair_accum(xi, yi, zi, j_ref, start, *, W, wfn, eps2, r_s, r_cut):
    """(chunk,)-wise short-range force sums of one i chunk against the
    j column's z-window [start, start + W), evaluated in <= _WMAX-lane
    sub-slices.  For W <= _WMAX (every non-pathological config) this
    emits exactly the single-block code the kernels always had."""

    def one(joff, width):
        j_blk = j_ref[:, pl.ds(joff, width)]
        dx = j_blk[0][None, :] - xi
        dy = j_blk[1][None, :] - yi
        dz = j_blk[2][None, :] - zi
        r2 = dx * dx + dy * dy + dz * dz
        w = j_blk[3][None, :] * wfn(r2, eps2, r_s, r_cut)
        return (
            jnp.sum(w * dx, axis=1),
            jnp.sum(w * dy, axis=1),
            jnp.sum(w * dz, axis=1),
        )

    if W <= _WMAX:
        return one(start, W)
    nfull, rem = divmod(W, _WMAX)

    def sub(t, acc):
        a = one(start + t * _WMAX, _WMAX)
        return (acc[0] + a[0], acc[1] + a[1], acc[2] + a[2])

    zero = jnp.zeros(xi.shape[:1], xi.dtype)
    acc = jax.lax.fori_loop(0, nfull, sub, (zero, zero, zero))
    if rem:
        a = one(start + nfull * _WMAX, rem)
        acc = (acc[0] + a[0], acc[1] + a[1], acc[2] + a[2])
    return acc


def _column_kernel(nch_ref, ws_ref, i_ref, j_ref, out_ref, *, ncell,
                   stride, W, maxch, gz, chunk, eps2, r_s, r_cut, split,
                   softening):
    """One padded i-column vs one of its 9 (ox, oy) neighbour columns.

    i_ref/j_ref/out_ref: (8, stride) SoA columns (rows x, y, z, mass).
    The chunk loop runs only over the column's OCCUPIED 128-slot chunks
    (dynamic trip count from scalar prefetch) and each chunk reads only
    its precomputed z-window of the j column.  ws_ref is this (column,
    neighbour)'s (8, cols) SMEM block of window starts (see
    :func:`_smem_table` for why these are not scalar prefetch)."""
    ic = pl.program_id(0)
    o2 = pl.program_id(1)

    @pl.when(o2 == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wfn = _weight_fn(split, softening)
    nch = nch_ref[ic]

    def body(k, carry):
        start = pl.multiple_of(_smem_lookup(ws_ref, k), 128)
        i_blk = i_ref[:, pl.ds(gz + k * chunk, chunk)]
        ax, ay, az = _pair_accum(
            i_blk[0][:, None], i_blk[1][:, None], i_blk[2][:, None],
            j_ref, start, W=W, wfn=wfn, eps2=eps2, r_s=r_s, r_cut=r_cut,
        )
        zero = jnp.zeros_like(ax)
        upd = jnp.stack([ax, ay, az, zero, zero, zero, zero, zero])
        sl = pl.ds(gz + k * chunk, chunk)
        out_ref[:, sl] = out_ref[:, sl] + upd
        return carry

    jax.lax.fori_loop(0, nch, body, 0)


def _run_column_kernel(plane, ws, nch, *, ncell, stride, W, maxch, gz,
                       chunk, eps, r_s, r_cut, split, softening,
                       interpret):
    """pallas_call launch for :func:`_column_kernel` (shared by the
    fresh and frozen-plan paths)."""
    P = ncell + 2

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

    ws_tab = _smem_table(ws, ncell * ncell * 9, maxch)
    cols = ws_tab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncell * ncell, 9),
        in_specs=[
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic * 9 + o2, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, stride), j_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _column_kernel,
            ncell=ncell, stride=stride, W=W, maxch=maxch, gz=gz,
            chunk=chunk,
            eps2=float(eps) ** 2, r_s=float(r_s), r_cut=float(r_cut),
            split=split, softening=softening,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(nch, ws_tab, plane, plane)


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ncell", "col_capacity",
        "window", "interpret", "split", "softening", "chunk",
    ),
)
def p3m_short_columns_pallas(
    pos,
    mass,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    *,
    ncell: int,
    col_capacity: int,
    window: int,
    interpret: bool | None = None,
    split: str = "gaussian",
    softening: str = "plummer",
    chunk: int = 256,
):
    """Short-range P3M force via the column-packed Pallas kernel.

    Same physics/geometry as :func:`nbody.forces.p3m.
    p3m_short_cells_pallas` with ~4x less slot-pair work (see module
    docstring).  Returns (acc (N, 3), overflow) with overflow == 0 iff
    no force was dropped; nonzero values are field-encoded
    (bucket+ghost spills * 65536 + z-window misses) so the driver's
    staged self-heal can tell which knob to grow — col_capacity for the
    high field, column_window for the low.
    """
    if box / ncell < r_cut - 1e-9:
        raise ValueError(f"column size {box / ncell:.3f} < r_cut {r_cut:.3f}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = pos.shape[0]
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    P = ncell + 2
    P2 = P * P

    plane, ws, nch, ov_b, ov_w, gidx, _cnt = build_column_plane(
        pos, mass, box, float(r_cut), ncell, CK, W, chunk=chunk
    )

    out = _run_column_kernel(
        plane, ws, nch, ncell=ncell, stride=stride, W=W, maxch=maxch,
        gz=gz, chunk=chunk, eps=eps, r_s=r_s, r_cut=r_cut, split=split,
        softening=softening, interpret=interpret,
    )

    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), dtype)],
        axis=0,
    )
    acc = acc_buckets[gidx]
    # single-int overflow, field-encoded so the driver heals the right
    # knob: bucket/ghost spills (heal = col_capacity) ride the high
    # bits, z-window misses (heal = column_window) the low 16.  Zero
    # still means clean, and max() over scan steps prefers any
    # bucket-overflow step over window-only ones — the heal order the
    # driver wants.
    ov = jnp.minimum(ov_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
    return G * acc.astype(pos.dtype), ov


# ---------------------------------------------------------------------------
# Frozen column plans (skin reuse across subcycles)
# ---------------------------------------------------------------------------


class ColumnPlan(NamedTuple):
    """Frozen column bucketing: everything position-INDEPENDENT about a
    column plane (sort order composed into per-slot gather indices,
    bucket starts/counts, skin-widened window tables, slot map), valid
    for any later positions within ``skin/2`` min-image drift of
    ``pos0``.  The expensive argsort and the window-table reductions
    are paid once here; re-assembling the plane for drifted positions
    is one row gather + masks (:func:`p3m_short_columns_frozen`).

    Correctness under drift <= skin/2 per particle (delta):
      * xy bucketing: a pair within r_cut at eval time has frozen xy
        separation <= r_cut + 2 delta <= column side (checked at freeze),
        so the frozen 3x3 column walk still covers it.
      * z windows: thresholds are widened by skin = 2 delta at freeze
        (qlo - skin, qhi + skin) and counted on the frozen (sorted) z,
        so every slot whose CURRENT z can fall in a chunk's band is
        inside that chunk's frozen window.
      * z ghosts: band membership is frozen, so the freeze-time ghost
        demand is counted with a + skin/2 widened wrap margin; the
        assembly-time validity test stays on current z.
    ``ov`` is the freeze-time field-encoded overflow word (the frozen
    evals return it verbatim — their demand is bounded by it)."""

    pos0: jax.Array      # (n, 3) wrapped positions at freeze
    src_g: jax.Array     # (ncol, stride) i32: slot -> ORIGINAL particle row
    starts: jax.Array    # (ncol,) i32
    counts: jax.Array    # (ncol,) i32 (raw, may exceed CK)
    ws: jax.Array        # (ncol * 9 * maxch,) i32 frozen window starts
    nch: jax.Array       # (ncol,) i32
    gidx: jax.Array      # (n,) i32 particle -> padded slot
    ov: jax.Array        # () i32 field-encoded freeze-time overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "r_cut", "ncell", "col_capacity", "window", "chunk", "skin",
    ),
)
def freeze_column_plan(pos, mass, box: float, r_cut: float, ncell: int,
                       col_capacity: int, window: int, chunk: int = 256,
                       skin: float = 0.0):
    """Sort + bucket + window tables at the CURRENT positions, packaged
    for reuse at nearby positions (see :class:`ColumnPlan`).  ``skin``
    is the total drift budget: the plan stays valid while every
    particle is within skin/2 (min-image) of its freeze position —
    callers check with :func:`plan_drift_ok` and refreeze on demand."""
    if box / ncell < r_cut - 1e-9:
        raise ValueError(f"column size {box / ncell:.3f} < r_cut {r_cut:.3f}")
    if skin > 0.0 and (box / ncell) < r_cut + 2.0 * skin:
        raise ValueError(
            f"column side {box / ncell:.3f} < r_cut + 2 skin "
            f"{r_cut + 2.0 * skin:.3f} — frozen xy bucketing would miss "
            f"drifted pairs"
        )
    n = pos.shape[0]
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    ncol = ncell * ncell
    P = ncell + 2
    P2 = P * P
    # widened margins: tables/demand must cover anything that can drift
    # INTO a band/window while the plan is frozen
    zmargin_t = 1.0001 * r_cut + 0.5 * skin

    posw = jnp.mod(pos, box).astype(dtype)
    massf = mass.astype(dtype)
    cx = jnp.clip((posw[:, 0] * (ncell / box)).astype(jnp.int32), 0, ncell - 1)
    cy = jnp.clip((posw[:, 1] * (ncell / box)).astype(jnp.int32), 0, ncell - 1)
    col = cx * ncell + cy
    order = _col_z_order(col, posw[:, 2], ncol, box)
    pos_s = posw[order]
    mass_s = massf[order]
    col_s = col[order]

    cols = jnp.arange(ncol, dtype=jnp.int32)
    starts = jnp.searchsorted(col_s, cols, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(col_s, cols, side="right").astype(jnp.int32)
    counts = ends - starts
    rank = jnp.arange(n, dtype=jnp.int32) - starts[col_s]
    ok = rank < CK
    ov_b = jnp.sum(~ok).astype(jnp.int32)

    src, src_ok, is_front, is_interior, is_back = _slot_sources(
        starts, counts, CK, gz, stride
    )
    src_c = jnp.clip(src, 0, max(n - 1, 0))
    src_g = order[src_c].astype(jnp.int32)
    rows = jnp.concatenate([pos_s, mass_s[:, None]], axis=1)[src_c]
    # TABLE buffer with the widened wrap margin: slots that can become
    # valid ghosts within skin/2 drift must be counted inside windows
    buf_t, z_raw = _rows_to_buf(
        rows, src_ok, is_front, is_interior, is_back, box, r_cut, zmargin_t
    )

    # ghost demand with the widened margin (a real that can drift into
    # the wrap band must already sit within the gz-slot frozen band)
    nb = jnp.sum(is_interior & (z_raw <= zmargin_t), axis=1)
    nf = jnp.sum(is_interior & (z_raw >= box - zmargin_t), axis=1)
    ov_b = ov_b + (
        jnp.sum(jnp.maximum(nb - gz, 0)) + jnp.sum(jnp.maximum(nf - gz, 0))
    ).astype(jnp.int32)

    # frozen window tables: skin-widened thresholds on the frozen z
    zcols = buf_t[:, :, 2]
    ch = jnp.arange(maxch, dtype=jnp.int32)
    nch = -(-jnp.minimum(counts, CK) // chunk)
    idx0 = starts[:, None] + ch[None, :] * chunk
    last = starts[:, None] + jnp.minimum(counts, CK)[:, None] - 1
    zmin = pos_s[jnp.clip(idx0, 0, max(n - 1, 0)), 2]
    zmax = pos_s[
        jnp.clip(jnp.minimum(idx0 + chunk - 1, last), 0, max(n - 1, 0)), 2
    ]
    chunk_ok = ch[None, :] < nch[:, None]
    ic_x = cols // ncell
    ic_y = cols % ncell
    ws_list = []
    ov_w = jnp.int32(0)
    for o2 in range(9):
        dxo, dyo = o2 // 3 - 1, o2 % 3 - 1
        nc = (
            jnp.mod(ic_x + dxo, ncell) * ncell + jnp.mod(ic_y + dyo, ncell)
        )
        zj = zcols[nc]
        qlo = (zmin - r_cut - skin)[:, :, None]
        qhi = (zmax + r_cut + skin)[:, :, None]
        lo_exact = jnp.sum(zj[:, None, :] < qlo, axis=-1)
        start = jnp.clip(
            (lo_exact // 128) * 128, 0, stride - W
        ).astype(jnp.int32)
        hi_exact = jnp.sum(zj[:, None, :] < qhi, axis=-1)
        ov_w = ov_w + jnp.sum(
            jnp.where(
                chunk_ok, jnp.maximum(hi_exact - (start + W), 0), 0
            )
        ).astype(jnp.int32)
        ws_list.append(start)
    ws = jnp.stack(ws_list, axis=1).reshape(ncol * 9 * maxch)

    pc = (cx + 1) * P + (cy + 1)
    gidx_s = jnp.where(ok, pc[order] * stride + gz + rank, P2 * stride)
    gidx = jnp.zeros((n,), jnp.int32).at[order].set(gidx_s.astype(jnp.int32))
    ov = jnp.minimum(ov_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
    return ColumnPlan(
        pos0=posw, src_g=src_g, starts=starts, counts=counts, ws=ws,
        nch=nch.astype(jnp.int32), gidx=gidx, ov=ov,
    )


def plan_drift_ok(pos, plan: ColumnPlan, box: float, skin: float):
    """True while every particle is within skin/2 (min-image) of its
    freeze position — the validity predicate for a :class:`ColumnPlan`."""
    d = jnp.mod(pos, box).astype(plan.pos0.dtype) - plan.pos0
    d = d - box * jnp.round(d * (1.0 / box))
    return jnp.max(jnp.sum(d * d, axis=1)) <= (0.5 * skin) ** 2


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ncell", "col_capacity",
        "window", "interpret", "split", "softening", "chunk",
    ),
)
def p3m_short_columns_frozen(
    pos,
    mass,
    plan: ColumnPlan,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    *,
    ncell: int,
    col_capacity: int,
    window: int,
    interpret: bool | None = None,
    split: str = "gaussian",
    softening: str = "plummer",
    chunk: int = 256,
):
    """Short-range column force on a FROZEN plan: no sort, no window
    tables — one (ncol*stride)-row gather by ``plan.src_g`` assembles
    the plane at the CURRENT positions, the frozen (skin-widened)
    windows drive the same kernel, and ``plan.gidx`` maps the result
    back.  Physics identical to :func:`p3m_short_columns_pallas` while
    the caller keeps drift <= skin/2 (:func:`plan_drift_ok`).

    Reference role: CONCEPT refreshes its C tiling every kick; the skin
    margin is the classic MD neighbour-list trick applied to the column
    packing so the TPU pays the argsort once per drift budget, not once
    per subcycle."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    P2 = (ncell + 2) ** 2
    zmargin = 1.0001 * r_cut

    # unwrap current positions relative to the FREEZE positions: a
    # particle that drifted across the periodic wrap jumps by ~box in
    # raw coordinates, which would shatter the frozen slot ordering —
    # min-image against pos0 keeps every stored coordinate within
    # skin/2 of its frozen value (slightly outside [0, box) is fine:
    # ghost tests and the kernel work on raw differences)
    posw = jnp.mod(pos, box).astype(dtype)
    d = posw - plan.pos0
    d = d - box * jnp.round(d * (1.0 / box))
    rows = jnp.concatenate(
        [plan.pos0 + d, mass.astype(dtype)[:, None]], axis=1
    )[plan.src_g]
    _, src_ok, is_front, is_interior, is_back = _slot_sources(
        plan.starts, plan.counts, CK, gz, stride
    )
    buf, _ = _rows_to_buf(
        rows, src_ok, is_front, is_interior, is_back, box, r_cut, zmargin
    )
    plane = _plane_from_buf(buf, box, ncell, stride)

    out = _run_column_kernel(
        plane, plan.ws, plan.nch, ncell=ncell, stride=stride, W=W,
        maxch=maxch, gz=gz, chunk=chunk, eps=eps, r_s=r_s, r_cut=r_cut,
        split=split, softening=softening, interpret=interpret,
    )
    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), dtype)],
        axis=0,
    )
    acc = acc_buckets[plan.gidx]
    return G * acc.astype(pos.dtype), plan.ov


def _column_kernel_masked(nch_ref, ws_ref, cht_ref, i_ref, j_ref, out_ref,
                          *, ncell, stride, W, maxch, gz, chunk, eps2,
                          r_s, r_cut, split, softening):
    """:func:`_column_kernel` restricted to a column's ACTIVE chunks:
    the chunk loop's trip count is nch_ref (active chunks only) and the
    k-th visited chunk's index comes from the chunk table cht_ref —
    kernel work scales with the number of 256-slot chunks containing an
    active target instead of the whole column.  Forces accumulate only
    at visited chunks; untouched slots stay 0 (their particles' kick
    factors are 0 at masked ticks, so the zeros are never consumed).
    ws_ref/cht_ref are per-(column, neighbour) / per-column (8, cols)
    SMEM blocks, not scalar prefetch (see :func:`_smem_table`)."""
    ic = pl.program_id(0)
    o2 = pl.program_id(1)

    @pl.when(o2 == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wfn = _weight_fn(split, softening)
    nch = nch_ref[ic]

    def body(k, carry):
        kk = _smem_lookup(cht_ref, k)
        start = pl.multiple_of(_smem_lookup(ws_ref, kk), 128)
        sl = pl.ds(gz + kk * chunk, chunk)
        i_blk = i_ref[:, sl]
        ax, ay, az = _pair_accum(
            i_blk[0][:, None], i_blk[1][:, None], i_blk[2][:, None],
            j_ref, start, W=W, wfn=wfn, eps2=eps2, r_s=r_s, r_cut=r_cut,
        )
        zero = jnp.zeros_like(ax)
        upd = jnp.stack([ax, ay, az, zero, zero, zero, zero, zero])
        out_ref[:, sl] = out_ref[:, sl] + upd
        return carry

    jax.lax.fori_loop(0, nch, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ncell", "col_capacity",
        "window", "interpret", "split", "softening", "chunk",
        "return_buckets",
    ),
)
def p3m_short_columns_frozen_masked(
    pos,
    mass,
    act,
    plan: ColumnPlan,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    *,
    ncell: int,
    col_capacity: int,
    window: int,
    interpret: bool | None = None,
    split: str = "gaussian",
    softening: str = "plummer",
    chunk: int = 256,
    return_buckets: bool = False,
):
    """Short-range column force ON the ``act`` subset FROM all, on a
    FROZEN plan — the rung tier's interior masked tick without plane
    rebuilds (VERDICT round-3 item 1: the two scatter-based cell-plane
    builds cost ~200 ms/tick at N=2^20; here the plane is one row
    gather and kernel work scales with the ACTIVE 256-slot chunks).

    Per tick: assemble the frozen plane at current positions (as
    :func:`p3m_short_columns_frozen`), reduce the gathered activity
    channel to a per-(column, chunk) presence table, and run
    :func:`_column_kernel_masked` over active chunks only.  Deep-rung
    particles cluster spatially (halos), so active chunks are few in
    production even when the active fraction isn't.  Non-active rows
    within a visited chunk come back with their (correct) force — the
    integrator's per-rung kick factors zero them.

    Returns (acc (N, 3), plan.ov) — demand is bounded by the
    freeze-time overflow word, one channel, healed by the same
    col_capacity/window knobs."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    ncol = ncell * ncell
    P = ncell + 2
    P2 = P * P
    zmargin = 1.0001 * r_cut

    posw = jnp.mod(pos, box).astype(dtype)
    d = posw - plan.pos0
    d = d - box * jnp.round(d * (1.0 / box))
    rows = jnp.concatenate(
        [plan.pos0 + d, mass.astype(dtype)[:, None]], axis=1
    )[plan.src_g]
    _, src_ok, is_front, is_interior, is_back = _slot_sources(
        plan.starts, plan.counts, CK, gz, stride
    )
    buf, _ = _rows_to_buf(
        rows, src_ok, is_front, is_interior, is_back, box, r_cut, zmargin
    )
    plane = _plane_from_buf(buf, box, ncell, stride)

    # per-(column, chunk) activity: gather the target mask into slot
    # layout, reduce interior chunks (ghost slots are j-sources only)
    act_slot = act[plan.src_g] & is_interior  # (ncol, stride)
    act_chunk = jnp.any(
        act_slot[:, gz : gz + CK].reshape(ncol, maxch, chunk), axis=-1
    )
    nch_act = jnp.sum(act_chunk, axis=1).astype(jnp.int32)
    iota = jnp.arange(maxch, dtype=jnp.int32)[None, :]
    cht = jnp.sort(
        jnp.where(act_chunk, iota, maxch), axis=1
    ).reshape(ncol * maxch).astype(jnp.int32)

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

    ws_tab = _smem_table(plan.ws, ncol * 9, maxch)
    cht_tab = _smem_table(cht, ncol, maxch)
    cols = ws_tab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncol, 9),
        in_specs=[
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic * 9 + o2, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, stride), j_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _column_kernel_masked,
            ncell=ncell, stride=stride, W=W, maxch=maxch, gz=gz,
            chunk=chunk,
            eps2=float(eps) ** 2, r_s=float(r_s), r_cut=float(r_cut),
            split=split, softening=softening,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(nch_act, ws_tab, cht_tab, plane, plane)

    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), dtype)],
        axis=0,
    )
    if return_buckets:
        # slot-table return: the caller gathers only its ACTIVE rows
        # (acc_buckets[plan.gidx[idx_act]]) — the rung tier's compact
        # readback (the full-N gather costs ~12 ms/tick at N=2^20 for
        # kicks that are zero on ~95% of rows)
        return G * acc_buckets.astype(pos.dtype), plan.ov
    acc = acc_buckets[plan.gidx]
    return G * acc.astype(pos.dtype), plan.ov


# ---------------------------------------------------------------------------
# Slab-local (multi-chip) column tier
# ---------------------------------------------------------------------------


def build_local_column_plane(pos_l, mass_l, *, box: float, r_cut: float,
                             ncell: int, n_dev: int, col_capacity: int,
                             window: int, axis_name: str, chunk: int = 256):
    """Local-slab sibling of :func:`build_column_plane` for the domain
    decomposition (`nbody.distributed.domain`): columns are keyed by
    (x, y), the slab axis is x, so a device owns nxl = ncell/n_dev
    x-rows of full-height z columns.  z periodicity (ghost copies at
    each column end) and y periodicity (local wrap ring) are untouched;
    the two x-halo rows arrive from the neighbours via ``ppermute`` —
    whole y-padded rows, so corner columns come along for free — with
    the +-box x shift baked in at the ring wrap.

    Window tables are computed AFTER halo assembly (the x-neighbour
    fences live in the received halo rows).  Returns (plane
    (8, (nxl+2) * P * stride), ws ((nxl*ncell) * 9 * maxch,), nch,
    overflow_bucket, overflow_window, gidx (C,), counts (ncol_l,)) —
    overflow_bucket counts resident particles beyond CK plus z-ghost
    demand beyond gz (heal: col_capacity), overflow_window the exact
    window misses (heal: window); ``gidx`` maps resident rows to their
    padded slot (others to the sentinel row); ``counts`` is the stored
    reals per local column, min(raw, CK) — what the slab supercell
    deposit uses to mask z-ghost slots.
    """
    d = jax.lax.axis_index(axis_name)
    C = pos_l.shape[0]
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    if CK % chunk:
        chunk = 128
    maxch = CK // chunk
    nxl = ncell // n_dev
    ncol_l = nxl * ncell
    P = ncell + 2
    zmargin = 1.0001 * r_cut

    posw = jnp.mod(pos_l, box).astype(dtype)
    massf = mass_l.astype(dtype)
    valid = massf > 0
    cx = jnp.clip((posw[:, 0] * (ncell / box)).astype(jnp.int32),
                  0, ncell - 1)
    cy = jnp.clip((posw[:, 1] * (ncell / box)).astype(jnp.int32),
                  0, ncell - 1)
    cxl = cx - d * nxl
    resident = valid & (cxl >= 0) & (cxl < nxl)
    col = jnp.where(resident, cxl * ncell + cy, ncol_l)
    order = _col_z_order(col, posw[:, 2], ncol_l + 1, box)
    pos_s = posw[order]
    mass_s = massf[order]
    col_s = col[order]

    # col_s ascending (non-resident rows sort to the sentinel column at
    # the end) -> starts/counts via binary search, no bincount scatter
    cols = jnp.arange(ncol_l, dtype=jnp.int32)
    starts = jnp.searchsorted(col_s, cols, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(col_s, cols, side="right").astype(jnp.int32)
    counts = ends - starts
    rank = jnp.arange(C, dtype=jnp.int32) - starts[
        jnp.clip(col_s, 0, ncol_l - 1)
    ]
    ok = (rank < CK) & (col_s < ncol_l)
    overflow_b = (jnp.sum(resident) - jnp.sum(ok)).astype(jnp.int32)

    # ---- fused interior + z-ghost assembly (one gather; same slot
    # layout as build_column_plane — z is not decomposed) -----------------
    z_pad = box + 3.0 * r_cut
    cnt = jnp.minimum(counts, CK)[:, None]
    r = (jnp.arange(stride, dtype=jnp.int32) - gz)[None, :]
    is_front = r < 0
    is_interior = (r >= 0) & (r < cnt)
    g_b = r - cnt
    is_back = (r >= cnt) & (g_b < gz)
    src = jnp.where(
        is_front,
        starts[:, None] + cnt + r,
        jnp.where(is_back, starts[:, None] + g_b, starts[:, None] + r),
    )
    src_ok = (src >= starts[:, None]) & (src < starts[:, None] + cnt)
    src_c = jnp.clip(src, 0, max(C - 1, 0))
    rows = jnp.concatenate([pos_s, mass_s[:, None]], axis=1)[src_c]
    z_raw = rows[..., 2]
    valid_slot = (
        is_interior
        | (is_front & src_ok & (z_raw >= box - zmargin))
        | (is_back & src_ok & (z_raw <= zmargin))
    )
    shift = jnp.where(is_front, -box, jnp.where(is_back, box, 0.0))
    default_z = jnp.where(is_front, -2.0 * box, z_pad)
    xy = jnp.where(valid_slot[..., None], rows[..., 0:2], -8.0 * r_cut)
    zf_ = jnp.where(valid_slot, z_raw + shift, default_z)
    mf_ = jnp.where(valid_slot, rows[..., 3], 0.0)
    buf = jnp.concatenate(
        [xy, zf_[..., None], mf_[..., None]], axis=-1
    )  # (ncol_l, stride, 4)

    nb = jnp.sum(is_interior & (z_raw <= zmargin), axis=1)
    nf = jnp.sum(is_interior & (z_raw >= box - zmargin), axis=1)
    ov_g = (
        jnp.sum(jnp.maximum(nb - gz, 0)) + jnp.sum(jnp.maximum(nf - gz, 0))
    ).astype(jnp.int32)
    defaults = jnp.asarray([-8.0 * r_cut, -8.0 * r_cut, z_pad, 0.0], dtype)

    # ---- y ghost ring (local wrap) + x halos (ppermute) -----------------
    grid4 = buf.reshape(nxl, ncell, stride, 4)
    padded = jnp.pad(grid4, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="wrap")

    def shifted_y(sl, delta):
        lo_ = padded[:, sl]
        return lo_.at[..., 1].add(jnp.where(lo_[..., 3] > 0, delta, 0.0))

    padded = padded.at[:, 0].set(shifted_y(0, -box))
    padded = padded.at[:, P - 1].set(shifted_y(P - 1, box))

    # (nxl, P, stride, 4) -> zero-bounded (nxl+2) rows, then fill halos
    zero_row = jnp.broadcast_to(defaults, (1, P, stride, 4))
    p5 = jnp.concatenate([zero_row, padded, zero_row], axis=0)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(p5[nxl], axis_name, fwd)
    from_right = jax.lax.ppermute(p5[1], axis_name, bwd)
    shift_l = jnp.where(d == 0, -box, 0.0).astype(dtype)
    shift_r = jnp.where(d == n_dev - 1, box, 0.0).astype(dtype)
    from_left = from_left.at[..., 0].add(
        jnp.where(from_left[..., 3] > 0, shift_l, 0.0)
    )
    from_right = from_right.at[..., 0].add(
        jnp.where(from_right[..., 3] > 0, shift_r, 0.0)
    )
    p5 = p5.at[0].set(from_left).at[nxl + 1].set(from_right)

    plane4 = p5.reshape((nxl + 2) * P * stride, 4)
    plane = jnp.concatenate(
        [
            jnp.moveaxis(plane4, -1, 0),
            jnp.zeros((4, (nxl + 2) * P * stride), dtype),
        ],
        axis=0,
    )

    # ---- window tables (AFTER halo assembly: x-neighbour fences live in
    # the received rows) ---------------------------------------------------
    zcols_pad = plane4[:, 2].reshape((nxl + 2) * P, stride)
    fence = zcols_pad[:, ::128]  # ((nxl+2)*P, stride/128) ascending
    ch = jnp.arange(maxch, dtype=jnp.int32)
    nch = -(-jnp.minimum(counts, CK) // chunk)
    idx0 = starts[:, None] + ch[None, :] * chunk
    last = starts[:, None] + jnp.minimum(counts, CK)[:, None] - 1
    nmax = max(C - 1, 0)
    zmin = pos_s[jnp.clip(idx0, 0, nmax), 2]
    zmax = pos_s[jnp.clip(jnp.minimum(idx0 + chunk - 1, last), 0, nmax), 2]
    chunk_ok = ch[None, :] < nch[:, None]

    ic_x = cols // ncell  # local x row
    ic_y = cols % ncell
    ws_list = []
    ov_w = jnp.int32(0)
    for o2 in range(9):
        dxo, dyo = o2 // 3 - 1, o2 % 3 - 1
        nc = (ic_x + 1 + dxo) * P + (ic_y + 1 + dyo)  # padded index
        fj = fence[nc]
        qlo = (zmin - r_cut)[:, :, None]
        qhi = (zmax + r_cut)[:, :, None]
        cnt_lo = jnp.sum(fj[:, None, :] <= qlo, axis=-1)
        start = jnp.clip(
            (jnp.maximum(cnt_lo - 1, 0)) * 128, 0, stride - W
        ).astype(jnp.int32)
        hi_exact = jnp.sum(zcols_pad[nc][:, None, :] < qhi, axis=-1)
        ov_w = ov_w + jnp.sum(
            jnp.where(chunk_ok, jnp.maximum(hi_exact - (start + W), 0), 0)
        ).astype(jnp.int32)
        ws_list.append(start)
    ws = jnp.stack(ws_list, axis=1).reshape(ncol_l * 9 * maxch)
    overflow_b = overflow_b + ov_g

    # particle -> padded slot for the gather-back
    pc = (jnp.clip(cxl, 0, nxl - 1) + 1) * P + (cy + 1)
    sentinel = (nxl + 2) * P * stride
    gidx_s = jnp.where(ok, pc[order] * stride + gz + rank, sentinel)
    gidx = (
        jnp.full((C,), sentinel, jnp.int32)
        .at[order]
        .set(gidx_s.astype(jnp.int32))
    )
    return (plane, ws, nch.astype(jnp.int32), overflow_b, ov_w, gidx,
            jnp.minimum(counts, CK).astype(jnp.int32))


def p3m_short_columns_local(pos_l, mass_l, *, box: float, eps: float,
                            r_s: float, r_cut: float, G: float = 1.0,
                            ncell: int, n_dev: int, col_capacity: int,
                            window: int, axis_name: str,
                            split: str = "gaussian",
                            softening: str = "plummer",
                            interpret: bool | None = None,
                            chunk: int = 256):
    """Inside-shard_map column-tier short-range force on a local slab.

    Same kernel as :func:`p3m_short_columns_pallas` over the local
    ghost-padded plane from :func:`build_local_column_plane`.  Returns
    (acc (C, 3), overflow) with the same field-encoded overflow word
    (bucket/ghost * 65536 + window misses), NOT psum'd — the caller
    reduces.
    """
    if box / ncell < r_cut - 1e-9:
        raise ValueError(f"column size {box / ncell:.3f} < r_cut {r_cut:.3f}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    nxl = ncell // n_dev
    P = ncell + 2

    plane, ws, nch, ov_b, ov_w, gidx, _cnt = build_local_column_plane(
        pos_l, mass_l, box=box, r_cut=float(r_cut), ncell=ncell,
        n_dev=n_dev, col_capacity=CK, window=W, axis_name=axis_name,
        chunk=chunk,
    )

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

    ws_tab = _smem_table(ws, nxl * ncell * 9, maxch)
    cols = ws_tab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nxl * ncell, 9),
        in_specs=[
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic * 9 + o2, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, stride), j_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _column_kernel,
            ncell=ncell, stride=stride, W=W, maxch=maxch, gz=gz,
            chunk=chunk,
            eps2=float(eps) ** 2, r_s=float(r_s), r_cut=float(r_cut),
            split=split, softening=softening,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(nch, ws_tab, plane, plane)

    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, -1).T, jnp.zeros((1, 3), dtype)], axis=0
    )
    acc = acc_buckets[gidx]
    ov = jnp.minimum(ov_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
    return G * acc.astype(pos_l.dtype), ov


# ---------------------------------------------------------------------------
# Slab-local FROZEN column plans (domain rung tier)
# ---------------------------------------------------------------------------


class LocalColumnPlan(NamedTuple):
    """Slab-resident sibling of :class:`ColumnPlan` (round-4 VERDICT
    item 5): everything position-independent about a LOCAL column plane
    from :func:`freeze_local_column_plan`, valid while every local
    particle stays within ``skin/2`` (min-image) of ``pos0`` AND the
    local particle set itself is frozen (no ``slab_exchange`` between
    freeze and use — the domain rung tier freezes at the step boundary,
    right after the exchange, and migrates again only at the next
    boundary).  Correctness under drift follows :class:`ColumnPlan`
    exactly; the x-halo rows are re-assembled from CURRENT neighbour
    positions each tick by the same fixed ``ppermute`` routing the
    fresh build uses (position data moves, slot routing doesn't).

    Reference role: CONCEPT's production shape is P3M + rungs + MPI in
    ONE run (`TheFeedingPipeline/NN.param:81-83`, `SnapVsPK/
    Ucertain.py:89` — its run logs show both "Domain decomposition" and
    "Rung population" lines); this carries the frozen-plan trick into
    that regime."""

    pos0: jax.Array      # (C, 3) local wrapped positions at freeze
    src_g: jax.Array     # (ncol_l, stride) i32: slot -> LOCAL row
    starts: jax.Array    # (ncol_l,) i32 (into the frozen sort order)
    counts: jax.Array    # (ncol_l,) i32 raw per-column counts
    ws: jax.Array        # (ncol_l * 9 * maxch,) i32 frozen window starts
    nch: jax.Array       # (ncol_l,) i32
    gidx: jax.Array      # (C,) i32 local row -> padded slot
    ov: jax.Array        # () i32 field-encoded freeze-time overflow


def _local_slot_masks(starts, counts, CK, gz, stride):
    """(src, src_ok, is_front, is_interior, is_back) for a local plane —
    the inline slot arithmetic of :func:`build_local_column_plane`,
    recomputable from a frozen plan's starts/counts."""
    cnt = jnp.minimum(counts, CK)[:, None]
    r = (jnp.arange(stride, dtype=jnp.int32) - gz)[None, :]
    is_front = r < 0
    is_interior = (r >= 0) & (r < cnt)
    g_b = r - cnt
    is_back = (r >= cnt) & (g_b < gz)
    src = jnp.where(
        is_front,
        starts[:, None] + cnt + r,
        jnp.where(is_back, starts[:, None] + g_b, starts[:, None] + r),
    )
    src_ok = (src >= starts[:, None]) & (src < starts[:, None] + cnt)
    return src, src_ok, is_front, is_interior, is_back


def _local_plane_from_buf(buf, *, box, r_cut, ncell, n_dev, stride,
                          axis_name):
    """y ghost ring (local wrap) + x-halo ``ppermute`` assembly shared
    by the fresh and frozen local planes: (ncol_l, stride, 4) ->
    (8, (nxl+2) * P * stride) SoA plane.  Fixed routing — only the ROW
    DATA depends on positions, so the frozen path reuses it per tick."""
    dtype = buf.dtype
    d = jax.lax.axis_index(axis_name)
    nxl = ncell // n_dev
    P = ncell + 2
    z_pad = box + 3.0 * r_cut
    defaults = jnp.asarray([-8.0 * r_cut, -8.0 * r_cut, z_pad, 0.0], dtype)

    grid4 = buf.reshape(nxl, ncell, stride, 4)
    padded = jnp.pad(grid4, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="wrap")

    def shifted_y(sl, delta):
        lo_ = padded[:, sl]
        return lo_.at[..., 1].add(jnp.where(lo_[..., 3] > 0, delta, 0.0))

    padded = padded.at[:, 0].set(shifted_y(0, -box))
    padded = padded.at[:, P - 1].set(shifted_y(P - 1, box))

    zero_row = jnp.broadcast_to(defaults, (1, P, stride, 4))
    p5 = jnp.concatenate([zero_row, padded, zero_row], axis=0)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(p5[nxl], axis_name, fwd)
    from_right = jax.lax.ppermute(p5[1], axis_name, bwd)
    shift_l = jnp.where(d == 0, -box, 0.0).astype(dtype)
    shift_r = jnp.where(d == n_dev - 1, box, 0.0).astype(dtype)
    from_left = from_left.at[..., 0].add(
        jnp.where(from_left[..., 3] > 0, shift_l, 0.0)
    )
    from_right = from_right.at[..., 0].add(
        jnp.where(from_right[..., 3] > 0, shift_r, 0.0)
    )
    p5 = p5.at[0].set(from_left).at[nxl + 1].set(from_right)

    plane4 = p5.reshape((nxl + 2) * P * stride, 4)
    plane = jnp.concatenate(
        [
            jnp.moveaxis(plane4, -1, 0),
            jnp.zeros((4, (nxl + 2) * P * stride), dtype),
        ],
        axis=0,
    )
    return plane, plane4


def freeze_local_column_plan(pos_l, mass_l, *, box: float, r_cut: float,
                             ncell: int, n_dev: int, col_capacity: int,
                             window: int, axis_name: str,
                             chunk: int = 256, skin: float = 0.0):
    """Slab sibling of :func:`freeze_column_plan`: sort + bucket +
    skin-widened window tables at the CURRENT local positions, packaged
    for reuse (:class:`LocalColumnPlan`).  Must run inside the same
    ``shard_map`` as its consumers (x halos ride ``ppermute``)."""
    if box / ncell < r_cut - 1e-9:
        raise ValueError(f"column size {box / ncell:.3f} < r_cut {r_cut:.3f}")
    if skin > 0.0 and (box / ncell) < r_cut + 2.0 * skin:
        raise ValueError(
            f"column side {box / ncell:.3f} < r_cut + 2 skin "
            f"{r_cut + 2.0 * skin:.3f} — frozen xy bucketing would miss "
            f"drifted pairs"
        )
    d = jax.lax.axis_index(axis_name)
    C = pos_l.shape[0]
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    nxl = ncell // n_dev
    ncol_l = nxl * ncell
    P = ncell + 2
    # widened margins: tables/demand must cover anything that can drift
    # INTO a band/window while the plan is frozen (cf. ColumnPlan)
    zmargin_t = 1.0001 * r_cut + 0.5 * skin

    posw = jnp.mod(pos_l, box).astype(dtype)
    massf = mass_l.astype(dtype)
    valid = massf > 0
    cx = jnp.clip((posw[:, 0] * (ncell / box)).astype(jnp.int32),
                  0, ncell - 1)
    cy = jnp.clip((posw[:, 1] * (ncell / box)).astype(jnp.int32),
                  0, ncell - 1)
    cxl = cx - d * nxl
    resident = valid & (cxl >= 0) & (cxl < nxl)
    col = jnp.where(resident, cxl * ncell + cy, ncol_l)
    order = _col_z_order(col, posw[:, 2], ncol_l + 1, box)
    pos_s = posw[order]
    col_s = col[order]

    cols = jnp.arange(ncol_l, dtype=jnp.int32)
    starts = jnp.searchsorted(col_s, cols, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(col_s, cols, side="right").astype(jnp.int32)
    counts = ends - starts
    rank = jnp.arange(C, dtype=jnp.int32) - starts[
        jnp.clip(col_s, 0, ncol_l - 1)
    ]
    ok = (rank < CK) & (col_s < ncol_l)
    ov_b = (jnp.sum(resident) - jnp.sum(ok)).astype(jnp.int32)

    src, src_ok, is_front, is_interior, is_back = _local_slot_masks(
        starts, counts, CK, gz, stride
    )
    src_c = jnp.clip(src, 0, max(C - 1, 0))
    src_g = order[src_c].astype(jnp.int32)
    rows = jnp.concatenate([pos_s, massf[order][:, None]], axis=1)[src_c]
    z_raw = rows[..., 2]
    # TABLE buffer with the widened wrap margin (window demand must see
    # slots that can BECOME valid ghosts within skin/2 drift)
    valid_slot_t = (
        is_interior
        | (is_front & src_ok & (z_raw >= box - zmargin_t))
        | (is_back & src_ok & (z_raw <= zmargin_t))
    )
    shift = jnp.where(is_front, -box, jnp.where(is_back, box, 0.0))
    z_pad = box + 3.0 * r_cut
    default_z = jnp.where(is_front, -2.0 * box, z_pad)
    xy = jnp.where(valid_slot_t[..., None], rows[..., 0:2], -8.0 * r_cut)
    zf_ = jnp.where(valid_slot_t, z_raw + shift, default_z)
    mf_ = jnp.where(valid_slot_t, rows[..., 3], 0.0)
    buf_t = jnp.concatenate(
        [xy, zf_[..., None], mf_[..., None]], axis=-1
    )

    # ghost demand with the widened margin
    nb = jnp.sum(is_interior & (z_raw <= zmargin_t), axis=1)
    nf = jnp.sum(is_interior & (z_raw >= box - zmargin_t), axis=1)
    ov_b = ov_b + (
        jnp.sum(jnp.maximum(nb - gz, 0)) + jnp.sum(jnp.maximum(nf - gz, 0))
    ).astype(jnp.int32)

    _, plane4_t = _local_plane_from_buf(
        buf_t, box=box, r_cut=r_cut, ncell=ncell, n_dev=n_dev,
        stride=stride, axis_name=axis_name,
    )

    # frozen window tables on the skin-widened thresholds (x-neighbour
    # fences live in the halo rows of the assembled TABLE plane)
    zcols_pad = plane4_t[:, 2].reshape((nxl + 2) * P, stride)
    fence = zcols_pad[:, ::128]
    ch = jnp.arange(maxch, dtype=jnp.int32)
    nch = -(-jnp.minimum(counts, CK) // chunk)
    idx0 = starts[:, None] + ch[None, :] * chunk
    last = starts[:, None] + jnp.minimum(counts, CK)[:, None] - 1
    nmax = max(C - 1, 0)
    zmin = pos_s[jnp.clip(idx0, 0, nmax), 2]
    zmax = pos_s[jnp.clip(jnp.minimum(idx0 + chunk - 1, last), 0, nmax), 2]
    chunk_ok = ch[None, :] < nch[:, None]

    ic_x = cols // ncell
    ic_y = cols % ncell
    ws_list = []
    ov_w = jnp.int32(0)
    for o2 in range(9):
        dxo, dyo = o2 // 3 - 1, o2 % 3 - 1
        nc = (ic_x + 1 + dxo) * P + (ic_y + 1 + dyo)
        fj = fence[nc]
        qlo = (zmin - r_cut - skin)[:, :, None]
        qhi = (zmax + r_cut + skin)[:, :, None]
        cnt_lo = jnp.sum(fj[:, None, :] <= qlo, axis=-1)
        start = jnp.clip(
            (jnp.maximum(cnt_lo - 1, 0)) * 128, 0, stride - W
        ).astype(jnp.int32)
        hi_exact = jnp.sum(zcols_pad[nc][:, None, :] < qhi, axis=-1)
        ov_w = ov_w + jnp.sum(
            jnp.where(chunk_ok, jnp.maximum(hi_exact - (start + W), 0), 0)
        ).astype(jnp.int32)
        ws_list.append(start)
    ws = jnp.stack(ws_list, axis=1).reshape(ncol_l * 9 * maxch)

    pc = (jnp.clip(cxl, 0, nxl - 1) + 1) * P + (cy + 1)
    sentinel = (nxl + 2) * P * stride
    gidx_s = jnp.where(ok, pc[order] * stride + gz + rank, sentinel)
    gidx = (
        jnp.full((C,), sentinel, jnp.int32)
        .at[order]
        .set(gidx_s.astype(jnp.int32))
    )
    ov = jnp.minimum(ov_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
    return LocalColumnPlan(
        pos0=posw, src_g=src_g, starts=starts, counts=counts, ws=ws,
        nch=nch.astype(jnp.int32), gidx=gidx, ov=ov,
    )


def local_plan_stale(pos_l, plan: LocalColumnPlan, box: float,
                     skin: float):
    """LOCAL count of particles beyond ``skin/2`` (min-image) of their
    freeze positions — the plan-staleness channel; callers ``pmax`` it
    across devices/steps (CLAUDE.md: never sum overflow words)."""
    d = jnp.mod(pos_l, box).astype(plan.pos0.dtype) - plan.pos0
    d = d - box * jnp.round(d * (1.0 / box))
    return jnp.sum(
        jnp.sum(d * d, axis=1) > (0.5 * skin) ** 2
    ).astype(jnp.int32)


def p3m_local_columns_frozen_masked(
    pos_l, mass_l, act_l, plan: LocalColumnPlan, *, box: float,
    eps: float, r_s: float, r_cut: float, G: float = 1.0, ncell: int,
    n_dev: int, col_capacity: int, window: int, axis_name: str,
    split: str = "gaussian", softening: str = "plummer",
    chunk: int = 256, interpret: bool | None = None,
):
    """Slab sibling of :func:`p3m_short_columns_frozen_masked`: the
    domain rung tier's interior masked tick on a frozen local plan —
    one row gather + the fixed halo ppermutes re-assemble the plane at
    CURRENT positions (no argsort, no window reductions, no
    slab_exchange), the active-chunk table restricts kernel work to
    256-slot chunks holding an active target (single-device measured
    51 ms vs the 304 ms masked cells tick, clustered N=2^20, RESULTS
    round 4).  Returns (acc (C, 3), plan.ov) — NOT psum'd."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    nxl = ncell // n_dev
    ncol_l = nxl * ncell
    P = ncell + 2
    zmargin = 1.0001 * r_cut

    # unwrap current positions against the freeze positions (min-image:
    # wrap-crossers keep their frozen slots; cf. p3m_short_columns_frozen)
    posw = jnp.mod(pos_l, box).astype(dtype)
    dpos = posw - plan.pos0
    dpos = dpos - box * jnp.round(dpos * (1.0 / box))
    rows = jnp.concatenate(
        [plan.pos0 + dpos, mass_l.astype(dtype)[:, None]], axis=1
    )[plan.src_g]
    _, src_ok, is_front, is_interior, is_back = _local_slot_masks(
        plan.starts, plan.counts, CK, gz, stride
    )
    z_raw = rows[..., 2]
    valid_slot = (
        is_interior
        | (is_front & src_ok & (z_raw >= box - zmargin))
        | (is_back & src_ok & (z_raw <= zmargin))
    )
    shift = jnp.where(is_front, -box, jnp.where(is_back, box, 0.0))
    z_pad = box + 3.0 * r_cut
    default_z = jnp.where(is_front, -2.0 * box, z_pad)
    xy = jnp.where(valid_slot[..., None], rows[..., 0:2], -8.0 * r_cut)
    zf_ = jnp.where(valid_slot, z_raw + shift, default_z)
    mf_ = jnp.where(valid_slot, rows[..., 3], 0.0)
    buf = jnp.concatenate([xy, zf_[..., None], mf_[..., None]], axis=-1)
    plane, _ = _local_plane_from_buf(
        buf, box=box, r_cut=r_cut, ncell=ncell, n_dev=n_dev,
        stride=stride, axis_name=axis_name,
    )

    # per-(column, chunk) activity from the gathered target mask
    act_slot = act_l[plan.src_g] & is_interior
    act_chunk = jnp.any(
        act_slot[:, gz : gz + CK].reshape(ncol_l, maxch, chunk), axis=-1
    )
    nch_act = jnp.sum(act_chunk, axis=1).astype(jnp.int32)
    iota = jnp.arange(maxch, dtype=jnp.int32)[None, :]
    cht = jnp.sort(
        jnp.where(act_chunk, iota, maxch), axis=1
    ).reshape(ncol_l * maxch).astype(jnp.int32)

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

    ws_tab = _smem_table(plan.ws, ncol_l * 9, maxch)
    cht_tab = _smem_table(cht, ncol_l, maxch)
    cols = ws_tab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncol_l, 9),
        in_specs=[
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic * 9 + o2, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, stride), j_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _column_kernel_masked,
            ncell=ncell, stride=stride, W=W, maxch=maxch, gz=gz,
            chunk=chunk,
            eps2=float(eps) ** 2, r_s=float(r_s), r_cut=float(r_cut),
            split=split, softening=softening,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(nch_act, ws_tab, cht_tab, plane, plane)

    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, -1).T, jnp.zeros((1, 3), dtype)], axis=0
    )
    acc = acc_buckets[plan.gidx]
    return G * acc.astype(pos_l.dtype), plan.ov
