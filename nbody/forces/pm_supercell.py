"""Supercell PM deposit: CIC mass assignment as per-column MXU matmuls.

The XLA 8-corner scatter-add deposit costs ~84 ms at N=2^20/128^3 on the
v5e (measured, scripts/exp_cic_variants.py — window scatters, grid
copies and chunked vmaps are all worse).  TPUs have no fast scatter, but
they have an MXU: when the short-range column tier has already z-sorted
particles into (x, y) chaining columns (nbody.forces.p3m_columns) and
the PM mesh tiles those columns exactly (S = nmesh/ncell integer), the
deposit becomes dense linear algebra:

  per column, per 256-particle chunk:
    Wxy (256, 256):  m_p * tri(rx - a) * tri(ry - b), (a, b) the 16x16
                     node grid of the column's (S+1)^2 CIC nodes
                     (tri(u) = max(0, 1 - |u|) — nodes beyond S+1 get
                     weight 0 automatically)
    Wz  (256, ZP):   tri(rz - zn) over all nmesh+1 z nodes
    subgrid (256, ZP) += Wxy^T @ Wz        <- MXU, f32-accurate

and the per-column subgrids overlap-add into the global mesh with
static slicing (the +1-node halos roll onto the next tile; z node
nmesh folds onto 0).  Every weight is the exact CIC triangle, so the
result matches nbody.mesh.cic.cic_deposit to f32 summation order.

This replaces the hot half of CONCEPT's PM deposit path
(`SnapVsPK/Power_compare.py:100-132` numba scatter loops; SURVEY.md
C6) with the TPU-shaped formulation — the scatter is gone entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supercell_geometry(nmesh: int, ncell: int):
    """(S, ZP) for the supercell deposit, or None if unsupported.

    S = PM cells per column side (must be integer and <= 13 so the
    HALOED (S+3)^2 node grid packs into 16 x 16 = 256 MXU rows); ZP =
    the lane-aligned z-node width (nmesh + 3 nodes: -1 .. nmesh+1).

    The +-1-node halo beyond each column's own [0, S] node range lets
    the deposit/readback kernels stay exact for positions up to one PM
    cell OUTSIDE the column's xy footprint (and z slightly outside
    [0, box)) — what the frozen-plan path (particles drift <= skin/2
    from their freeze column) and the half-cell-shifted interlacing
    pass need.  Node row r maps to node r - 1; halo-node masses
    overlap-add onto the neighbouring tiles' core nodes."""
    if nmesh % ncell:
        return None
    S = nmesh // ncell
    if S > 13:
        return None
    ZP = -(-(nmesh + 4) // 128) * 128
    return S, ZP


def _deposit_kernel(counts_ref, plane_ref, out_ref, *, ncell, S, ZP,
                    stride, gz, scale, chunk, shift=0.0):
    """One interior column's CIC node masses via chunked MXU matmuls.

    Node row r / z lane l map to node r - 1 / l - 1 (the +-1 halo of
    :func:`supercell_geometry`).  ``shift`` (in PM cells) displaces the
    deposit coordinates — the interlacing pass uses +0.5."""
    ic = pl.program_id(0)
    cnt = counts_ref[ic]
    x0 = ((ic // ncell) * S).astype(jnp.float32)
    y0 = ((ic % ncell) * S).astype(jnp.float32)

    # per-particle outer product packed as lanes a*16+b, built DIRECTLY
    # on 256 lanes (node a = lane//16 - 1, b = lane%16 - 1): repeat/tile
    # of the (chunk, 16) factors lowers through a 3D reshape Mosaic
    # rejects
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    node_a = (iota256 // 16).astype(jnp.float32) - 1.0
    node_b = (iota256 % 16).astype(jnp.float32) - 1.0
    iotaz = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ZP), 1).astype(jnp.float32)
        - 1.0
    )
    iotap = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def body(k, acc):
        # shift SUBTRACTS, matching nbody.mesh.cic.cic_deposit's
        # s = pos * scale - shift (the interlaced pass's support then
        # spans nodes -1..S, inside the standard halo)
        sl = pl.ds(gz + k * chunk, chunk)
        x = plane_ref[0, sl] * scale - x0 - shift
        y = plane_ref[1, sl] * scale - y0 - shift
        z = plane_ref[2, sl] * scale - shift
        m = plane_ref[3, sl]
        # z-ghost exclusion: only the first cnt interior slots are reals
        live = (iotap + k * chunk) < cnt
        wm = jnp.where(live, m[:, None], 0.0)
        wxy = (
            jnp.maximum(1.0 - jnp.abs(x[:, None] - node_a), 0.0)
            * jnp.maximum(1.0 - jnp.abs(y[:, None] - node_b), 0.0)
            * wm
        )
        wz = jnp.maximum(1.0 - jnp.abs(z[:, None] - iotaz), 0.0)
        return acc + jax.lax.dot_general(
            wxy, wz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    nch = (cnt + chunk - 1) // chunk
    out_ref[:] = jax.lax.fori_loop(
        0, nch, body, jnp.zeros((256, ZP), jnp.float32)
    )


def _deposit_node_masses(plane, counts, *, nx: int, ncell: int, S: int,
                         ZP: int, stride: int, gz: int, scale: float,
                         chunk: int, shift: float,
                         interpret: bool):
    """pallas_call launch for :func:`_deposit_kernel` over an
    ``nx x ncell`` tile of padded columns (``nx = ncell`` single-device;
    ``nx = ncell / n_dev`` on a slab).  Returns the raw per-column node
    masses (nx * ncell * 256, ZP); the caller overlap-adds."""
    P = ncell + 2
    ncol = nx * ncell

    def i_map(ic, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncol,),
        in_specs=[
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, ZP), lambda ic, *_: (ic, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _deposit_kernel, ncell=ncell, S=S, ZP=ZP, stride=stride,
            gz=gz, scale=scale, chunk=chunk, shift=shift,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncol * 256, ZP), jnp.float32),
        interpret=interpret,
    )(counts, plane)


def _fold_rows(O, t_axis: int, r_axis: int, S: int):
    """Overlap-add one axis's 16 node rows (node = row - 1) onto the S
    core nodes per tile: halo nodes -1 / S / S+1 / S+2 roll onto the
    neighbouring tiles' core nodes (node g of tile t is node g mod S of
    tile t + g // S).  Rows beyond node S + 2 are structurally zero
    (CIC support of positions within one cell of the tile, plus the
    half-cell interlacing shift); node S + 2 itself only carries weight
    on the shifted interlacing pass, whose row exists for S <= 12."""
    core = jax.lax.slice_in_dim(O, 1, S + 1, axis=r_axis)
    for r in [0] + list(range(S + 1, min(S + 4, 16))):
        g = r - 1
        q, loc = divmod(g, S)
        h = jnp.roll(
            jax.lax.index_in_dim(O, r, axis=r_axis, keepdims=True),
            q, axis=t_axis,
        )
        idx = [slice(None)] * core.ndim
        idx[r_axis] = slice(loc, loc + 1)
        core = core.at[tuple(idx)].add(h)
    return core


def supercell_deposit_from_plane(plane, counts, *, box: float, nmesh: int,
                                 ncell: int, stride: int, gz: int,
                                 chunk: int = 256, shift: float = 0.0,
                                 interpret: bool | None = None):
    """CIC deposit of a column plane's interior particles onto the
    (nmesh,)^3 mesh.  ``plane``/``counts`` from
    :func:`nbody.forces.p3m_columns.build_column_plane` (ghost slots are
    excluded by the per-column count mask; overflowed particles are not
    in the plane and need the same capacity heal as the short range).

    Returns the mass grid — same contract as
    :func:`nbody.mesh.cic.cic_deposit` over the deposited subset.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = supercell_geometry(nmesh, ncell)
    if geom is None:
        raise ValueError(
            f"supercell deposit needs nmesh % ncell == 0 and "
            f"nmesh/ncell <= 13 (got nmesh={nmesh}, ncell={ncell})"
        )
    S, ZP = geom
    out = _deposit_node_masses(
        plane, counts, nx=ncell, ncell=ncell, S=S, ZP=ZP, stride=stride,
        gz=gz, scale=float(nmesh / box), chunk=chunk, shift=float(shift),
        interpret=interpret,
    )

    # ---- overlap-add the per-column haloed node grids ----
    O = out.reshape(ncell, ncell, 16, 16, ZP)
    A = _fold_rows(O, t_axis=0, r_axis=2, S=S)  # (nc, nc, S, 16, ZP)
    B = _fold_rows(A, t_axis=1, r_axis=3, S=S)  # (nc, nc, S, S, ZP)
    grid = B.transpose(0, 2, 1, 3, 4).reshape(nmesh, nmesh, ZP)
    # z lanes map to nodes -1 .. ZP-2; nodes -1 / nmesh / nmesh+1 /
    # nmesh+2 are the periodic images of nmesh-1 / 0 / 1 / 2
    ext = grid[..., : nmesh + 4]
    res = ext[..., 1 : nmesh + 1]
    res = res.at[..., nmesh - 1].add(ext[..., 0])
    res = res.at[..., 0].add(ext[..., nmesh + 1])
    res = res.at[..., 1].add(ext[..., nmesh + 2])
    return res.at[..., 2].add(ext[..., nmesh + 3])


# ---------------------------------------------------------------------------
# Fused short-range + PM-gather column kernel
# ---------------------------------------------------------------------------


def extract_column_subgrids(grids, ncell: int, S: int, ZP: int):
    """Per-column CIC node values of the 3 force grids, packed for the
    fused kernel: (ncol * 256, 3 * ZP) — rows a*16+b over the column's
    HALOED node grid (row r = node r - 1, periodic), lanes c*ZP + zl
    with z lane zl = node zl - 1.

    One small mod-index row gather (ncell^2 * 256 rows), nothing
    per-particle.  Rows beyond node S + 1 hold wrapped values the
    kernel's triangle weights never touch (weight 0 for |x - a| >= 1)."""
    nmesh = grids.shape[1]
    ncol = ncell * ncell
    nc = grids.shape[0]  # 3 force comps, or 6 for the interlaced pair
    idx = jnp.mod(
        jnp.arange(ncell)[:, None] * S + jnp.arange(-1, 15)[None, :], nmesh
    ).reshape(-1)  # (ncell * 16,) node rows -1..14 per tile, periodic
    zidx = jnp.mod(jnp.arange(-1, nmesh + 3), nmesh)  # z nodes -1..nmesh+2
    X = grids[:, idx][:, :, idx][:, :, :, zidx]
    # (nc, ncell*16, ncell*16, nmesh+4)
    X = X.reshape(nc, ncell, 16, ncell, 16, nmesh + 4)
    X = X.transpose(1, 3, 2, 4, 0, 5)  # (ncl, ncl, 16, 16, nc, nm+4)
    out = jnp.zeros((ncol, 16, 16, nc, ZP), grids.dtype)
    out = out.at[..., : nmesh + 4].set(X.reshape(ncol, 16, 16, nc, -1))
    return out.reshape(ncol * 256, nc * ZP)


def _column_pm_kernel(nch_ref, ws_ref, i_ref, j_ref, s_ref, out_ref, *,
                      ncell, stride, W, maxch, gz, chunk, eps2, r_s,
                      r_cut, split, softening, S, ZP, scale,
                      split_out=False, interlaced=False):
    """Column short-range kernel fused with the PM force readback.

    Identical to nbody.forces.p3m_columns._column_kernel except at the
    first (o2 == 0) visit the output column is INITIALIZED with the PM
    force interpolated from the column's node subgrid (s_ref) by the
    same MXU triangle contraction the supercell deposit uses — so the
    XLA per-particle CIC gather disappears and one gidx readback
    returns the TOTAL force.

    ``split_out=True`` writes the PM force into plane rows 3-5 instead
    of initializing rows 0-2, so the long and short halves come back
    SEPARATELY from one fused evaluation — the split-Hamiltonian
    integrators (subcycled / rung boundary ticks) evaluate both at the
    same positions and only scale them by different 1/a factors.

    ``interlaced=True``: s_ref carries SIX node grids (3 force comps x
    {unshifted, half-cell-shifted}); the second interlacing pass is the
    same contraction with +0.5-shifted triangle weights, and the two
    passes average — CONCEPT's "Second interlacing pass"
    (`TheFeedingPipeline/NN.param:72-76` (True, True)) without a second
    per-particle gather."""
    from nbody.forces.p3m import _weight_fn

    ic = pl.program_id(0)
    o2 = pl.program_id(1)
    nch = nch_ref[ic]
    x0 = ((ic // ncell) * S).astype(jnp.float32)
    y0 = ((ic % ncell) * S).astype(jnp.float32)

    @pl.when(o2 == 0)
    def _():
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        node_a = (iota256 // 16).astype(jnp.float32) - 1.0
        node_b = (iota256 % 16).astype(jnp.float32) - 1.0
        iotaz = (
            jax.lax.broadcasted_iota(jnp.int32, (1, ZP), 1).astype(
                jnp.float32
            )
            - 1.0
        )
        out_ref[:] = jnp.zeros((8, stride), jnp.float32)

        def one_pass(x, y, z, sref_block):
            wxy = jnp.maximum(
                1.0 - jnp.abs(x[:, None] - node_a), 0.0
            ) * jnp.maximum(1.0 - jnp.abs(y[:, None] - node_b), 0.0)
            wz = jnp.maximum(1.0 - jnp.abs(z[:, None] - iotaz), 0.0)
            t = jax.lax.dot_general(
                wxy, sref_block, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (chunk, 3 * ZP)
            fx = jnp.sum(t[:, 0:ZP] * wz, axis=1)
            fy = jnp.sum(t[:, ZP : 2 * ZP] * wz, axis=1)
            fz = jnp.sum(t[:, 2 * ZP : 3 * ZP] * wz, axis=1)
            return fx, fy, fz

        def pm_body(k, carry):
            sl = pl.ds(gz + k * chunk, chunk)
            x = i_ref[0, sl] * scale - x0
            y = i_ref[1, sl] * scale - y0
            z = i_ref[2, sl] * scale
            fx, fy, fz = one_pass(x, y, z, s_ref[:, 0 : 3 * ZP])
            if interlaced:
                # shift subtracts (cic_gather_vec's shift convention)
                gx, gy, gz_ = one_pass(
                    x - 0.5, y - 0.5, z - 0.5, s_ref[:, 3 * ZP : 6 * ZP]
                )
                fx = 0.5 * (fx + gx)
                fy = 0.5 * (fy + gy)
                fz = 0.5 * (fz + gz_)
            zerov = jnp.zeros_like(fx)
            if split_out:
                upd = jnp.stack([zerov, zerov, zerov, fx, fy, fz,
                                 zerov, zerov])
            else:
                upd = jnp.stack([fx, fy, fz, zerov, zerov, zerov, zerov,
                                 zerov])
            out_ref[:, sl] = out_ref[:, sl] + upd
            return carry

        jax.lax.fori_loop(0, nch, pm_body, 0)

    wfn = _weight_fn(split, softening)

    def body(k, carry):
        from nbody.forces.p3m_columns import _pair_accum, _smem_lookup

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


def run_fused_column_plane(plane, ws, nch, subgrids, *, ncell: int,
                           stride: int, W: int, maxch: int, gz: int,
                           chunk: int, eps2: float, r_s: float,
                           r_cut: float, split: str, softening: str,
                           S: int, ZP: int, scale: float,
                           split_out: bool = False,
                           nx: int | None = None,
                           interlaced: bool = False,
                           interpret: bool | None = None):
    """pallas_call wrapper for :func:`_column_pm_kernel`.  ``nx`` is the
    x-tile count of the padded plane (``ncell`` single-device — the
    default; ``ncell / n_dev`` on a slab, whose x coordinates must be
    LOCAL, i.e. shifted by -d * box / n_dev).  ``interlaced`` expects
    ``subgrids`` with 6 * ZP lanes (both interlacing grids)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if nx is None:
        nx = ncell
    NC = 6 if interlaced else 3
    P = ncell + 2

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

    from nbody.forces.p3m_columns import _smem_table

    ws_tab = _smem_table(ws, nx * ncell * 9, maxch)
    cols = ws_tab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nx * ncell, 9),
        in_specs=[
            pl.BlockSpec((8, cols), lambda ic, o2, *_: (ic * 9 + o2, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, stride), j_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((256, NC * ZP), lambda ic, o2, *_: (ic, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _column_pm_kernel, ncell=ncell, stride=stride, W=W,
            maxch=maxch, gz=gz, chunk=chunk, eps2=eps2, r_s=float(r_s),
            r_cut=float(r_cut), split=split, softening=softening, S=S,
            ZP=ZP, scale=scale, split_out=split_out, interlaced=interlaced,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(nch, ws_tab, plane, plane, subgrids)


def supercell_params(box: float, nmesh: int, n: int):
    """(r_s, r_cut, ncell, col_capacity, window) for the supercell tier,
    or None when no chaining grid both tiles the mesh and respects
    r_cut.  ncell = the LARGEST divisor of nmesh with box/ncell >= r_cut,
    nmesh/ncell <= 15, and ncell >= 3 (xy ghost ring)."""
    from nbody.forces.p3m import p3m_short_params, supercell_ncell
    from nbody.forces.p3m_columns import column_window

    r_s, r_cut, _, _ = p3m_short_params(box, nmesh, n)
    ncell = supercell_ncell(box, nmesh, r_cut)
    if ncell is None:
        return None
    mean_col = n / ncell**2
    cap = int(mean_col + 6.0 * mean_col**0.5 + 8)
    col_capacity = -(-cap // 128) * 128
    return r_s, r_cut, ncell, col_capacity, column_window(
        box, r_cut, col_capacity
    )


# Largest column stride (slots) the fused kernel's scoped VMEM affords:
# the i/j/out (8, stride) f32 blocks cost ~192 B/slot buffered, so the
# 16 MB scoped-VMEM budget runs out near stride ~7e4 (measured: compile
# OOM at stride 82688, 16.64 MB scoped).  Kept with ~1.4x margin —
# above it the columns tier (finer chaining grid, smaller strides for
# the same clustering) carries the force instead.
_STRIDE_MAX = 49152


def supercell_stride_ok(box: float, r_cut: float, col_capacity: int) -> bool:
    """True when the fused supercell kernel compiles at this capacity
    (clustered states heal col_capacity far past the uniform sizing;
    the capacity-proportional (8, stride) VMEM blocks are the binding
    limit — see `_STRIDE_MAX`)."""
    from nbody.forces.p3m_columns import ghost_slots

    CK = -(-int(col_capacity) // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    return CK + 2 * gz <= _STRIDE_MAX


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "nmesh", "G", "eps", "r_s", "r_cut", "deconvolve_p",
        "split", "softening", "ncell", "col_capacity", "window",
        "grad_order", "chunk", "part_split", "interlace", "interpret",
        "skin", "with_plan",
    ),
)
def p3m_supercell_acc(
    pos,
    mass,
    box: float,
    nmesh: int,
    G: float = 1.0,
    eps: float = 0.0,
    r_s: float = 0.0,
    r_cut: float = 0.0,
    deconvolve_p: int = 2,
    split: str = "spline",
    softening: str = "plummer",
    *,
    ncell: int,
    col_capacity: int,
    window: int,
    grad_order: str = "fd4",
    chunk: int = 256,
    part_split: bool = False,
    interlace: bool = False,
    interpret: bool | None = None,
    skin: float = 0.0,
    with_plan: bool = False,
):
    """Full P3M force (PM far field + short-range correction) with ONE
    particle sort, an MXU deposit, and the PM readback fused into the
    short-range column kernel — no XLA scatter or per-particle gather
    anywhere except the final per-particle slot readback.

    Same physics as ``p3m_acc(part='both')`` with the columns tier; the
    per-particle XLA deposit (84 ms) + force gather (78 ms) at
    N=2^20/128^3 become ~a dozen ms of MXU matmuls.  Returns
    (acc (N, 3), overflow) with the columns tier's field-encoded
    overflow word.  Overflowed particles lose their WHOLE force (not
    just the short-range part) until the capacity heal re-jits —
    acceptable because any nonzero overflow already invalidates the
    step.

    ``interlace=True`` runs CONCEPT's two interlacing passes fused: a
    second MXU deposit at the half-cell shift, alias cancellation in k,
    and the second force gather as a second in-kernel triangle
    contraction on the shifted node grids (the reference's training
    config interlaces forces, `TheFeedingPipeline/NN.param:72-76`
    (True, True)).  The shifted support spans nodes -1..S — inside the
    standard halo.

    ``part_split=True`` returns (acc_long, acc_short, overflow) from
    the SAME single fused evaluation (the kernel writes the PM half
    into plane rows 3-5) — for the split-Hamiltonian integrators,
    whose boundary ticks need both halves at identical positions.

    Reference role: CONCEPT's P3M pipeline deposit->FFT->interpolate
    (SURVEY.md §2.2) re-shaped around the MXU.
    """
    from nbody.forces.p3m_columns import build_column_plane, ghost_slots
    from nbody.forces.pm import (
        pm_force_grids_from_rho, pm_force_grids_from_rho_pair,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = supercell_geometry(nmesh, ncell)
    if geom is None:
        raise ValueError(f"nmesh={nmesh} does not tile ncell={ncell}")
    S, ZP = geom
    if box / ncell < r_cut - 1e-9:
        raise ValueError(f"column size {box / ncell:.3f} < r_cut {r_cut:.3f}")
    n = pos.shape[0]
    dtype = jnp.float32
    CK = -(-col_capacity // 128) * 128
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    if CK % chunk:
        chunk = 128
    stride = CK + 2 * gz
    W = min(-(-window // 128) * 128, stride)
    maxch = CK // chunk
    P2 = (ncell + 2) ** 2

    built = build_column_plane(
        pos, mass, box, float(r_cut), ncell, CK, W, chunk=chunk,
        skin=float(skin), with_plan=with_plan,
    )
    plane, ws, nch, ov_b, ov_w, gidx, counts = built[:7]
    plan = built[7] if with_plan else None
    rho = supercell_deposit_from_plane(
        plane, counts, box=box, nmesh=nmesh, ncell=ncell, stride=stride,
        gz=gz, chunk=chunk, interpret=interpret,
    )
    # G is applied once at the end (the short-range sum is unscaled), so
    # the Poisson source here carries 4 pi rho_mean only
    amp = 4.0 * jnp.pi * jnp.sum(mass) / box**3
    gkw = dict(
        source_amp=amp, deconvolve_p=deconvolve_p,
        longrange_split=float(r_s) if split == "gaussian" else 0.0,
        spline_split=float(r_cut) if split == "spline" else 0.0,
        grad_order=grad_order,
    )
    if interlace:
        rho1 = supercell_deposit_from_plane(
            plane, counts, box=box, nmesh=nmesh, ncell=ncell,
            stride=stride, gz=gz, chunk=chunk, shift=0.5,
            interpret=interpret,
        )
        grids = pm_force_grids_from_rho_pair(
            rho, rho1, jnp.sum(mass), box, nmesh, **gkw
        )
    else:
        grids = pm_force_grids_from_rho(
            rho, jnp.sum(mass), box, nmesh, **gkw
        )
    subgrids = extract_column_subgrids(grids, ncell, S, ZP)
    out = run_fused_column_plane(
        plane, ws, nch, subgrids, ncell=ncell, stride=stride, W=W,
        maxch=maxch, gz=gz, chunk=chunk, eps2=float(eps) ** 2,
        r_s=float(r_s), r_cut=float(r_cut), split=split,
        softening=softening, S=S, ZP=ZP, scale=float(nmesh / box),
        split_out=part_split, interlaced=interlace, interpret=interpret,
    )
    ov = jnp.minimum(ov_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
    if part_split:
        buckets6 = jnp.concatenate(
            [out[:6].reshape(6, P2 * stride).T, jnp.zeros((1, 6), dtype)],
            axis=0,
        )
        both = buckets6[gidx]
        acc_short = G * both[:, 0:3].astype(pos.dtype)
        acc_long = G * both[:, 3:6].astype(pos.dtype)
        if with_plan:
            return acc_long, acc_short, ov, plan
        return acc_long, acc_short, ov
    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), dtype)],
        axis=0,
    )
    acc = acc_buckets[gidx]
    if with_plan:
        return G * acc.astype(pos.dtype), ov, plan
    return G * acc.astype(pos.dtype), ov


# ---------------------------------------------------------------------------
# Slab (multi-chip domain) supercell tier
# ---------------------------------------------------------------------------


def supercell_deposit_local(plane_loc, counts, *, box: float, nmesh: int,
                            ncell: int, n_dev: int, stride: int, gz: int,
                            axis_name: str, chunk: int = 256,
                            shift: float = 0.0,
                            interpret: bool | None = None):
    """Slab sibling of :func:`supercell_deposit_from_plane`: CIC deposit
    of a LOCAL column plane (from `nbody.forces.p3m_columns.
    build_local_column_plane`, x coordinates shifted to slab-local by
    the caller) onto the device's (nmesh/n_dev, nmesh, nmesh) mesh slab.
    y/z node folds are device-local (full extent); the x-halo node
    planes (one left, two right — the +-1-node halo geometry) ride two
    ``ppermute``s, replacing the scatter deposit's spill exchanges.

    Same contract as `nbody.distributed.domain.slab_deposit` over the
    deposited subset (resident, within bucket capacity).  Reference
    role: CONCEPT's MPI-decomposed PM deposit (SURVEY.md §2.2), MXU-
    shaped (see module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = supercell_geometry(nmesh, ncell)
    if geom is None:
        raise ValueError(
            f"supercell deposit needs nmesh % ncell == 0 and "
            f"nmesh/ncell <= 13 (got nmesh={nmesh}, ncell={ncell})"
        )
    S, ZP = geom
    nxl = ncell // n_dev
    nml = nmesh // n_dev  # local mesh x-planes = nxl * S

    out = _deposit_node_masses(
        plane_loc, counts, nx=nxl, ncell=ncell, S=S, ZP=ZP,
        stride=stride, gz=gz, scale=float(nmesh / box), chunk=chunk,
        shift=float(shift), interpret=interpret,
    )

    # ---- local y fold (full global y ring on-device) + z fold ----------
    O = out.reshape(nxl, ncell, 16, 16, ZP)
    A = _fold_rows(O, t_axis=1, r_axis=3, S=S)  # (nxl, ncell, 16, S, ZP)
    ext_z = A[..., : nmesh + 4]
    Az = ext_z[..., 1 : nmesh + 1]
    Az = Az.at[..., nmesh - 1].add(ext_z[..., 0])
    Az = Az.at[..., 0].add(ext_z[..., nmesh + 1])
    Az = Az.at[..., 1].add(ext_z[..., nmesh + 2])
    Az = Az.at[..., 2].add(ext_z[..., nmesh + 3])
    # (nxl, ncell, 16 x-rows, S, nmesh) -> fold x into an extended local
    # node axis [node -1 .. nxl*S + 1], then exchange the 3 halo planes
    ext = jnp.zeros((nml + 3, ncell, S, nmesh), Az.dtype)
    for r in range(S + 3):
        # tile t row r = local node t*S + r - 1 = ext index t*S + r
        ext = ext.at[r : r + nxl * S : S].add(Az[:, :, r])
    grid = ext[1 : nml + 1]
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    # node base-1 -> left neighbour's last plane
    left = jax.lax.ppermute(ext[0][None], axis_name, bwd)
    # nodes base+nml, +1 -> right neighbour's planes 0, 1
    right = jax.lax.ppermute(ext[nml + 1 : nml + 3], axis_name, fwd)
    grid = grid.at[nml - 1].add(left[0])
    grid = grid.at[0].add(right[0])
    grid = grid.at[1].add(right[1])
    # (nml local x-planes, ncell, S, nmesh) -> (nml, nmesh, nmesh)
    return grid.reshape(nml, nmesh, nmesh)


def extract_local_subgrids(grids_l, ncell: int, S: int, ZP: int, *,
                           n_dev: int, axis_name: str):
    """Slab sibling of :func:`extract_column_subgrids`: per-LOCAL-column
    haloed node values of the 3 local force grids (3, nmesh/n_dev,
    nmesh, nmesh).  x nodes -1 and nxl*S..nxl*S+1 live on the
    neighbouring slabs — one plane each way by ``ppermute``; y/z wrap
    locally (full extent)."""
    nc = grids_l.shape[0]  # 3 force comps, or 6 for the interlaced pair
    nml = grids_l.shape[1]
    nmesh = grids_l.shape[2]
    nxl = ncell // n_dev
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(grids_l[:, nml - 1 :], axis_name, fwd)
    from_right = jax.lax.ppermute(grids_l[:, :3], axis_name, bwd)
    Gx = jnp.concatenate([from_left, grids_l, from_right], axis=1)
    # local x node idx: node g (in -1..nxl*S+2) at Gx plane g+1
    xidx = (
        jnp.arange(nxl)[:, None] * S + jnp.arange(-1, 15)[None, :] + 1
    ).reshape(-1)
    xidx = jnp.clip(xidx, 0, nml + 3)  # rows beyond node nxl*S+2 unused
    yidx = jnp.mod(
        jnp.arange(ncell)[:, None] * S + jnp.arange(-1, 15)[None, :], nmesh
    ).reshape(-1)
    zidx = jnp.mod(jnp.arange(-1, nmesh + 3), nmesh)
    X = Gx[:, xidx][:, :, yidx][:, :, :, zidx]
    X = X.reshape(nc, nxl, 16, ncell, 16, nmesh + 4)
    X = X.transpose(1, 3, 2, 4, 0, 5)
    ncol_l = nxl * ncell
    out = jnp.zeros((ncol_l, 16, 16, nc, ZP), grids_l.dtype)
    out = out.at[..., : nmesh + 4].set(X.reshape(ncol_l, 16, 16, nc, -1))
    return out.reshape(ncol_l * 256, nc * ZP)


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "nmesh", "G", "eps", "r_s", "r_cut", "deconvolve_p",
        "split", "softening", "ncell", "col_capacity", "window",
        "grad_order", "chunk", "part_split", "interlace", "interpret",
    ),
)
def p3m_supercell_frozen(
    pos,
    mass,
    plan,
    box: float,
    nmesh: int,
    G: float = 1.0,
    eps: float = 0.0,
    r_s: float = 0.0,
    r_cut: float = 0.0,
    deconvolve_p: int = 2,
    split: str = "spline",
    softening: str = "plummer",
    *,
    ncell: int,
    col_capacity: int,
    window: int,
    grad_order: str = "fd4",
    chunk: int = 256,
    part_split: bool = False,
    interlace: bool = False,
    interpret: bool | None = None,
):
    """:func:`p3m_supercell_acc` on a FROZEN column plan: no sort, no
    window tables — one row gather by ``plan.src_g`` assembles the plane
    at the CURRENT positions, the MXU deposit and the fused PM-readback
    kernel run on it with the plan's frozen windows, and ``plan.gidx``
    maps the result back (`nbody.forces.p3m_columns.ColumnPlan`; drift
    validity via ``plan_drift_ok``).  ``interlace`` as
    :func:`p3m_supercell_acc` — the shifted support reaches node -2
    when drift exceeds half a PM cell, so the driver clamps the skin
    below 0.9 cells for interlaced frozen plans.

    Exactness under drift: the short-range half inherits the frozen
    columns tier's skin guarantees; the PM deposit/readback stay EXACT
    CIC because the haloed node geometry (:func:`supercell_geometry`)
    covers positions up to one PM cell outside the frozen column — the
    caller must keep ``skin/2 < box/nmesh`` (checked by the driver's
    frozen builder).

    This is the composition VERDICT round 3 asked for: the split
    integrators' boundary ticks pay the argsort per drift budget, not
    per step.  Returns (acc, plan.ov), or (acc_long, acc_short,
    plan.ov) with ``part_split=True``.
    """
    from nbody.forces.p3m_columns import (
        _plane_from_buf, _rows_to_buf, _slot_sources, ghost_slots,
    )
    from nbody.forces.pm import (
        pm_force_grids_from_rho, pm_force_grids_from_rho_pair,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    geom = supercell_geometry(nmesh, ncell)
    if geom is None:
        raise ValueError(f"nmesh={nmesh} does not tile ncell={ncell}")
    S, ZP = geom
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

    # frozen plane assembly at CURRENT positions (min-image unwrapped
    # against the freeze positions — see p3m_short_columns_frozen)
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
    counts = jnp.minimum(plan.counts, CK).astype(jnp.int32)

    rho = supercell_deposit_from_plane(
        plane, counts, box=box, nmesh=nmesh, ncell=ncell, stride=stride,
        gz=gz, chunk=chunk, interpret=interpret,
    )
    amp = 4.0 * jnp.pi * jnp.sum(mass) / box**3
    gkw = dict(
        source_amp=amp, deconvolve_p=deconvolve_p,
        longrange_split=float(r_s) if split == "gaussian" else 0.0,
        spline_split=float(r_cut) if split == "spline" else 0.0,
        grad_order=grad_order,
    )
    if interlace:
        rho1 = supercell_deposit_from_plane(
            plane, counts, box=box, nmesh=nmesh, ncell=ncell,
            stride=stride, gz=gz, chunk=chunk, shift=0.5,
            interpret=interpret,
        )
        grids = pm_force_grids_from_rho_pair(
            rho, rho1, jnp.sum(mass), box, nmesh, **gkw
        )
    else:
        grids = pm_force_grids_from_rho(
            rho, jnp.sum(mass), box, nmesh, **gkw
        )
    subgrids = extract_column_subgrids(grids, ncell, S, ZP)
    out = run_fused_column_plane(
        plane, plan.ws, plan.nch, subgrids, ncell=ncell, stride=stride,
        W=W, maxch=maxch, gz=gz, chunk=chunk, eps2=float(eps) ** 2,
        r_s=float(r_s), r_cut=float(r_cut), split=split,
        softening=softening, S=S, ZP=ZP, scale=float(nmesh / box),
        split_out=part_split, interlaced=interlace, interpret=interpret,
    )
    if part_split:
        buckets6 = jnp.concatenate(
            [out[:6].reshape(6, P2 * stride).T, jnp.zeros((1, 6), dtype)],
            axis=0,
        )
        both = buckets6[plan.gidx]
        acc_short = G * both[:, 0:3].astype(pos.dtype)
        acc_long = G * both[:, 3:6].astype(pos.dtype)
        return acc_long, acc_short, plan.ov
    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), dtype)],
        axis=0,
    )
    acc = acc_buckets[plan.gidx]
    return G * acc.astype(pos.dtype), plan.ov
