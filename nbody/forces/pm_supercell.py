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

    S = PM cells per column side (must be integer and <= 15 so the
    (S+1)^2 node grid packs into 16 x 16 = 256 MXU rows); ZP = the
    lane-aligned z-node width (nmesh + 1 nodes)."""
    if nmesh % ncell:
        return None
    S = nmesh // ncell
    if S > 15:
        return None
    ZP = -(-(nmesh + 1) // 128) * 128
    return S, ZP


def _deposit_kernel(counts_ref, plane_ref, out_ref, *, ncell, S, ZP,
                    stride, gz, scale, chunk):
    """One interior column's CIC node masses via chunked MXU matmuls."""
    ic = pl.program_id(0)
    cnt = counts_ref[ic]
    x0 = ((ic // ncell) * S).astype(jnp.float32)
    y0 = ((ic % ncell) * S).astype(jnp.float32)

    # per-particle outer product packed as lanes a*16+b, built DIRECTLY
    # on 256 lanes (node a = lane//16, b = lane%16): repeat/tile of the
    # (chunk, 16) factors lowers through a 3D reshape Mosaic rejects
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    node_a = (iota256 // 16).astype(jnp.float32)
    node_b = (iota256 % 16).astype(jnp.float32)
    iotaz = jax.lax.broadcasted_iota(jnp.int32, (1, ZP), 1).astype(
        jnp.float32
    )
    iotap = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def body(k, acc):
        sl = pl.ds(gz + k * chunk, chunk)
        x = plane_ref[0, sl] * scale - x0
        y = plane_ref[1, sl] * scale - y0
        z = plane_ref[2, sl] * scale
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


def supercell_deposit_from_plane(plane, counts, *, box: float, nmesh: int,
                                 ncell: int, stride: int, gz: int,
                                 chunk: int = 256,
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
            f"nmesh/ncell <= 15 (got nmesh={nmesh}, ncell={ncell})"
        )
    S, ZP = geom
    P = ncell + 2
    ncol = ncell * ncell

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
    out = pl.pallas_call(
        functools.partial(
            _deposit_kernel, ncell=ncell, S=S, ZP=ZP, stride=stride,
            gz=gz, scale=float(nmesh / box), chunk=chunk,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncol * 256, ZP), jnp.float32),
        interpret=interpret,
    )(counts, plane)

    # ---- overlap-add the per-column (S+1, S+1, nmesh+1) node grids ----
    O = out.reshape(ncell, ncell, 16, 16, ZP)[..., : nmesh + 1]
    core = O[:, :, :S, :S, :]
    # x halo (node a == S) lands on node 0 of the next x tile (wraps)
    core = core.at[:, :, 0, :, :].add(jnp.roll(O[:, :, S, :S, :], 1, 0))
    core = core.at[:, :, :, 0, :].add(jnp.roll(O[:, :, :S, S, :], 1, 1))
    core = core.at[:, :, 0, 0, :].add(
        jnp.roll(jnp.roll(O[:, :, S, S, :], 1, 0), 1, 1)
    )
    grid = core.transpose(0, 2, 1, 3, 4).reshape(nmesh, nmesh, nmesh + 1)
    # z node nmesh is the periodic image of node 0
    return grid[..., :nmesh].at[..., 0].add(grid[..., nmesh])


# ---------------------------------------------------------------------------
# Fused short-range + PM-gather column kernel
# ---------------------------------------------------------------------------


def extract_column_subgrids(grids, ncell: int, S: int, ZP: int):
    """Per-column CIC node values of the 3 force grids, packed for the
    fused kernel: (ncol * 256, 3 * ZP) — rows a*16+b over the column's
    (S+1)^2 node grid (wrap halos included), lanes c*ZP + zn.

    Static strided slicing + one small row gather (ncell^2 * (S+1)^2
    rows), nothing per-particle."""
    nmesh = grids.shape[1]
    ncol = ncell * ncell
    # wrap-extend each axis by one node
    G = jnp.concatenate([grids, grids[:, :1]], axis=1)
    G = jnp.concatenate([G, G[:, :, :1]], axis=2)
    G = jnp.concatenate([G, G[:, :, :, :1]], axis=3)  # (3, nm+1, nm+1, nm+1)
    idx = (jnp.arange(ncell)[:, None] * S
           + jnp.arange(S + 1)[None, :]).reshape(-1)  # (ncell*(S+1),)
    X = G[:, idx][:, :, idx]  # (3, ncell*(S+1), ncell*(S+1), nm+1)
    X = X.reshape(3, ncell, S + 1, ncell, S + 1, nmesh + 1)
    X = X.transpose(1, 3, 2, 4, 0, 5)  # (nc, nc, S+1, S+1, 3, nm+1)
    out = jnp.zeros((ncol, 16, 16, 3, ZP), grids.dtype)
    out = out.at[:, : S + 1, : S + 1, :, : nmesh + 1].set(
        X.reshape(ncol, S + 1, S + 1, 3, nmesh + 1)
    )
    return out.reshape(ncol * 256, 3 * ZP)


def _column_pm_kernel(ws_ref, nch_ref, i_ref, j_ref, s_ref, out_ref, *,
                      ncell, stride, W, maxch, gz, chunk, eps2, r_s,
                      r_cut, split, softening, S, ZP, scale,
                      split_out=False):
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
    same positions and only scale them by different 1/a factors."""
    from nbody.forces.p3m import _weight_fn

    ic = pl.program_id(0)
    o2 = pl.program_id(1)
    nch = nch_ref[ic]
    x0 = ((ic // ncell) * S).astype(jnp.float32)
    y0 = ((ic % ncell) * S).astype(jnp.float32)

    @pl.when(o2 == 0)
    def _():
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        node_a = (iota256 // 16).astype(jnp.float32)
        node_b = (iota256 % 16).astype(jnp.float32)
        iotaz = jax.lax.broadcasted_iota(jnp.int32, (1, ZP), 1).astype(
            jnp.float32
        )
        out_ref[:] = jnp.zeros((8, stride), jnp.float32)

        def pm_body(k, carry):
            sl = pl.ds(gz + k * chunk, chunk)
            x = i_ref[0, sl] * scale - x0
            y = i_ref[1, sl] * scale - y0
            z = i_ref[2, sl] * scale
            wxy = jnp.maximum(
                1.0 - jnp.abs(x[:, None] - node_a), 0.0
            ) * jnp.maximum(1.0 - jnp.abs(y[:, None] - node_b), 0.0)
            wz = jnp.maximum(1.0 - jnp.abs(z[:, None] - iotaz), 0.0)
            t = jax.lax.dot_general(
                wxy, s_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (chunk, 3 * ZP)
            fx = jnp.sum(t[:, 0:ZP] * wz, axis=1)
            fy = jnp.sum(t[:, ZP : 2 * ZP] * wz, axis=1)
            fz = jnp.sum(t[:, 2 * ZP : 3 * ZP] * wz, axis=1)
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
        start = pl.multiple_of(ws_ref[(ic * 9 + o2) * maxch + k], 128)
        i_blk = i_ref[:, pl.ds(gz + k * chunk, chunk)]
        j_blk = j_ref[:, pl.ds(start, W)]
        xi = i_blk[0][:, None]
        yi = i_blk[1][:, None]
        zi = i_blk[2][:, None]
        xj = j_blk[0][None, :]
        yj = j_blk[1][None, :]
        zj = j_blk[2][None, :]
        mj = j_blk[3][None, :]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz
        w = mj * wfn(r2, eps2, r_s, r_cut)
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        az = jnp.sum(w * dz, axis=1)
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
                           interpret: bool | None = None):
    """pallas_call wrapper for :func:`_column_pm_kernel`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = ncell + 2

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ncell * ncell, 9),
        in_specs=[
            pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, stride), j_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 3 * ZP), lambda ic, o2, *_: (ic, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, stride), i_map, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _column_pm_kernel, ncell=ncell, stride=stride, W=W,
            maxch=maxch, gz=gz, chunk=chunk, eps2=eps2, r_s=float(r_s),
            r_cut=float(r_cut), split=split, softening=softening, S=S,
            ZP=ZP, scale=scale, split_out=split_out,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(ws, nch, plane, plane, subgrids)


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


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "nmesh", "G", "eps", "r_s", "r_cut", "deconvolve_p",
        "split", "softening", "ncell", "col_capacity", "window",
        "grad_order", "chunk", "part_split", "interpret",
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
    interpret: bool | None = None,
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
    step.  Interlaced forces are not supported here (two-grid readback
    — the classic path handles them).

    ``part_split=True`` returns (acc_long, acc_short, overflow) from
    the SAME single fused evaluation (the kernel writes the PM half
    into plane rows 3-5) — for the split-Hamiltonian integrators,
    whose boundary ticks need both halves at identical positions.

    Reference role: CONCEPT's P3M pipeline deposit->FFT->interpolate
    (SURVEY.md §2.2) re-shaped around the MXU.
    """
    from nbody.forces.p3m_columns import build_column_plane, ghost_slots
    from nbody.forces.pm import pm_force_grids_from_rho

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

    plane, ws, nch, ov_b, ov_w, gidx, counts = build_column_plane(
        pos, mass, box, float(r_cut), ncell, CK, W, chunk=chunk
    )
    rho = supercell_deposit_from_plane(
        plane, counts, box=box, nmesh=nmesh, ncell=ncell, stride=stride,
        gz=gz, chunk=chunk, interpret=interpret,
    )
    # G is applied once at the end (the short-range sum is unscaled), so
    # the Poisson source here carries 4 pi rho_mean only
    amp = 4.0 * jnp.pi * jnp.sum(mass) / box**3
    grids = pm_force_grids_from_rho(
        rho, jnp.sum(mass), box, nmesh, source_amp=amp,
        deconvolve_p=deconvolve_p,
        longrange_split=float(r_s) if split == "gaussian" else 0.0,
        spline_split=float(r_cut) if split == "spline" else 0.0,
        grad_order=grad_order,
    )
    subgrids = extract_column_subgrids(grids, ncell, S, ZP)
    out = run_fused_column_plane(
        plane, ws, nch, subgrids, ncell=ncell, stride=stride, W=W,
        maxch=maxch, gz=gz, chunk=chunk, eps2=float(eps) ** 2,
        r_s=float(r_s), r_cut=float(r_cut), split=split,
        softening=softening, S=S, ZP=ZP, scale=float(nmesh / box),
        split_out=part_split, interpret=interpret,
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
        return acc_long, acc_short, ov
    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), dtype)],
        axis=0,
    )
    acc = acc_buckets[gidx]
    return G * acc.astype(pos.dtype), ov
