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

The short-range sum has four tiers, auto-selected by ``p3m_acc``:

  * dense: a Pallas tiled all-pairs kernel (same SoA (4, N) layout as
    nbody.forces.pallas_pp) with the cutoff applied as a mask — every
    pair is *evaluated*; only viable for small N (<= ~64k).
  * cells: ghost-padded cell-plane Pallas kernel over a fixed-capacity
    cell list (this file) — the geometry the masked rung kernels keep.
  * columns: z-sorted (x, y)-column buckets with scalar-prefetched
    z-window tables (nbody.forces.p3m_columns) — the clustered-state
    production tier.
  * supercell: columns + the CIC deposit as per-column MXU
    triangle-weight matmuls + the PM force readback fused into the
    column kernel (nbody.forces.pm_supercell) — the headline tier.
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


def _soft_newton(r2, eps2: float):
    """Softened Newton weight F/(G m r) for one pair, i.e. the 1/r^3
    factor with the chosen softening applied.  ``r2`` does NOT include
    eps^2.  Plummer: 1/(r^2 + eps^2)^(3/2)."""
    r2p = jnp.maximum(r2 + eps2, 1e-30)
    inv_r = jax.lax.rsqrt(r2p)
    return inv_r * inv_r * inv_r


def _soft_newton_spline(r2, eps2: float):
    """Cubic-spline softened Newton weight (CONCEPT's default softening
    kernel; the reference's CONCEPT runs use 'softening_kernel':
    'spline').  eps is the Plummer-EQUIVALENT length; the spline support
    is h = 2.8 eps, and the force is EXACTLY Newtonian for r >= h —
    unlike Plummer, which suppresses pair forces by percents out to
    ~10 eps and systematically weakens halo binding.  Standard cubic
    spline force factors (Monaghan-Lattanzio kernel)."""
    h = 2.8 * math.sqrt(eps2) if eps2 > 0 else 0.0
    r2 = jnp.maximum(r2, 1e-30)
    inv_r = jax.lax.rsqrt(r2)
    newton = inv_r * inv_r * inv_r
    if h == 0.0:
        return newton
    # VPU-lean formulation (this runs per PAIR in the hot kernels):
    # 1/u^3 = (h/r)^3 = h^3 * newton (no divide), polynomials in Horner
    # form.  Algebraically identical to the Monaghan-Lattanzio factors
    # fac_lo = (32/3 + u^2 (32 u - 38.4))/h^3,
    # fac_hi = (64/3 - 48 u + 38.4 u^2 - 32/3 u^3)/h^3 - (1/15)/(u^3 h^3).
    h3_inv = 1.0 / h**3
    u = r2 * inv_r * (1.0 / h)  # r/h
    fac_lo = h3_inv * (32.0 / 3.0 + u * u * (32.0 * u - 38.4))
    fac_hi = h3_inv * (
        64.0 / 3.0 + u * (-48.0 + u * (38.4 - (32.0 / 3.0) * u))
    ) - (1.0 / 15.0) * newton
    return jnp.where(u < 0.5, fac_lo, jnp.where(u < 1.0, fac_hi, newton))


def _newton_fn(softening: str):
    if softening == "plummer":
        return _soft_newton
    if softening == "spline":
        return _soft_newton_spline
    raise ValueError(f"unknown softening kernel {softening!r}")


def _short_weight(r2, eps2: float, r_s: float, r_cut: float,
                  softening: str = "plummer"):
    """Gaussian-split short-range weight C(r) * soft_newton(r), masked
    beyond r_cut.  ``r2`` does NOT include eps^2; the softening kernel
    applies it.  Multiplying the split function by the SOFTENED Newton
    weight keeps every factor finite (no (1-C)/r^3 cancellation against
    the erfc approximation error at r -> 0); the decomposition error
    (1-C)(soft - newton) has support only at r < h where 1-C is
    O((h/2 r_s)^3) — negligible for any sane eps << r_s."""
    r2f = jnp.maximum(r2, 1e-30)
    inv_r = jax.lax.rsqrt(r2f)
    r = r2f * inv_r  # r = sqrt(r2), one rsqrt + one mul
    x = r / (2.0 * r_s)
    expmx2 = jnp.exp(-x * x)
    corr = _erfc_pos(x, expmx2) + (r / r_s) * _INV_SQRT_PI * expmx2
    w = corr * _newton_fn(softening)(r2, eps2)
    return jnp.where(r2f < r_cut * r_cut, w, 0.0)


def _spline_short_weight(r2, eps2: float, r_s: float, r_cut: float,
                         softening: str = "plummer"):
    """Polynomial-spline force-SPLIT short-range weight (r_s unused —
    the spline split has a single scale r_cut).

    Complement of :func:`nbody.forces.pm.spline_longrange_filter`:
    w(r) = soft_newton(r) + g(u^2) / r_cut^3, u = r/r_cut,
    g(u^2) = (-70 + 84 u^2 - 30 u^4)/16 (= q'(u)/u).  Softened Newton
    at r -> 0, EXACTLY zero at r_cut for the unsoftened kernel
    (q'(1) = -1), C^2-smooth in between, and — unlike the Ewald
    erfc/exp weight — costs one rsqrt plus a handful of FMAs per pair,
    so the cell kernels run at the VPU's dense-kernel rate.  ``r2`` does
    NOT include eps^2; the softening kernel applies it.
    """
    r2f = jnp.maximum(r2, 1e-30)
    u2 = r2f * (1.0 / (r_cut * r_cut))
    g = (-70.0 + u2 * (84.0 - u2 * 30.0)) * (1.0 / 16.0)
    w = _newton_fn(softening)(r2, eps2) + g * (1.0 / r_cut**3)
    return jnp.where(r2f < r_cut * r_cut, w, 0.0)


def _weight_fn(split: str, softening: str = "plummer"):
    if split == "gaussian":
        return functools.partial(_short_weight, softening=softening)
    if split == "spline":
        return functools.partial(_spline_short_weight, softening=softening)
    raise ValueError(f"unknown split {split!r}")


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ti", "tj", "interpret", "split",
        "softening",
    ),
)
def p3m_short_acc(
    pos,
    mass,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    ti: int = 512,
    tj: int = 2048,
    interpret: bool | None = None,
    split: str = "gaussian",
    softening: str = "plummer",
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
        r2 = dx * dx + dy * dy + dz * dz
        w = mj * _weight_fn(split, softening)(r2, eps * eps, r_s, r_cut)
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


def p3m_short_direct(pos, mass, box, eps, r_s, r_cut, G=1.0, split="gaussian",
                     softening="plummer"):
    """Dense jnp oracle for the short-range sum (tests)."""
    d = pos[None, :, :] - pos[:, None, :]
    d = d - box * jnp.round(d / box)
    r2 = jnp.sum(d * d, axis=-1)
    w = mass[None, :] * _weight_fn(split, softening)(r2, eps**2, r_s, r_cut)
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
    shortrange: str = "auto",
    split: str = "gaussian",
    softening: str = "plummer",
    capacity: int | None = None,
    window: int | None = None,
    with_overflow: bool = False,
    part: str = "both",
    grad_order: str = "fd4",
):
    """Full P3M acceleration: filtered PM far field + short-range
    correction.

    ``part``: 'both' (full force) | 'long' (mesh far field only) |
    'short' (pair correction only) | 'split' (returns the 3-tuple
    (acc_long, acc_short, overflow) from ONE evaluation — fused on the
    supercell tier, composed elsewhere).  The split halves feed
    :func:`nbody.integrate.cosmo_stepping.run_cosmological_subcycled`,
    which subcycles the short half inside each global step; its
    boundary ticks need both halves at the same positions, which is
    what 'split' serves without a second plane build/deposit.

    Defaults follow the usual P3M practice: r_s = 1.25 cell widths,
    r_cut = 4.5 r_s (C(r_cut) < 2e-3).  ``shortrange`` picks the
    short-range tier: 'allpairs' (dense Pallas kernel, exact for any
    geometry), 'cells' (ghost-padded Pallas cell kernel,
    O(N * 27 * capacity)), 'columns' (z-sorted column packing),
    'supercell' (columns + fused MXU deposit/PM-readback — the
    production tier when the mesh tiles the chaining grid), or 'auto'
    (supercell/columns beyond 64k particles when the box admits a
    >= 3^3 cell grid).  ``split``
    picks the force split: 'gaussian' (Ewald erfc/exp) or 'spline'
    (polynomial — same accuracy class, cheaper per pair on the VPU).

    ``with_overflow=True`` returns (acc, overflow:int32) where overflow
    counts particles whose cell bucket was full this evaluation (their
    short-range force is dropped) — thread it through scans so clustered
    late-time states fail loudly / trigger capacity re-jits instead of
    silently losing force (always 0 for the dense all-pairs tier).
    """
    cell = box / nmesh
    if r_s is None:
        r_s = 1.25 * cell
    if r_cut is None:
        r_cut = 4.5 * r_s

    def _pm_long():
        return pm_acc(
            pos,
            mass,
            box,
            nmesh,
            G=G,
            deconvolve_p=deconvolve_p,
            interlace=interlace,
            longrange_split=float(r_s) if split == "gaussian" else 0.0,
            spline_split=float(r_cut) if split == "spline" else 0.0,
            grad_order=grad_order,
        )

    if part == "long":
        return _pm_long()
    n = pos.shape[0]
    if shortrange == "auto":
        # supercell when the mesh tiles a chaining grid (fused MXU
        # deposit + in-kernel PM readback — 217 vs 281 ms for columns at
        # N=2^20/128^3 on the v5e), columns otherwise: the column-packed
        # kernel is at parity with cells on uniform states and ~5x
        # faster on clustered ones (RESULTS.md round 3)
        if n > 65536:
            shortrange = (
                "supercell"
                if supercell_ncell(box, nmesh, float(r_cut))
                else "columns"
            )
        else:
            shortrange = "allpairs"
    if (
        shortrange in ("cells", "columns", "supercell")
        and box / float(r_cut) < 3.0
    ):
        # box too small for a 3^3 chaining grid — dense tier is exact and
        # at such box/r_cut ratios barely more work anyway
        shortrange = "allpairs"
    if shortrange == "supercell":
        # fused tier: one sort, MXU deposit, PM readback inside the
        # column kernel (nbody.forces.pm_supercell) — interlaced forces
        # included (second deposit + second in-kernel contraction when
        # S <= 12).  Falls back to the columns tier when the chaining
        # grid cannot tile the mesh or for split-force halves
        # (part in 'long'/'short').
        sc_ncell = supercell_ncell(box, nmesh, float(r_cut))
        from nbody.forces.pm_supercell import supercell_stride_ok

        if sc_ncell is not None:
            mean_col = n / sc_ncell**2
            ck = capacity if capacity is not None else (
                -(-int(mean_col + 6.0 * mean_col**0.5 + 8) // 128) * 128
            )
        if sc_ncell is None or not supercell_stride_ok(
            box, float(r_cut), ck
        ):
            # no tiling chaining grid, or a clustered-healed capacity
            # whose stride would OOM the fused kernel's scoped VMEM —
            # the columns tier carries the same physics with leaner
            # blocks
            shortrange = "columns"
        else:
            from nbody.forces.p3m_columns import column_window
            from nbody.forces.pm_supercell import p3m_supercell_acc

            w = window if window else column_window(box, float(r_cut), ck)
            if part in ("both", "split"):
                out = p3m_supercell_acc(
                    pos, mass, box, nmesh, G=G, eps=float(eps),
                    r_s=float(r_s), r_cut=float(r_cut),
                    deconvolve_p=deconvolve_p, split=split,
                    softening=softening, ncell=sc_ncell,
                    col_capacity=ck, window=w, grad_order=grad_order,
                    part_split=(part == "split"),
                    interlace=interlace,
                )
                if part == "split":
                    return out  # (acc_long, acc_short, overflow)
                acc, overflow = out
                if with_overflow:
                    return acc, overflow
                return acc
            # part-half/interlaced fallback on the SAME chaining geometry
            # so capacity knobs stay meaningful across parts
            from nbody.forces.p3m_columns import p3m_short_columns_pallas

            acc_short, overflow = p3m_short_columns_pallas(
                pos, mass, box, float(eps), float(r_s), float(r_cut), G=G,
                ncell=sc_ncell, col_capacity=ck, window=w,
                split=split, softening=softening,
            )
            if part == "split":
                return _pm_long(), acc_short, overflow
            acc = (
                acc_short if part == "short" else _pm_long() + acc_short
            )
            if with_overflow:
                return acc, overflow
            return acc
    if shortrange == "columns":
        from nbody.forces.p3m_columns import columns_stride_ok

        _ck_probe = capacity
        if _ck_probe is None:
            from nbody.forces.p3m_columns import column_params

            _ck_probe = column_params(box, nmesh, n)[3]
        if not columns_stride_ok(box, float(r_cut), _ck_probe):
            # a clustering whose healed column capacity outgrows even
            # the columns kernel's (8, stride) VMEM blocks.  At such
            # densities (~_STRIDE_MAX particles inside one r_cut
            # column) the short-range pair work is ~stride^2 per
            # column on ANY packing — the config needs a larger mesh
            # (smaller r_cut), not a bigger bucket.  Fail loudly
            # instead of compile-OOMing inside Mosaic.
            raise ValueError(
                f"column capacity {_ck_probe} exceeds the column "
                f"kernels' VMEM stride budget — the state is too "
                f"clustered for this mesh; increase mesh_size (shrinks "
                f"r_cut) or use shortrange='cells'"
            )
    if shortrange == "columns":
        from nbody.forces.p3m_columns import (
            column_params,
            column_window,
            p3m_short_columns_pallas,
        )

        _, _, ncell_c, auto_ck, _ = column_params(box, nmesh, n)
        ck = capacity if capacity is not None else auto_ck
        # explicit window (driver prewarm/self-heal sets it from the
        # measured z-run demand — clustered columns need windows the
        # capacity-scaled heuristic can't predict); the kernel clamps it
        # to the column stride internally
        w = window if window else column_window(box, float(r_cut), ck)
        acc_short, overflow = p3m_short_columns_pallas(
            pos, mass, box, float(eps), float(r_s), float(r_cut), G=G,
            ncell=ncell_c, col_capacity=ck, window=w,
            split=split, softening=softening,
        )
    elif shortrange == "cells":
        from nbody.mesh.cells import cell_capacity

        ncell = int(box / float(r_cut))
        if capacity is None:
            capacity = cell_capacity(n, ncell)
        acc_short, overflow = p3m_short_cells_pallas(
            pos, mass, box, float(eps), float(r_s), float(r_cut), G=G,
            ncell=ncell, capacity=capacity, split=split,
            softening=softening,
        )
    else:
        acc_short = p3m_short_acc(
            pos, mass, box, float(eps), float(r_s), float(r_cut), G=G,
            interpret=interpret, split=split, softening=softening,
        )
        overflow = jnp.int32(0)
    if part == "split":
        return _pm_long(), acc_short, overflow
    acc = acc_short if part == "short" else _pm_long() + acc_short
    if with_overflow:
        return acc, overflow
    return acc


# ---------------------------------------------------------------------------
# Cell-list short-range tier (production scale)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ncell", "capacity", "cell_chunk",
        "split", "softening",
    ),
)
def p3m_short_cells(
    pos,
    mass,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    *,
    ncell: int,
    capacity: int,
    cell_chunk: int = 0,
    split: str = "gaussian",
    softening: str = "plummer",
):
    """Short-range P3M force via a fixed-capacity cell list.

    O(N * 27 * capacity) instead of O(N^2): particles are bucketed into an
    (ncell,)*3 grid of side >= r_cut (nbody.mesh.cells), and each cell
    interacts with its 27-neighborhood only.  Periodic wrap is exact —
    neighbor positions are shifted by +/-box instead of min-imaged.  This
    is how CONCEPT's P3M reaches 4:18 min where its PP needs 2d23h for the
    same box (`PPPMP3M/pppmp3mplotter.py:18-22`); here it is the same
    asymptotic trick with static shapes so the whole force stays inside
    one jit/scan.

    Returns (acc (N,3), overflow scalar): particles in over-full cells
    lose their short-range term — check overflow == 0 after IC setup and
    raise ``capacity``/re-jit if not.
    """
    from nbody.mesh.cells import build_cell_list, neighbor_offsets

    if box / ncell < r_cut - 1e-9:
        raise ValueError(
            f"cell size {box / ncell:.3f} < r_cut {r_cut:.3f}: "
            "27-neighborhood would miss pairs"
        )
    n = pos.shape[0]
    dtype = pos.dtype
    eps2 = float(eps) ** 2
    cl = build_cell_list(pos, box, ncell, capacity)

    posw = jnp.mod(pos, box)
    pos_pad = jnp.concatenate(
        [posw, jnp.full((1, 3), -4.0 * r_cut, dtype)], axis=0
    )  # sentinel sits outside every cutoff sphere
    mass_pad = jnp.concatenate([mass, jnp.zeros((1,), dtype)], axis=0)

    bpos = pos_pad[cl.indices]  # (C3, K, 3)
    bmass = mass_pad[cl.indices]  # (C3, K)
    bidx = cl.indices  # (C3, K)

    C3 = ncell**3
    if cell_chunk <= 0:
        cell_chunk = min(C3, max(1, ncell * ncell))
    while C3 % cell_chunk:
        cell_chunk -= 1
    all_ids = jnp.arange(C3, dtype=jnp.int32)

    offs = neighbor_offsets()

    def chunk_body(ids):  # ids: (chunk,)
        cx = ids // (ncell * ncell)
        cy = (ids // ncell) % ncell
        cz = ids % ncell
        cpos = bpos[ids]  # (chunk, K, 3)
        cidx = bidx[ids]  # (chunk, K)
        acc = jnp.zeros_like(cpos)
        for ox, oy, oz in offs:
            nx, ny, nz = cx + ox, cy + oy, cz + oz
            # periodic wrap + the corresponding position shift
            shift = jnp.stack(
                [
                    (nx // ncell).astype(dtype) * box,
                    (ny // ncell).astype(dtype) * box,
                    (nz // ncell).astype(dtype) * box,
                ],
                axis=-1,
            )  # (chunk, 3)
            nid = (
                jnp.mod(nx, ncell) * ncell + jnp.mod(ny, ncell)
            ) * ncell + jnp.mod(nz, ncell)
            npos = bpos[nid] + shift[:, None, :]  # (chunk, K, 3)
            nmass = bmass[nid]
            nidx = bidx[nid]
            d = npos[:, None, :, :] - cpos[:, :, None, :]  # (chunk, K, K, 3)
            r2 = jnp.sum(d * d, axis=-1)
            w = nmass[:, None, :] * _weight_fn(split, softening)(
                r2, eps2, r_s, r_cut
            )
            w = jnp.where(cidx[:, :, None] == nidx[:, None, :], 0.0, w)
            acc = acc + jnp.einsum("ckj,ckjd->ckd", w, d)
        return acc

    accs = jax.lax.map(chunk_body, all_ids.reshape(C3 // cell_chunk, cell_chunk))
    acc_flat = accs.reshape(C3 * capacity, 3)
    out = (
        jnp.zeros((n + 1, 3), dtype)
        .at[bidx.reshape(-1)]
        .add(acc_flat)[:n]
    )
    return G * out, cl.overflow


def supercell_ncell(box: float, nmesh: int, r_cut: float) -> int | None:
    """Chaining-grid side for the supercell tier: the LARGEST divisor of
    nmesh with column side box/ncell >= r_cut, nmesh/ncell <= 13 (so the
    HALOED (S+3)^2 CIC node grid packs into 256 MXU rows — see
    `nbody.forces.pm_supercell.supercell_geometry`) and ncell >= 3 (xy
    ghost ring) — or None when the mesh admits no such tiling (the
    caller falls back to the columns tier)."""
    for c in range(int(box / float(r_cut)), 2, -1):
        if nmesh % c == 0 and nmesh // c <= 13:
            return c
    return None


def p3m_short_params(box: float, nmesh: int, n: int):
    """Default (r_s, r_cut, ncell, capacity) for a box/mesh/particle count
    (r_s = 1.25 mesh cells, r_cut = 4.5 r_s, cells of side >= r_cut)."""
    from nbody.mesh.cells import cell_capacity

    cell = box / nmesh
    r_s = 1.25 * cell
    r_cut = 4.5 * r_s
    ncell = max(3, int(box / r_cut))
    capacity = cell_capacity(n, ncell)
    return r_s, r_cut, ncell, capacity


# ---------------------------------------------------------------------------
# Pallas cell-pair kernel (fastest short-range tier)
# ---------------------------------------------------------------------------


def build_padded_plane(pos, mass, box: float, r_cut: float, ncell: int,
                       capacity: int, valid=None):
    """Bucket particles and assemble the ghost-padded SoA cell plane.

    Returns (plane (8, (ncell+2)^3 * K), overflow, K, gidx).  Plane rows
    are x, y, z, mass, 0, 0, 0, 0; ghost cells replicate the periodic
    wrap with the +/-box shift baked into their positions; padding bucket
    slots hold a far-away zero-mass sentinel.  ``gidx`` (n,) is each
    particle's own slot in the padded plane (overflowed particles hold
    the sentinel M^3 * K) — results come back from bucket tables by a
    GATHER of n rows, ~6x cheaper than scatter-adding all M^3 K slots on
    TPU.  The plane itself is likewise built by a scatter-SET of n rows
    into the interior followed by wrap-padding (contiguous slab copies),
    never by gathering every slot.

    ``valid`` (n,) bool excludes particles from the plane entirely (they
    get the sentinel gidx and do not occupy a bucket slot) — the rung
    tier builds its active-target planes this way with a much smaller
    ``capacity`` than the full plane's.
    """
    from nbody.mesh.cells import build_cell_list

    n = pos.shape[0]
    dtype = jnp.float32
    K = -(-capacity // 128) * 128  # lane-align bucket width
    cl = build_cell_list(pos.astype(dtype), box, ncell, capacity,
                         valid=valid)
    C3 = ncell**3
    M = ncell + 2

    # interior cell id + rank per particle (K-aligned slot width)
    ov = cl.slots >= C3 * capacity
    cid = jnp.minimum(cl.slots // capacity, C3 - 1)
    rank = cl.slots - cid * capacity
    slotK = jnp.where(ov, C3 * K, cid * K + rank)

    # scatter-SET the n particle rows into the interior SoA; padding
    # slots keep the far-away zero-mass sentinel defaults
    posw = jnp.mod(pos, box).astype(dtype)
    data = jnp.concatenate([posw, mass.astype(dtype)[:, None]], axis=1)
    defaults = jnp.asarray([-4.0 * r_cut] * 3 + [0.0], dtype)
    interior = (
        jnp.broadcast_to(defaults, (C3 * K + 1, 4))
        .at[slotK]
        .set(data)[: C3 * K]
        .reshape(ncell, ncell, ncell, K, 4)
    )

    # ghost shell: periodic wrap via contiguous slab copies, with the
    # +/-box shift baked into the copied coordinates
    padded = jnp.pad(interior, ((1, 1),) * 3 + ((0, 0), (0, 0)),
                     mode="wrap")
    for ax in range(3):

        def shifted(sl, delta):
            lo = padded[(slice(None),) * ax + (sl,)]
            return lo.at[..., ax].add(
                jnp.where(lo[..., 3] > 0, delta, 0.0)
            )

        padded = padded.at[(slice(None),) * ax + (0,)].set(
            shifted(0, -box)
        )
        padded = padded.at[(slice(None),) * ax + (M - 1,)].set(
            shifted(M - 1, box)
        )

    plane = jnp.concatenate(
        [
            jnp.moveaxis(padded.reshape(M**3 * K, 4), -1, 0),
            jnp.zeros((4, M**3 * K), dtype),
        ],
        axis=0,
    )

    cx, cy, cz = cid // (ncell * ncell), (cid // ncell) % ncell, cid % ncell
    pad_cid = ((cx + 1) * M + (cy + 1)) * M + (cz + 1)
    gidx = jnp.where(ov, M**3 * K, pad_cid * K + rank)
    return plane, cl.overflow, K, gidx


def run_cell_plane(
    plane, *, nx: int, ncell: int, K: int, eps2: float, r_s: float,
    r_cut: float, split: str = "gaussian", softening: str = "plummer",
    interpret: bool | None = None, jb: int = 0, plane_j=None,
    K_j: int = 0,
):
    """Run the cell-pair kernel over a (slab of a) ghost-padded plane.

    ``plane``: (8, (nx+2) * M * M * K) with M = ncell + 2 — ``nx`` real
    x-slabs plus one ghost/halo slab on each side (nx = ncell for the
    whole box; the distributed slab decomposition passes nx = ncell/D
    with ppermute-filled halos).  Returns an array of the same shape
    whose rows 0..2 hold the accumulated accelerations for the interior
    columns (ghost columns are unwritten).

    ``plane_j``/``K_j``: optional SOURCE plane with its own bucket width
    (same cell geometry).  Default: the plane interacts with itself.
    The rung tier passes a small active-target plane as ``plane`` and
    the full plane as ``plane_j`` — kernel work scales with
    K_target * K_source instead of K_full^2.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M = ncell + 2
    if plane_j is None:
        plane_j = plane
        K_j = K
    elif K_j <= 0:
        raise ValueError("plane_j requires its bucket width K_j")

    def i_map(c2, o2):
        return (0, (c2 // ncell + 1) * M + (c2 % ncell + 1))

    def j_map(c2, o2):
        return (
            0,
            (c2 // ncell + 1 + o2 // 3 - 1) * M + (c2 % ncell + 1 + o2 % 3 - 1),
        )

    return pl.pallas_call(
        functools.partial(
            _cell_kernel,
            ncell=ncell, K=K, K_j=K_j, eps2=eps2, r_s=float(r_s),
            r_cut=float(r_cut), split=split, softening=softening, jb=jb,
        ),
        grid=(nx * ncell, 9),
        in_specs=[
            pl.BlockSpec((8, M * K), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, M * K_j), j_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, M * K), i_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=interpret,
    )(plane, plane_j)


def _cell_kernel(i_ref, j_ref, out_ref, *, ncell, K, K_j, eps2, r_s, r_cut,
                 split="gaussian", softening="plummer", jb=0):
    """One ghost-padded z-column of cells vs one (ox, oy) neighbor column.

    i_ref/out_ref: (8, (ncell+2)*K) padded TARGET columns; j_ref the
    (8, (ncell+2)*K_j) SOURCE column (K_j == K when the plane interacts
    with itself) — rows x, y, z, mass, 0...  Real cells are z slots
    1..ncell; their 3 z-neighbors are the contiguous (K, 3K_j) window of
    the j column.  out accumulates acc over the 9 (ox, oy) grid
    revisits; ghost z slots stay zero.  No self-pair masking is needed:
    d = 0 gives zero force contribution.
    """
    o2 = pl.program_id(1)

    @pl.when(o2 == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    wfn = _weight_fn(split, softening)
    # j-chunk width: must divide 3K_j (K_j % 128 == 0 makes 384 always
    # valid).  Auto: the full 3K_j window while the (K, 3K_j) pair
    # temporaries stay well under the 16 MB scoped-vmem limit, else 384.
    JB = jb if jb else (3 * K_j if K * 3 * K_j * 4 * 8 < 8 * 2**20 else 384)

    # Two rolled fori_loops (not unrolled Python loops): Mosaic allocates
    # kernel stack per unrolled op AND the (K, 3K_j) pair temporaries
    # scale as K*K_j — at the deep bucket capacities the clustering
    # self-heal can reach (K ~ 640+), materialising the full window blows
    # the 16 MB scoped-vmem limit; chunking the j-window keeps the stack
    # O(K * JB) regardless of ncell or capacity.  Dynamic slice starts
    # are multiples of 128: lane-aligned.
    def body(b, carry):
        i_blk = i_ref[:, pl.ds(b * K, K)]
        xi = i_blk[0][:, None]
        yi = i_blk[1][:, None]
        zi = i_blk[2][:, None]

        def inner(c, acc):
            j_blk = j_ref[:, pl.ds((b - 1) * K_j + c * JB, JB)]
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
            return acc + jnp.stack(
                [ax, ay, az, zero, zero, zero, zero, zero]
            )

        upd = jax.lax.fori_loop(
            0, (3 * K_j) // JB, inner, jnp.zeros((8, K), i_blk.dtype)
        )
        out_ref[:, pl.ds(b * K, K)] = out_ref[:, pl.ds(b * K, K)] + upd
        return carry

    jax.lax.fori_loop(1, ncell + 1, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ncell", "capacity", "interpret",
        "split", "softening",
    ),
)
def p3m_short_cells_pallas(
    pos,
    mass,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    *,
    ncell: int,
    capacity: int,
    interpret: bool | None = None,
    split: str = "gaussian",
    softening: str = "plummer",
):
    """Short-range P3M via a Pallas cell-pair kernel.

    Same physics as :func:`p3m_short_cells`, restructured for the TPU
    memory system: one ghost-padded (8, (ncell+2)^3 * K) SoA plane holds
    every bucket (rows x, y, z, mass; ghost cells replicate the periodic
    wrap with the +/-box shift baked into their positions), so every
    i/j/out access in the kernel is a *contiguous* VMEM block and the
    inner loop is pure VPU arithmetic with zero gathers.  Grid =
    (z-columns, 9 (ox, oy) offsets); the output column accumulates in
    VMEM across the 9 revisits; unvisited ghost columns are routed to a
    dropped scatter row.

    Returns (acc (N, 3), overflow) like p3m_short_cells.
    """
    if box / ncell < r_cut - 1e-9:
        raise ValueError(
            f"cell size {box / ncell:.3f} < r_cut {r_cut:.3f}"
        )
    n = pos.shape[0]
    dtype = jnp.float32
    M = ncell + 2

    plane, overflow, K, gidx = build_padded_plane(
        pos, mass, box, r_cut, ncell, capacity
    )
    out = run_cell_plane(
        plane, nx=ncell, ncell=ncell, K=K, eps2=float(eps) ** 2,
        r_s=r_s, r_cut=r_cut, split=split, softening=softening,
        interpret=interpret,
    )

    # gather back: each particle's acceleration lives in exactly one
    # interior bucket slot (gidx); the sentinel row keeps overflowed
    # particles at zero.  A gather of n rows, vs scatter-adding all
    # M^3 K slots (ghost columns never enter — gidx is interior-only).
    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, M**3 * K).T, jnp.zeros((1, 3), dtype)], axis=0
    )
    acc = acc_buckets[gidx]
    return G * acc.astype(pos.dtype), overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "eps", "r_s", "r_cut", "G", "ncell", "capacity",
        "target_capacity", "interpret", "split", "softening",
    ),
)
def p3m_short_cells_pallas_masked(
    pos,
    mass,
    target,
    box: float,
    eps: float,
    r_s: float,
    r_cut: float,
    G: float = 1.0,
    *,
    ncell: int,
    capacity: int,
    target_capacity: int,
    interpret: bool | None = None,
    split: str = "gaussian",
    softening: str = "plummer",
):
    """Short-range P3M force ON a masked subset of particles FROM all.

    The rung tier's hot call (CONCEPT subcycles only its deep rungs —
    run-log "Rung population" lines,
    `TheFeedingPipeline/.../params_id0000….log:6700-6719`): two
    ghost-padded planes share the cell geometry — a compact TARGET plane
    holding only ``target`` particles (bucket width ~K_target) and the
    full SOURCE plane — so kernel work scales with K_target * K_source
    instead of K_source^2.  Non-target rows come back exactly 0.

    Returns (acc (N, 3), overflow_source, overflow_target,
    occupancy_target): source- and target-plane bucket spills are
    reported separately so the driver's self-heal can double the right
    capacity (the target plane is deliberately much smaller), and the
    densest target bucket's TRUE occupancy lets the driver pre-warm the
    target capacity for the NEXT segment instead of paying an in-scan
    overflow (re-jit + segment re-run) when populations grow.
    """
    if box / ncell < r_cut - 1e-9:
        raise ValueError(f"cell size {box / ncell:.3f} < r_cut {r_cut:.3f}")
    n = pos.shape[0]
    dtype = jnp.float32
    M = ncell + 2

    plane_j, ov_j, K_j, _ = build_padded_plane(
        pos, mass, box, r_cut, ncell, capacity
    )
    plane_i, ov_i, K_i, gidx = build_padded_plane(
        pos, mass, box, r_cut, ncell, target_capacity, valid=target
    )
    # densest ACTIVE bucket (one O(N) bincount; sentinel bin dropped)
    s = jnp.mod(pos, box) * (ncell / box)
    c = jnp.clip(s.astype(jnp.int32), 0, ncell - 1)
    cid = (c[:, 0] * ncell + c[:, 1]) * ncell + c[:, 2]
    cid = jnp.where(target, cid, ncell**3)
    occ_i = jnp.bincount(cid, length=ncell**3 + 1)[:-1].max().astype(
        jnp.int32
    )
    out = run_cell_plane(
        plane_i, nx=ncell, ncell=ncell, K=K_i, eps2=float(eps) ** 2,
        r_s=r_s, r_cut=r_cut, split=split, softening=softening,
        interpret=interpret, plane_j=plane_j, K_j=K_j,
    )
    acc_buckets = jnp.concatenate(
        [out[:3].reshape(3, M**3 * K_i).T, jnp.zeros((1, 3), dtype)], axis=0
    )
    acc = acc_buckets[gidx]
    return G * acc.astype(pos.dtype), ov_j, ov_i, occ_i


def p3m_cell_overflow(pos, box: float, nmesh: int, capacity: int | None = None) -> int:
    """Diagnostic: particles whose cell bucket would overflow for the
    auto (or given) capacity at this configuration — clustered late-time
    states can exceed the Poisson-based default.  Call outside the jitted
    stepping loop (e.g. after a run segment) and raise
    ``SimulationConfig.cell_capacity`` if nonzero."""
    from nbody.mesh.cells import build_cell_list, cell_capacity

    n = pos.shape[0]
    cell = box / nmesh
    r_cut = 4.5 * 1.25 * cell
    ncell = int(box / r_cut)
    if ncell < 3:
        return 0
    if capacity is None:
        capacity = cell_capacity(n, ncell)
    cl = build_cell_list(jnp.asarray(pos), box, ncell, capacity)
    return int(cl.overflow)
