"""Roofline ablation of the column pair kernel (VERDICT r4 item 1).

Round 4 reported the kernel at 47% of "its" VPU floor — but that floor
(61 ms = 6.4 ps/pair) was measured on the DENSE all-pairs kernel's
12-op plummer body.  The production column body (polynomial-spline
force split x cubic-spline softening x cutoff mask x windowed
accumulation) issues ~3.5x the arithmetic per pair.  This study:

  1. times the production column kernel at bench conditions (N=2^20,
     128^3 mesh, supercell chaining grid) and counts TRUE pair visits;
  2. measurement-stub ablations that null each body term separately —
     (a) the cubic-spline softening correction (softening='plummer'
     keeps the rsqrt, drops the two Horner branches), (b) the split
     polynomial g(u^2), (c) the r_cut cutoff mask, (d) the SMEM
     window-table read (computed start, same W), (e) a constant weight
     (everything but the pair arithmetic);
  3. re-derives the floor from a DENSE-tile kernel running the SAME
     spline/spline body (no windows, no SMEM, no column padding) —
     the apples-to-apples speed-of-light for this arithmetic.

Usage: python scripts/exp_col_roofline.py [--out FILE]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weight(mode, r2, eps2, r_s, r_cut):
    """Ablation-selectable pair weight.  'full' == production
    (_spline_short_weight + spline softening)."""
    from nbody.forces.p3m import (
        _soft_newton, _soft_newton_spline, _spline_short_weight,
    )

    if mode == "full":
        return _spline_short_weight(r2, eps2, r_s, r_cut, softening="spline")
    if mode == "plummer":  # (a) drop the softening Horner branches
        return _spline_short_weight(r2, eps2, r_s, r_cut, softening="plummer")
    if mode == "nosplit":  # (b) drop the split polynomial
        r2f = jnp.maximum(r2, 1e-30)
        w = _soft_newton_spline(r2, eps2)
        return jnp.where(r2f < r_cut * r_cut, w, 0.0)
    if mode == "nocut":  # (c) drop the cutoff mask
        from nbody.forces.p3m import _soft_newton_spline as soft

        r2f = jnp.maximum(r2, 1e-30)
        u2 = r2f * (1.0 / (r_cut * r_cut))
        g = (-70.0 + u2 * (84.0 - u2 * 30.0)) * (1.0 / 16.0)
        return soft(r2, eps2) + g * (1.0 / r_cut**3)
    if mode == "newton":  # rsqrt-only body (dense-kernel-like)
        return _soft_newton(r2, eps2)
    if mode == "const":  # (e) no weight arithmetic at all
        return r2 * 1e-30
    raise ValueError(mode)


def _kernel(nch_ref, ws_ref, i_ref, j_ref, out_ref, *, stride, W, gz,
            chunk, eps2, r_s, r_cut, mode, nosmem):
    ic = pl.program_id(0)
    o2 = pl.program_id(1)
    from nbody.forces.p3m_columns import _smem_lookup

    @pl.when(o2 == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nch = nch_ref[ic]

    def body(k, carry):
        if nosmem:  # (d): computed start — same W of work, no SMEM read
            start = pl.multiple_of(
                jnp.clip((k * chunk // 128) * 128, 0, stride - W), 128
            )
        else:
            start = pl.multiple_of(_smem_lookup(ws_ref, k), 128)
        i_blk = i_ref[:, pl.ds(gz + k * chunk, chunk)]
        xi = i_blk[0][:, None]
        yi = i_blk[1][:, None]
        zi = i_blk[2][:, None]
        j_blk = j_ref[:, pl.ds(start, W)]
        dx = j_blk[0][None, :] - xi
        dy = j_blk[1][None, :] - yi
        dz = j_blk[2][None, :] - zi
        r2 = dx * dx + dy * dy + dz * dz
        if mode == "count":
            # true-pair counter: accumulates, per i slot, the number of
            # j sources within r_cut (self-pairs included; subtract N
            # at the host).  Decomposes the clustered/uniform wall
            # factor into physical pair count vs padding.
            cnt = jnp.sum(
                jnp.where(
                    (r2 < r_cut * r_cut) & (j_blk[3][None, :] > 0),
                    1.0, 0.0,
                ),
                axis=1,
            )
            zero = jnp.zeros_like(cnt)
            upd = jnp.stack([cnt, zero, zero, zero, zero, zero, zero, zero])
            sl2 = pl.ds(gz + k * chunk, chunk)
            out_ref[:, sl2] = out_ref[:, sl2] + upd
            return carry
        if mode == "softskip":
            # physics-identical spline/spline body, but the softening
            # correction (nonzero only for r < h = 2.8 eps) is gated by
            # a tile-level any() — uniform tiles mostly skip the two
            # Horner branches
            import math as _m

            h = 2.8 * _m.sqrt(eps2) if eps2 > 0 else 0.0
            r2f = jnp.maximum(r2, 1e-30)
            inv_r = jax.lax.rsqrt(r2f)
            newton = inv_r * inv_r * inv_r
            u2 = r2f * (1.0 / (r_cut * r_cut))
            g = (-70.0 + u2 * (84.0 - u2 * 30.0)) * (1.0 / 16.0)
            w0 = newton + g * (1.0 / r_cut**3)

            def corr():
                h3_inv = 1.0 / h**3
                u = r2f * inv_r * (1.0 / h)
                fac_lo = h3_inv * (
                    32.0 / 3.0 + u * u * (32.0 * u - 38.4)
                )
                fac_hi = h3_inv * (
                    64.0 / 3.0 + u * (-48.0 + u * (38.4 - (32.0 / 3.0) * u))
                ) - (1.0 / 15.0) * newton
                soft = jnp.where(
                    u < 0.5, fac_lo, jnp.where(u < 1.0, fac_hi, newton)
                )
                return soft - newton

            c = jax.lax.cond(
                jnp.any(r2f < h * h), corr, lambda: jnp.zeros_like(r2f)
            )
            wv = jnp.where(r2f < r_cut * r_cut, w0 + c, 0.0)
            w = j_blk[3][None, :] * wv
        else:
            w = j_blk[3][None, :] * _weight(mode, r2, eps2, r_s, r_cut)
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        az = jnp.sum(w * dz, axis=1)
        zero = jnp.zeros_like(ax)
        upd = jnp.stack([ax, ay, az, zero, zero, zero, zero, zero])
        sl = pl.ds(gz + k * chunk, chunk)
        out_ref[:, sl] = out_ref[:, sl] + upd
        return carry

    jax.lax.fori_loop(0, nch, body, 0)


def _launch(plane, ws_tab, nch, *, ncell, stride, W, gz, chunk, eps2,
            r_s, r_cut, mode, nosmem):
    P = ncell + 2

    def i_map(ic, o2, *_):
        return (0, (ic // ncell + 1) * P + (ic % ncell + 1))

    def j_map(ic, o2, *_):
        return (
            0,
            (ic // ncell + 1 + o2 // 3 - 1) * P
            + (ic % ncell + 1 + o2 % 3 - 1),
        )

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
            _kernel, stride=stride, W=W, gz=gz, chunk=chunk, eps2=eps2,
            r_s=r_s, r_cut=r_cut, mode=mode, nosmem=nosmem,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        interpret=jax.default_backend() != "tpu",
    )(nch, ws_tab, plane, plane)


def _dense_same_body(n, eps2, r_s, r_cut, mode):
    """Dense-tile kernel with the SAME body (no windows/columns) —
    the apples-to-apples arithmetic floor."""
    ti, tj = 512, 2048

    def kernel(pi_ref, pj_ref, out_ref):
        j = pl.program_id(1)
        xi = pi_ref[0, :][:, None]
        yi = pi_ref[1, :][:, None]
        zi = pi_ref[2, :][:, None]
        dx = pj_ref[0, :][None, :] - xi
        dy = pj_ref[1, :][None, :] - yi
        dz = pj_ref[2, :][None, :] - zi
        r2 = dx * dx + dy * dy + dz * dz
        w = pj_ref[3, :][None, :] * _weight(mode, r2, eps2, r_s, r_cut)
        upd = jnp.stack([
            jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1),
            jnp.sum(w * dz, axis=1), jnp.zeros((ti,), jnp.float32),
        ])

        @pl.when(j == 0)
        def _():
            out_ref[:] = upd

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + upd

    def launch(packed):
        return pl.pallas_call(
            kernel,
            grid=(n // ti, n // tj),
            in_specs=[
                pl.BlockSpec((4, ti), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, tj), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((4, ti), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(packed, packed)

    return launch


def _time(fn, arg, reps=5):
    out = fn(arg)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    ts = []
    for _ in range(reps):
        a = arg + jnp.float32(rng.uniform(1e-6, 1e-4))
        t0 = time.perf_counter()
        out = fn(a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=1 << 20)
    args = ap.parse_args()

    from nbody.forces.p3m import p3m_short_params, supercell_ncell
    from nbody.forces.p3m_columns import (
        _smem_table, build_column_plane, column_window, ghost_slots,
    )

    n, box, nmesh = args.n, 500.0, 128
    eps = 0.03 * box / round(n ** (1 / 3))
    r_s, r_cut, _, _ = p3m_short_params(box, nmesh, n)
    ncell = supercell_ncell(box, nmesh, r_cut)
    mean_col = n / ncell**2
    CK = -(-int(mean_col + 6.0 * mean_col**0.5 + 8) // 128) * 128
    gz = ghost_slots(CK, (r_cut / box) * CK)
    chunk = 256 if CK % 256 == 0 else 128
    stride = CK + 2 * gz
    W = min(-(-column_window(box, r_cut, CK) // 128) * 128, stride)
    maxch = CK // chunk

    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    plane, ws, nch, ov_b, ov_w, gidx, counts = build_column_plane(
        pos, mass, box, float(r_cut), ncell, CK, W, chunk=chunk
    )
    assert int(ov_b) == 0 and int(ov_w) == 0, (int(ov_b), int(ov_w))
    ws_tab = _smem_table(ws, ncell * ncell * 9, maxch)
    pair_visits = int(9 * chunk * W * int(jnp.sum(nch)))

    res = {
        "n": n, "nmesh": nmesh, "ncell": ncell, "CK": CK, "W": W,
        "stride": stride, "chunk": chunk, "gz": gz,
        "pair_visits": pair_visits,
    }
    eps2 = float(eps) ** 2

    variants = [
        ("full", "full", False),
        ("plummer_soften", "plummer", False),
        ("nosplit", "nosplit", False),
        ("nocut", "nocut", False),
        ("newton_only", "newton", False),
        ("const_weight", "const", False),
        ("full_nosmem", "full", True),
        ("softskip", "softskip", False),
    ]
    for name, mode, nosmem in variants:
        fn = jax.jit(
            lambda pln, m=mode, s=nosmem: _launch(
                pln, ws_tab, nch, ncell=ncell, stride=stride, W=W, gz=gz,
                chunk=chunk, eps2=eps2, r_s=float(r_s), r_cut=float(r_cut),
                mode=m, nosmem=s,
            )
        )
        t = _time(fn, plane)
        res[name + "_ms"] = round(t * 1e3, 2)
        res[name + "_ps_per_pair"] = round(t / pair_visits * 1e12, 3)

    # dense same-body floor at 2^18 (pair count 2^36)
    nd = 1 << 18
    packed = jnp.zeros((4, nd), jnp.float32)
    packed = packed.at[:3].set(jnp.asarray(
        rng.uniform(0, box, (nd, 3)), jnp.float32).T)
    packed = packed.at[3].set(1.0)
    for name, mode in [("dense_full", "full"), ("dense_newton", "newton")]:
        fn = jax.jit(_dense_same_body(nd, eps2, float(r_s), float(r_cut), mode))
        t = _time(fn, packed)
        ps = t / (nd * nd) * 1e12
        res[name + "_ms"] = round(t * 1e3, 2)
        res[name + "_ps_per_pair"] = round(ps, 3)

    res["floor_same_body_ms"] = round(
        res["dense_full_ps_per_pair"] * pair_visits * 1e-9, 1
    )
    res["pct_of_same_body_floor"] = round(
        100.0 * res["floor_same_body_ms"] / res["full_ms"], 1
    )

    # ---- clustered decomposition (VERDICT r4 item 2): how much of the
    # clustered/uniform wall factor is PHYSICAL pair count vs padding --
    def count_true_pairs(plane_, ws_tab_, nch_, CK_, W_, gz_, stride_):
        out = jax.jit(
            lambda pln: _launch(
                pln, ws_tab_, nch_, ncell=ncell, stride=stride_, W=W_,
                gz=gz_, chunk=chunk, eps2=eps2, r_s=float(r_s),
                r_cut=float(r_cut), mode="count", nosmem=False,
            )
        )(plane_)
        return float(jnp.sum(out[0])) - n  # minus self pairs

    true_uniform = count_true_pairs(plane, ws_tab, nch, CK, W, gz, stride)
    res["true_pairs_uniform"] = true_uniform
    res["visit_efficiency_uniform"] = round(true_uniform / pair_visits, 4)

    # bench.py's clustered blob state, healed capacities
    n_blob = n // 2
    n_ctr = max(n_blob // 2048, 1)
    centers = rng.uniform(0, box, (n_ctr, 3))
    blob = centers[rng.integers(0, n_ctr, n_blob)] + rng.normal(
        0, 0.01 * box, (n_blob, 3)
    )
    pos_c = np.concatenate(
        [np.asarray(pos[: n - n_blob]), blob % box]
    ).astype(np.float32)
    cg = np.clip((pos_c[:, :2] * (ncell / box)).astype(np.int64),
                 0, ncell - 1)
    occ = int(np.bincount(cg[:, 0] * ncell + cg[:, 1],
                          minlength=ncell**2).max())
    CKc = -(-int(occ * 1.05 + 4) // 128) * 128
    Wc = -(-column_window(box, r_cut, CKc) // 128) * 128
    pc = jnp.asarray(pos_c)
    for _ in range(8):
        gzc = ghost_slots(CKc, (r_cut / box) * CKc)
        stridec = CKc + 2 * gzc
        Wc = min(Wc, stridec)
        built = build_column_plane(
            pc, mass, box, float(r_cut), ncell, CKc, Wc, chunk=chunk
        )
        ovb, ovw = int(built[3]), int(built[4])
        if ovb == 0 and ovw == 0:
            break
        if ovb:
            CKc = -(-(CKc + max(2 * ovb, CKc // 8, 128)) // 128) * 128
        if ovw:
            Wc += max(-(-ovw // 128) * 128, 256)
    if stridec > 16384:
        # the healed clustered stride would blow the kernel's scoped
        # VMEM (measured: 91 MB at stride 32512 on the blob state) —
        # the count decomposition lives in
        # scripts/clustered_decomposition.py (CPU KDTree + analytic
        # visits), which needs no kernel at all
        res["clustered"] = {"skipped": f"stride {stridec} > VMEM budget"}
        line = json.dumps(res)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
        return 0
    planec, wsc, nchc = built[0], built[1], built[2]
    maxchc = CKc // chunk
    ws_tabc = _smem_table(wsc, ncell * ncell * 9, maxchc)
    visits_c = int(9 * chunk * Wc * int(jnp.sum(nchc)))
    fnc = jax.jit(
        lambda pln: _launch(
            pln, ws_tabc, nchc, ncell=ncell, stride=stridec, W=Wc,
            gz=gzc, chunk=chunk, eps2=eps2, r_s=float(r_s),
            r_cut=float(r_cut), mode="full", nosmem=False,
        )
    )
    tc = _time(fnc, planec)
    true_c = count_true_pairs(planec, ws_tabc, nchc, CKc, Wc, gzc, stridec)
    res["clustered"] = {
        "CK": CKc, "W": Wc, "stride": stridec,
        "full_ms": round(tc * 1e3, 2),
        "pair_visits": visits_c,
        "true_pairs": true_c,
        "visit_efficiency": round(true_c / visits_c, 4),
        "wall_ratio_vs_uniform": round(tc * 1e3 / res["full_ms"], 2),
        "visits_ratio": round(visits_c / pair_visits, 2),
        "true_pairs_ratio": round(true_c / max(true_uniform, 1.0), 2),
    }
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
