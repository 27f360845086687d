"""Micro-experiments for the remaining supercell-eval hot spots on chip.

After the round-3 window/weight work the 202 ms eval budget is roughly:
fused kernel ~147, plane build ~93, slot gather ~43 (standalone walls,
which include per-dispatch relay sync).  Variants tried here:

  A. slot gather: current transpose+concat+row-gather vs 3x 1-D
     component gathers + validity mask (no transpose materialization).
  B. fused kernel chunk=128 (z-window shrinks 896 -> 768 but 2x chunk
     iterations) vs the default 256.
  C. build_column_plane internals: sort / row assembly / window tables
     (timed by reconstructing the stages standalone).

Timing per verify SKILL: fresh perturbations, host readback sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.abs(leaf.ravel()[:2]))


def timed(fn, *args, reps=3, label=""):
    _sync(fn(*args))
    ts = []
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for _ in range(reps):
        a0 = args[0]
        if jnp.issubdtype(a0.dtype, jnp.floating):
            a0 = a0 + jnp.asarray(rng.uniform(1e-6, 1e-4), a0.dtype)
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def main():
    from nbody.forces.p3m_columns import (
        _col_z_order, build_column_plane, column_window, ghost_slots,
    )
    from nbody.forces.pm_supercell import (
        extract_column_subgrids,
        p3m_supercell_acc,
        run_fused_column_plane,
        supercell_geometry,
        supercell_params,
    )

    n = 1 << 20
    box, nmesh = 500.0, 128
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
    S, ZP = supercell_geometry(nmesh, ncell)
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    stride = CK + 2 * gz
    Wk = min(-(-W // 128) * 128, stride)
    P2 = (ncell + 2) ** 2
    print(f"N={n} ncell={ncell} CK={CK} W={Wk} stride={stride}", flush=True)

    build = jax.jit(lambda p: build_column_plane(
        p, mass, box, float(r_cut), ncell, CK, Wk))
    plane, ws, nch, _, _, gidx, counts = build(pos)

    # ---- A. slot-gather variants ---------------------------------------
    kern_out = plane  # same shape/layout as the kernel output

    gat_cur = jax.jit(lambda o: jnp.concatenate(
        [o[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), jnp.float32)],
        axis=0)[gidx])
    timed(gat_cur, kern_out, label="A. gather: transpose+concat+row-gather")

    def gat_1d(o):
        valid = gidx < P2 * stride
        gi = jnp.minimum(gidx, P2 * stride - 1)
        comps = [o[c].reshape(P2 * stride)[gi] for c in range(3)]
        return jnp.where(valid[:, None], jnp.stack(comps, axis=1), 0.0)
    timed(jax.jit(gat_1d), kern_out, label="A. gather: 3x 1-D + mask")

    def gat_1d_t(o):
        valid = gidx < P2 * stride
        gi = jnp.minimum(gidx, P2 * stride - 1)
        comps = jnp.stack(
            [o[c].reshape(P2 * stride)[gi] for c in range(3)]
        )  # (3, n) no transpose
        return jnp.where(valid[None, :], comps, 0.0)
    timed(jax.jit(gat_1d_t), kern_out, label="A. gather: 3x 1-D, (3,N) out")

    # ---- B. fused kernel chunk sweep ------------------------------------
    sub = jnp.zeros((P2 - (ncell + 2) * 2 - ncell * 2, 1), jnp.float32)
    sub = jnp.zeros((ncell * ncell * 256, 3 * ZP), jnp.float32)
    for chunk in (256, 128):
        Wc = column_window(box, float(r_cut), CK) if chunk == 256 else (
            -(-(128 + int(2.2 * (r_cut / box) * CK) + 127) // 128) * 128
        )
        Wc = min(Wc, stride)
        bld = jax.jit(lambda p, ck=chunk, wc=Wc: build_column_plane(
            p, mass, box, float(r_cut), ncell, CK, wc, chunk=ck))
        pl_, ws_, nch_, _, _, _, _ = bld(pos)
        kern = jax.jit(lambda pl2, ck=chunk, wc=Wc, w_=ws_, nc_=nch_:
                       run_fused_column_plane(
            pl2, w_, nc_, sub, ncell=ncell, stride=stride, W=wc,
            maxch=CK // ck, gz=gz, chunk=ck, eps2=float(eps) ** 2,
            r_s=float(r_s), r_cut=float(r_cut), split="spline",
            softening="spline", S=S, ZP=ZP, scale=float(nmesh / box)))
        timed(kern, pl_, label=f"B. fused kernel chunk={chunk} W={Wc}")

    # ---- C. plane-build internals ---------------------------------------
    posw = jnp.mod(pos, box).astype(jnp.float32)
    colv = (
        jnp.clip((posw[:, 0] * (ncell / box)).astype(jnp.int32), 0,
                 ncell - 1) * ncell
        + jnp.clip((posw[:, 1] * (ncell / box)).astype(jnp.int32), 0,
                   ncell - 1)
    )
    order_fn = jax.jit(lambda p: _col_z_order(
        (jnp.clip((p[:, 0] * (ncell / box)).astype(jnp.int32), 0,
                  ncell - 1) * ncell
         + jnp.clip((p[:, 1] * (ncell / box)).astype(jnp.int32), 0,
                    ncell - 1)),
        p[:, 2], ncell * ncell, box))
    timed(order_fn, posw, label="C. sort (_col_z_order argsort)")

    order = order_fn(posw)
    gath_rows = jax.jit(
        lambda p: jnp.concatenate([p, mass[:, None]], axis=1)[order]
    )
    timed(gath_rows, posw, label="C. row gather by order (n rows)")

    full_no_sort = jax.jit(lambda p: build_column_plane(
        p, mass, box, float(r_cut), ncell, CK, Wk))
    timed(full_no_sort, posw, label="C. build_column_plane total")


if __name__ == "__main__":
    main()
