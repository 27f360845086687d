"""Stage budget of the SUPERCELL-tier P3M eval at bench conditions
(N=2^20, 128^3 mesh, uniform) on the real chip — where the 214 ms
lives, to aim the next perf push.

Stages (see nbody/forces/pm_supercell.p3m_supercell_acc):
  1. build_column_plane   sort + fused gather assembly + window tables
  2. MXU deposit          supercell_deposit_from_plane (+ overlap-add)
  3. k-space middle       pm_force_grids_from_rho (1 rfftn + 1 irfftn)
  4. subgrid extract      extract_column_subgrids
  5. fused kernel         run_fused_column_plane (short + PM readback)
  6. slot gather          acc_buckets[gidx]

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
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def main():
    from nbody.forces.p3m import p3m_acc
    from nbody.forces.p3m_columns import build_column_plane, ghost_slots
    from nbody.forces.pm_supercell import (
        extract_column_subgrids,
        p3m_supercell_acc,
        run_fused_column_plane,
        supercell_deposit_from_plane,
        supercell_geometry,
        supercell_params,
    )
    from nbody.forces.pm import pm_force_grids_from_rho

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
    print(f"N={n} ncell={ncell} CK={CK} W={Wk} S={S} ZP={ZP} "
          f"stride={stride}", flush=True)

    timed(
        jax.jit(lambda p: p3m_supercell_acc(
            p, mass, box, nmesh, eps=float(eps), r_s=float(r_s),
            r_cut=float(r_cut), split="spline", softening="spline",
            ncell=ncell, col_capacity=CK, window=Wk)[0]),
        pos, label="TOTAL p3m_supercell_acc")

    build = jax.jit(lambda p: build_column_plane(
        p, mass, box, float(r_cut), ncell, CK, Wk))
    timed(lambda p: build(p)[0], pos, label="1. build_column_plane")
    plane, ws, nch, _, _, gidx, counts = build(pos)

    dep = jax.jit(lambda pl: supercell_deposit_from_plane(
        pl, counts, box=box, nmesh=nmesh, ncell=ncell, stride=stride,
        gz=gz))
    timed(dep, plane, label="2. MXU deposit (+overlap-add)")
    rho = dep(plane)

    amp = 4.0 * jnp.pi * jnp.sum(mass) / box**3
    kmid = jax.jit(lambda r: pm_force_grids_from_rho(
        r, jnp.sum(mass), box, nmesh, source_amp=amp,
        spline_split=float(r_cut), grad_order="fd4"))
    timed(kmid, rho, label="3. k-space middle (rfftn+irfftn+fd4)")
    grids = kmid(rho)

    ext = jax.jit(lambda g: extract_column_subgrids(g, ncell, S, ZP))
    timed(ext, grids, label="4. extract_column_subgrids")
    sub = ext(grids)

    kern = jax.jit(lambda pl: run_fused_column_plane(
        pl, ws, nch, sub, ncell=ncell, stride=stride, W=Wk,
        maxch=CK // 256, gz=gz, chunk=256, eps2=float(eps) ** 2,
        r_s=float(r_s), r_cut=float(r_cut), split="spline",
        softening="spline", S=S, ZP=ZP, scale=float(nmesh / box)))
    timed(kern, plane, label="5. fused kernel (short + PM readback)")
    out = kern(plane)

    P2 = (ncell + 2) ** 2
    gat = jax.jit(lambda o: jnp.concatenate(
        [o[:3].reshape(3, P2 * stride).T, jnp.zeros((1, 3), jnp.float32)],
        axis=0)[gidx])
    timed(gat, out, label="6. slot gather")

    # reference walls for context
    timed(
        jax.jit(lambda p: p3m_acc(p, mass, box, nmesh, eps=eps,
                                  shortrange="columns", split="spline")),
        pos, label="(columns tier total)")


if __name__ == "__main__":
    main()
