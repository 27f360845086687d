"""Stage budget of the COLUMNS-tier P3M eval at bench conditions
(N=2^20, 128^3 mesh, uniform) on the real chip — where the 511 ms
lives now that the cell kernel's padding waste is gone.

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
    from nbody.forces.p3m import p3m_acc, p3m_short_params
    from nbody.forces.p3m_columns import (
        build_column_plane, column_params, p3m_short_columns_pallas,
    )
    from nbody.mesh.cic import cic_deposit, cic_gather_vec

    n = 1 << 20
    box, nmesh = 500.0, 128
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    r_s, r_cut, ncell, ck, w = column_params(box, nmesh, n)
    print(f"N={n} ncell={ncell} CK={ck} W={w}", flush=True)

    t_total = timed(
        jax.jit(lambda p: p3m_acc(p, mass, box, nmesh, eps=eps,
                                  shortrange="columns", split="spline")),
        pos, label="TOTAL p3m_acc columns")

    t_short = timed(
        jax.jit(lambda p: p3m_short_columns_pallas(
            p, mass, box, float(eps), float(r_s), float(r_cut),
            ncell=ncell, col_capacity=ck, window=w, split="spline")[0]),
        pos, label="short total (build+kernel+gather)")

    t_build = timed(
        jax.jit(lambda p: build_column_plane(
            p, mass, box, float(r_cut), ncell, ck, w)[0]),
        pos, label="build_column_plane")

    # build WITHOUT window tables / overflow counting (plane only):
    # approximate by timing the window-table part standalone
    def tables_only(p):
        out = build_column_plane(p, mass, box, float(r_cut), ncell, ck, w)
        return out[1], out[4]

    timed(jax.jit(tables_only), pos, label="build (ws+ov_w output only)")

    # PM side
    dep = jax.jit(lambda p: cic_deposit(p, box, nmesh, weights=mass))
    t_dep = timed(dep, pos, label="cic_deposit")
    grid = dep(pos)
    grids = jnp.stack([grid, grid, grid])
    timed(jax.jit(lambda g, p: cic_gather_vec(g, p, box)),
          grids, pos, label="cic_gather_vec")

    # pure long-range
    timed(jax.jit(lambda p: p3m_acc(
        p, mass, box, nmesh, eps=eps, split="spline", part="long")),
        pos, label="PM long part only")

    print(f"\nshort-range overhead (total-short): "
          f"{(t_total - t_short)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
