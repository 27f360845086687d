"""CIC deposit/gather variants at bench scale (N=2^20, 128^3) on chip.

The PM half of the production P3M eval is scatter/gather bound
(deposit 88 ms + vector gather 81 ms of a 268 ms PM part).  Candidates:

  deposit V1: current — 8 sequential scalar scatter-adds (one per corner)
  deposit V3: 8 scatter-adds into 8 independent grids + tree sum
  deposit V4: vmap over 4 particle chunks -> (4, N^3) + sum
  deposit V5: 4 scatter-adds of (n, 2) z-WINDOW rows (z corners are
              contiguous; z-wrap via an nmesh+1 pad column folded back)
  gather  G1: current cic_gather_vec — 8 row-gathers of (n, 3)
  gather  G5: 4 window-gathers of (n, 2, 3) (z pair in one fetch)

Timing per verify SKILL: fresh perturbations, host readback sync.
"""

import os
import sys
import time
import itertools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.abs(leaf.ravel()[:2]))


def timed(fn, *args, reps=3, label=""):
    _sync(fn(*args))
    ts = []
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for _ in range(reps):
        a0 = args[0] + jnp.asarray(rng.uniform(1e-6, 1e-4), args[0].dtype)
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def _fidx(pos, box, nmesh):
    s = pos * (nmesh / box)
    i0 = jnp.floor(s)
    f = s - i0
    return i0.astype(jnp.int32), f


def dep_v5(pos, box, nmesh, weights):
    i0, f = _fidx(pos, box, nmesh)
    z0 = jnp.mod(i0[:, 2], nmesh)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], axis=1)  # (n, 2)
    A = jnp.zeros((nmesh * nmesh, nmesh + 1), pos.dtype)
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1))
    for dx, dy in itertools.product((0, 1), repeat=2):
        wxy = ((f[:, 0] if dx else 1.0 - f[:, 0])
               * (f[:, 1] if dy else 1.0 - f[:, 1]) * weights)
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        row = ix * nmesh + iy
        A = lax.scatter_add(
            A, jnp.stack([row, z0], 1), wxy[:, None] * wz, dnums)
    A = A[:, :nmesh].at[:, 0].add(A[:, nmesh])
    return A.reshape(nmesh, nmesh, nmesh)


def dep_v3(pos, box, nmesh, weights):
    i0, f = _fidx(pos, box, nmesh)
    grids = []
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        w = ((f[:, 0] if dx else 1.0 - f[:, 0])
             * (f[:, 1] if dy else 1.0 - f[:, 1])
             * (f[:, 2] if dz else 1.0 - f[:, 2]) * weights)
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        lin = (ix * nmesh + iy) * nmesh + iz
        grids.append(jnp.zeros((nmesh ** 3,), pos.dtype).at[lin].add(w))
    return sum(grids).reshape(nmesh, nmesh, nmesh)


def dep_v4(pos, box, nmesh, weights, chunks=4):
    from nbody.mesh.cic import cic_deposit
    n = pos.shape[0]
    pc = pos.reshape(chunks, n // chunks, 3)
    wc = weights.reshape(chunks, n // chunks)
    g = jax.vmap(lambda p, w: cic_deposit(p, box, nmesh, weights=w))(pc, wc)
    return g.sum(0)


def gat_g5(grids, pos, box):
    C = grids.shape[0]
    nmesh = grids.shape[1]
    i0, f = _fidx(pos, box, nmesh)
    z0 = jnp.mod(i0[:, 2], nmesh)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], axis=1)
    G = jnp.moveaxis(grids.reshape(C, nmesh * nmesh, nmesh), 0, -1)
    G = jnp.concatenate([G, G[:, :1]], axis=1)  # (N^2, nmesh+1, C)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    out = jnp.zeros((pos.shape[0], C), grids.dtype)
    for dx, dy in itertools.product((0, 1), repeat=2):
        wxy = ((f[:, 0] if dx else 1.0 - f[:, 0])
               * (f[:, 1] if dy else 1.0 - f[:, 1]))
        ix = jnp.mod(i0[:, 0] + dx, nmesh)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        row = ix * nmesh + iy
        v = lax.gather(G, jnp.stack([row, z0], 1), dnums,
                       slice_sizes=(1, 2, C))  # (n, 2, C)
        out = out + wxy[:, None] * (wz[:, 0:1] * v[:, 0] + wz[:, 1:2] * v[:, 1])
    return out


def main():
    from nbody.mesh.cic import cic_deposit, cic_gather_vec

    n = 1 << 20
    box, nmesh = 500.0, 128
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    d1 = jax.jit(lambda p: cic_deposit(p, box, nmesh, weights=mass))
    timed(d1, pos, label="deposit V1 current (8 scalar scatters)")
    d5 = jax.jit(lambda p: dep_v5(p, box, nmesh, mass))
    timed(d5, pos, label="deposit V5 (4 z-window scatters)")
    d3 = jax.jit(lambda p: dep_v3(p, box, nmesh, mass))
    timed(d3, pos, label="deposit V3 (8 grids + sum)")
    d4 = jax.jit(lambda p: dep_v4(p, box, nmesh, mass))
    timed(d4, pos, label="deposit V4 (vmap 4 chunks + sum)")

    # correctness
    g1 = np.asarray(d1(pos))
    for name, fn in (("V5", d5), ("V3", d3), ("V4", d4)):
        g = np.asarray(fn(pos))
        err = np.abs(g - g1).max() / max(g1.max(), 1)
        print(f"  {name} max rel err vs V1: {err:.2e}", flush=True)

    grids = jnp.stack([d1(pos)] * 3)
    G1 = jax.jit(lambda g, p: cic_gather_vec(g, p, box))
    timed(lambda p: G1(grids, p), pos, label="gather G1 current (8 row-gathers)")
    G5 = jax.jit(lambda g, p: gat_g5(g, p, box))
    timed(lambda p: G5(grids, p), pos, label="gather G5 (4 z-window gathers)")
    a = np.asarray(G1(grids, pos))
    b = np.asarray(G5(grids, pos))
    print(f"  G5 max abs err vs G1: {np.abs(a - b).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
