"""P3M optimization experiments on the real chip (C31 sweep artifact).

Candidate optimizations, each measured against the current production
path at N = 2^20:

  1. mesh/ncell retune: (nmesh, ncell, K) sweep — bucket padding K/occ
     enters the kernel cost quadratically, so configs where capacity
     fits 128 lanes halve the evaluated pairs.
  2. permutation scatter-back: each particle's short-range acc lives in
     exactly one interior bucket slot -> gather N rows by the cell-list
     permutation instead of scatter-adding all M^3*K slots.
  3. sorted CIC deposit: argsort by PM cell + 8 scatter-adds with
     indices_are_sorted=True on an unpadded base-corner grid + 8 rolls.
  4. sorted gather: does pre-sorting particles speed cic_gather_vec?
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
    from nbody.forces.p3m import p3m_acc, p3m_short_params
    from nbody.mesh.cic import cic_deposit

    n = 1 << 20
    box = 500.0
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    # ---- 1. mesh sweep on the CURRENT code path ------------------------
    for nmesh in (128, 144, 160, 168, 192):
        r_s, r_cut, ncell, capacity = p3m_short_params(box, nmesh, n)
        K = -(-capacity // 128) * 128
        timed(
            jax.jit(lambda p, nm=nmesh: p3m_acc(
                p, mass, box, nm, eps=eps, shortrange="cells",
                split="spline")),
            pos,
            label=(f"p3m_acc nmesh={nmesh} ncell={ncell} "
                   f"cap={capacity} K={K}"),
        )

    # ---- 2. permutation scatter-back vs scatter-add --------------------
    # stand-in: gather N rows from a bucket-sized table by a permutation
    ncell, K = 28, 128
    C3 = ncell**3
    table = jnp.asarray(rng.normal(size=(C3 * K, 3)), jnp.float32)
    slots = jnp.asarray(rng.permutation(C3 * K)[:n], jnp.int32)

    def perm_gather(t):
        return t[slots]

    timed(jax.jit(perm_gather), table, label="gather N rows by slot (new)")

    M3K = 30**3 * 128
    accb = jnp.asarray(rng.normal(size=(M3K, 3)), jnp.float32)
    sidx = jnp.asarray(rng.integers(0, n + 1, M3K), jnp.int32)

    def scat_add(a):
        return jnp.zeros((n + 1, 3), jnp.float32).at[sidx].add(a)[:n]

    timed(jax.jit(scat_add), accb, label="scatter-add M^3K rows (old)")

    # ---- 3. deposit variants -------------------------------------------
    nmesh = 160
    timed(jax.jit(lambda p: cic_deposit(p, box, nmesh, weights=mass)),
          pos, label=f"cic_deposit current (nmesh={nmesh})")

    def dep_sorted(p):
        s = p * (nmesh / box)
        i0 = jnp.floor(s)
        f = s - i0
        i0 = i0.astype(jnp.int32) % nmesh
        lin = (i0[:, 0] * nmesh + i0[:, 1]) * nmesh + i0[:, 2]
        order = jnp.argsort(lin)
        lin_s = lin[order]
        f_s = f[order]
        wx = jnp.stack([1.0 - f_s[:, 0], f_s[:, 0]], 1)
        wy = jnp.stack([1.0 - f_s[:, 1], f_s[:, 1]], 1)
        wz = jnp.stack([1.0 - f_s[:, 2], f_s[:, 2]], 1)
        w8 = (wx[:, :, None, None] * wy[:, None, :, None]
              * wz[:, None, None, :]).reshape(-1, 8)
        planes = jnp.zeros((nmesh**3, 8), jnp.float32).at[lin_s].add(
            w8, indices_are_sorted=True)
        g = planes.reshape(nmesh, nmesh, nmesh, 2, 2, 2)
        out = jnp.zeros((nmesh, nmesh, nmesh), jnp.float32)
        for dx in range(2):
            for dy in range(2):
                for dz in range(2):
                    out = out + jnp.roll(
                        g[..., dx, dy, dz], (dx, dy, dz), (0, 1, 2))
        return out

    timed(jax.jit(dep_sorted), pos, label="deposit sorted+seg+roll (new)")

    def dep_sorted_scatter(p):
        # keep the 8-corner scatter, but feed it cell-sorted indices
        s = p * (nmesh / box)
        i0 = jnp.floor(s)
        f = s - i0
        i0 = i0.astype(jnp.int32)
        lin0 = ((i0[:, 0] % nmesh) * nmesh + (i0[:, 1] % nmesh)) * nmesh \
            + (i0[:, 2] % nmesh)
        order = jnp.argsort(lin0)
        f = f[order]
        i0 = i0[order]
        flat = jnp.zeros((nmesh**3,), jnp.float32)
        import itertools
        for dx, dy, dz in itertools.product((0, 1), repeat=2 + 1):
            w = ((f[:, 0] if dx else 1.0 - f[:, 0])
                 * (f[:, 1] if dy else 1.0 - f[:, 1])
                 * (f[:, 2] if dz else 1.0 - f[:, 2]))
            ix = (i0[:, 0] + dx) % nmesh
            iy = (i0[:, 1] + dy) % nmesh
            iz = (i0[:, 2] + dz) % nmesh
            lin = (ix * nmesh + iy) * nmesh + iz
            flat = flat.at[lin].add(w)
        return flat.reshape(nmesh, nmesh, nmesh)

    timed(jax.jit(dep_sorted_scatter), pos,
          label="deposit sorted 8x scatter (alt)")

    def just_argsort(p):
        s = p * (nmesh / box)
        i0 = (s.astype(jnp.int32)) % nmesh
        lin = (i0[:, 0] * nmesh + i0[:, 1]) * nmesh + i0[:, 2]
        return jnp.argsort(lin)

    timed(jax.jit(just_argsort), pos, label="argsort by PM cell (cost)")

    # ---- 4. gather with sorted vs unsorted particles -------------------
    from nbody.mesh.cic import cic_gather_vec

    grids = jnp.asarray(rng.normal(size=(3, nmesh, nmesh, nmesh)),
                        jnp.float32)
    gat = jax.jit(lambda p, g: cic_gather_vec(g, p, box))
    timed(lambda p: gat(p, grids), pos, label="cic_gather_vec unsorted")
    pos_sorted = pos[just_argsort(pos)]
    timed(lambda p: gat(p, grids), pos_sorted, label="cic_gather_vec sorted")


if __name__ == "__main__":
    main()
