"""On-chip experiment: MXU Gram kernel vs round-2 VPU kernel.

Measures pairs/s at bench conditions (N=2^18, box=500, eps=0.148) for a
tile-size sweep of allpairs_pallas_mxu, plus accuracy vs the exact-dx
kernel.  Run: timeout 900 python -u scripts/exp_mxu.py > /tmp/mxu.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbody.forces.pallas_mxu import allpairs_pallas_mxu
from nbody.forces.pallas_pp import allpairs_pallas


def sync(x):
    return np.asarray(x.ravel()[:2])


def timed(fn, pos, box, reps=3):
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    out = fn(pos)
    sync(out[0])
    ts = []
    for _ in range(reps):
        p = jnp.mod(pos + jnp.float32(rng.uniform(1e-4, 1e-2)), box)
        t0 = time.perf_counter()
        out = fn(p)
        sync(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 1 << 18
    box = 500.0
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    dt0 = timed(lambda p: allpairs_pallas(p, mass, eps=eps), pos, box)
    print(f"old VPU kernel: {dt0:.4f} s  {n*n/dt0:.3e} pairs/s", flush=True)

    best = None
    for ti, tj in [(256, 1024), (512, 1024), (256, 2048), (512, 2048),
                   (128, 1024), (512, 512), (1024, 1024), (256, 512)]:
        try:
            dt = timed(
                lambda p: allpairs_pallas_mxu(p, mass, eps=eps, ti=ti, tj=tj),
                pos, box,
            )
        except Exception as e:  # noqa: BLE001
            print(f"mxu ti={ti} tj={tj}: FAIL {type(e).__name__}: {e}",
                  flush=True)
            continue
        rate = n * n / dt
        print(f"mxu ti={ti} tj={tj}: {dt:.4f} s  {rate:.3e} pairs/s",
              flush=True)
        if best is None or rate > best[2]:
            best = (ti, tj, rate)

    if best:
        ti, tj, rate = best
        print(f"BEST mxu ti={ti} tj={tj} rate={rate:.3e} "
              f"({rate / (n*n/dt0):.2f}x old)", flush=True)
        # accuracy vs old kernel at a smaller n (dense f32 reference)
        ns = 1 << 15
        ps, ms = pos[:ns], mass[:ns]
        a_old, _ = allpairs_pallas(ps, ms, eps=eps)
        a_new, _ = allpairs_pallas_mxu(ps, ms, eps=eps, ti=ti, tj=tj)
        a_old = np.asarray(a_old, np.float64)
        a_new = np.asarray(a_new, np.float64)
        err = np.linalg.norm(a_new - a_old, axis=1) / np.maximum(
            np.linalg.norm(a_old, axis=1), 1e-30
        )
        print(f"accuracy vs exact-dx kernel (n={ns}): "
              f"max {err.max():.3e} p99 {np.percentile(err, 99):.3e} "
              f"median {np.median(err):.3e}", flush=True)


if __name__ == "__main__":
    main()
