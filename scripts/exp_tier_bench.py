"""Compare short-range tiers at bench conditions (N=2^20, uniform random,
128^3 mesh) on the real chip: cells vs columns, to pick bench.py's tier
and quantify the auto-tier regression seen in BENCH_r03-level runs.

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


def timed(fn, pos, box, reps=4, label=""):
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    _sync(fn(pos))
    ts = []
    for _ in range(reps):
        p = jnp.mod(pos + jnp.float32(rng.uniform(1e-4, 1e-2)), box)
        t0 = time.perf_counter()
        out = fn(p)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:32s} {min(ts)*1e3:9.1f} ms  (all: "
          + " ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)
    return min(ts)


def main():
    from nbody.forces.p3m import p3m_acc

    n = 1 << 20
    box, nmesh = 500.0, 128
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    for tier in ("cells", "columns", "supercell"):
        fn = jax.jit(lambda p, t=tier: p3m_acc(
            p, mass, box, nmesh, eps=eps, shortrange=t, split="spline"))
        dt = timed(fn, pos, box, label=f"p3m_acc shortrange={tier}")
        print(f"  -> eff rate {n*n/dt:.3e} interactions/s", flush=True)


if __name__ == "__main__":
    main()
