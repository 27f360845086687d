"""Headline benchmark: pairwise interactions/sec/chip at N = 1M.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is measured against the north-star target 1e12
interactions/sec/chip (BASELINE.md — the reference never measures this;
its PP solver needs 2d23h for N=64^3 = 2.6e5 particles on a desktop).

NOTE: inputs are perturbed every iteration — the axon relay caches
identical dispatches (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 1.0e12


def main() -> None:
    from nbody.forces.pallas_pp import allpairs_pallas

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 20 if on_tpu else 1 << 12
    eps = 0.05

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0.0, 1.0, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    # warmup / compile
    acc, _ = allpairs_pallas(pos, mass, eps=eps)
    acc.block_until_ready()

    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(reps):
        p = pos + jnp.float32((i + 1) * 1e-6)
        acc, _ = allpairs_pallas(p, mass, eps=eps)
        acc.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    rate = n * n / dt
    print(
        json.dumps(
            {
                "metric": f"pairwise interactions/sec/chip (all-pairs Pallas, N={n})",
                "value": rate,
                "unit": "interactions/s",
                "vs_baseline": rate / TARGET,
            }
        )
    )


if __name__ == "__main__":
    main()
