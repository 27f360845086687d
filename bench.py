"""Headline benchmark: effective pairwise interactions/sec/chip at N = 1M.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The metric is the production-solver rate: one full P3M gravity evaluation
(PM far field on a 128^3 mesh + column short-range correction, fused
supercell tier: MXU CIC deposit + in-kernel PM readback) for
2^20 particles delivers the same physics as N^2 pairwise interactions, so
the effective rate is N^2 / t_eval — the same accounting by which the
reference's CONCEPT P3M beats its PP solver 1000x at equal accuracy
(PP 2d23h vs P3M 4:18 for N=64^3, `PPPMP3M/pppmp3mplotter.py:18-22`;
BASELINE.md).  The exact dense-kernel rate (every pair actually
evaluated by the Pallas all-pairs kernel) is reported alongside.

Timing notes (see .claude/skills/verify/SKILL.md): the axon relay caches
identical dispatches AND `block_until_ready` is not an execution barrier
through it — inputs are perturbed with fresh random offsets per rep and
completion is forced by a host readback of an output slice.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 1.0e12  # interactions/sec/chip (BASELINE.md north star)


def _timed(fn, pos, box, reps=3):
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    out = fn(pos)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:2])  # warm + sync
    times = []
    for _ in range(reps):
        p = jnp.mod(pos + jnp.float32(rng.uniform(1e-4, 1e-2)), box)
        t0 = time.perf_counter()
        out = fn(p)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    from nbody.forces.p3m import p3m_acc
    from nbody.forces.pallas_pp import allpairs_pallas

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 20 if on_tpu else 1 << 12
    n_exact = 1 << 18 if on_tpu else 1 << 12
    box = 500.0
    nmesh = 128 if on_tpu else 16
    eps = 0.03 * box / round(n ** (1 / 3))

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    # production P3M rate (PM + Pallas cell-list short range, polynomial
    # spline force split)
    p3m = jax.jit(
        lambda p: p3m_acc(
            p, mass, box, nmesh, eps=eps, shortrange="auto", split="spline"
        )
    )
    dt_p3m = _timed(p3m, pos, box)
    rate_eff = n * n / dt_p3m

    # exact dense all-pairs rate
    pos_e = pos[:n_exact]
    mass_e = mass[:n_exact]
    dt_pp = _timed(lambda p: allpairs_pallas(p, mass_e, eps=eps)[0], pos_e, box)
    rate_exact = n_exact * n_exact / dt_pp

    print(
        json.dumps(
            {
                "metric": (
                    f"effective pairwise interactions/sec/chip "
                    f"(P3M {nmesh}^3 mesh, fused supercell MXU deposit + "
                    f"spline column kernel, N={n})"
                ),
                "value": rate_eff,
                "unit": "interactions/s",
                "vs_baseline": rate_eff / TARGET,
                "p3m_eval_s": round(dt_p3m, 4),
                "exact_allpairs_rate": rate_exact,
                "exact_allpairs_n": n_exact,
            }
        )
    )


if __name__ == "__main__":
    main()
