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

    # clustered-state eval time: the production regime is clustered
    # (halos), where the short-range tiers measured up to 4.7x slower
    # than on uniform states — this row keeps the regime from silently
    # regressing behind the best-case-geometry headline (round-3
    # VERDICT weak #6).  Gaussian blobs over a uniform background, the
    # columns-study geometry.
    dt_p3m_cl, ov_cl = None, 0
    n_blob = n // 2
    # the round-3 columns study's blob state (~2048 particles/blob at
    # sigma = 0.01 box) scaled to this N by blob COUNT — same per-blob
    # density profile, a realistic massive-halo population (the
    # original 64-megablob row packed 4x-denser point masses than any
    # late-time state and healed capacities past every tier's VMEM
    # stride budget)
    n_ctr = max(n_blob // 2048, 1)
    centers = rng.uniform(0, box, (n_ctr, 3))
    blob = centers[rng.integers(0, n_ctr, n_blob)] + rng.normal(
        0, 0.01 * box, (n_blob, 3)
    )
    pos_c = jnp.asarray(
        np.concatenate(
            [np.asarray(pos[: n - n_blob]), blob % box]
        ),
        jnp.float32,
    )
    # capacity/window sized to the clustered state's measured occupancy
    # (the driver's pre-warm would do the same) so the timing reflects
    # the HEALED production config, not a silently overflowing one
    from nbody.forces.p3m import p3m_short_params, supercell_ncell
    from nbody.forces.p3m_columns import column_window

    r_cut = p3m_short_params(box, nmesh, n)[1]
    nct = supercell_ncell(box, nmesh, r_cut) or max(3, int(box / r_cut))
    cgrid = np.clip(
        (np.asarray(pos_c) * (nct / box)).astype(np.int64), 0, nct - 1
    )
    occ = int(np.bincount(
        cgrid[:, 0] * nct + cgrid[:, 1], minlength=nct**2
    ).max())
    cap = -(-int(occ * 1.05 + 4) // 128) * 128
    cid3 = (cgrid[:, 0] * nct + cgrid[:, 1]) * nct + cgrid[:, 2]
    cnt3 = np.bincount(cid3, minlength=nct**3).reshape(nct, nct, nct)
    zrun = int(
        (cnt3 + np.roll(cnt3, 1, 2) + np.roll(cnt3, -1, 2)).max()
    )
    w = max(
        column_window(box, r_cut, cap),
        -(-int(295 + 1.25 * zrun + 260) // 128) * 128,
    )
    tier_cl = "auto"
    if on_tpu:  # interpret-mode CPU smoke skips the second compile
        # staged heal (the driver's loop): evaluate the field-encoded
        # overflow word, widen the knob it names, re-jit, and only time
        # a CLEAN config — bucket/ghost spills ride the high field
        # (heal = capacity, ADDITIVE: the spill count below the clamp
        # is a true count and bounds the worst column's extra need),
        # z-window misses the low field (heal = window).  A capacity
        # large enough to OOM the fused supercell kernel's scoped VMEM
        # drops the row to the columns tier — leaner blocks, same
        # physics (what a production run must do at this clustering).
        prev_b = None
        for _ in range(8):
            p3m_cl = jax.jit(
                lambda p, c=cap, ww=w, t=tier_cl: p3m_acc(
                    p, mass, box, nmesh, eps=eps, shortrange=t,
                    split="spline", capacity=c, window=ww,
                    with_overflow=True,
                )
            )
            try:
                ov_cl = int(p3m_cl(pos_c)[1])
            except Exception:
                if tier_cl == "columns":
                    raise
                tier_cl = "columns"
                continue
            if ov_cl == 0:
                break
            ov_b, ov_w = ov_cl // 65536, ov_cl % 65536
            if ov_b:
                # ghost demand scales WITH the capacity (gz tracks CK),
                # so a pure spill-sized step can chase its own tail —
                # grow by at least 12.5% of the current capacity
                grow = max(2 * ov_b, cap // 8, 128)
                if prev_b is not None and ov_b > prev_b // 2:
                    grow = max(grow, cap // 2)  # not converging: jump
                cap = -(-(cap + grow) // 128) * 128
                prev_b = ov_b
            if ov_w:
                w += max(-(-ov_w // 128) * 128, 256)
        dt_p3m_cl = _timed(p3m_cl, pos_c, box)

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
                # co-headline (round-4 VERDICT item 2): the clustered
                # state IS the production regime — late-time physics is
                # halos, not uniform glass.  Same N^2/t accounting.
                "value_clustered": (
                    n * n / dt_p3m_cl if dt_p3m_cl else None
                ),
                "vs_baseline_clustered": (
                    n * n / dt_p3m_cl / TARGET if dt_p3m_cl else None
                ),
                "p3m_eval_s": round(dt_p3m, 4),
                "p3m_eval_clustered_s": (
                    round(dt_p3m_cl, 4) if dt_p3m_cl else None
                ),
                "clustered_overflow": ov_cl,
                "clustered_tier": tier_cl,
                "exact_allpairs_rate": rate_exact,
                "exact_allpairs_n": n_exact,
            }
        )
    )


if __name__ == "__main__":
    main()
