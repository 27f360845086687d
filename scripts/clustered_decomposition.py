"""Decompose the clustered/uniform P3M wall factor into PHYSICAL pair
count vs packing losses (round-4 VERDICT item 2) — CPU-only.

bench.py's clustered co-headline (value_clustered = N^2 / t_clustered)
runs ~4x slower than the uniform headline.  How much of that factor is
genuine work (more pairs inside r_cut in halos) vs column-packing
overhead (padded visits)?  Both terms are computable WITHOUT the chip:

  * true pairs  — KDTree count_neighbors with periodic boxsize at the
    production r_cut, on the exact blob state bench.py times;
  * pair visits — the column tier's analytic visit count
    9 * chunk * W * sum(nch) at the HEALED (CK, W) the production
    kernel would run (build_column_plane is pure JAX gather/sort code,
    no Pallas — it runs on the CPU backend bit-for-bit).

(The earlier attempt to measure this with an on-chip count-mode kernel
at the healed clustered stride OOM'd scoped VMEM — the decomposition
itself never needed the chip.)

Writes tests/data/clustered_decomposition.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _healed_knobs(pos, mass, box, r_cut, ncell, chunk=256):
    """Staged (CK, W) heal on the CPU backend — the same fixed point the
    driver's pre-warm + self-heal reaches on chip."""
    import jax.numpy as jnp

    from nbody.forces.p3m_columns import (
        build_column_plane, column_window, ghost_slots,
    )

    cg = np.clip(
        (np.asarray(pos[:, :2]) * (ncell / box)).astype(np.int64),
        0, ncell - 1,
    )
    occ = int(np.bincount(
        cg[:, 0] * ncell + cg[:, 1], minlength=ncell**2
    ).max())
    CK = -(-int(occ * 1.05 + 4) // 128) * 128
    W = -(-column_window(box, r_cut, CK) // 128) * 128
    for _ in range(8):
        gz = ghost_slots(CK, (r_cut / box) * CK)
        stride = CK + 2 * gz
        W = min(W, stride)
        built = build_column_plane(
            jnp.asarray(pos), jnp.asarray(mass), box, float(r_cut),
            ncell, CK, W, chunk=chunk,
        )
        ovb, ovw = int(built[3]), int(built[4])
        if ovb == 0 and ovw == 0:
            break
        if ovb:
            CK = -(-(CK + max(2 * ovb, CK // 8, 128)) // 128) * 128
        if ovw:
            W += max(-(-ovw // 128) * 128, 256)
    nch = np.asarray(built[2])
    return CK, W, gz, stride, int(nch.sum())


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scipy.spatial import cKDTree

    from nbody.forces.p3m import p3m_short_params, supercell_ncell

    n, box, nmesh = 1 << 20, 500.0, 128
    chunk = 256
    r_s, r_cut, _, _ = p3m_short_params(box, nmesh, n)
    ncell = supercell_ncell(box, nmesh, r_cut)

    rng = np.random.default_rng(7)
    pos_u = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = np.ones((n,), np.float32)

    # bench.py's clustered blob state (same recipe: half background,
    # half in ~2048-particle sigma = 0.01 box blobs)
    n_blob = n // 2
    n_ctr = max(n_blob // 2048, 1)
    centers = rng.uniform(0, box, (n_ctr, 3))
    blob = centers[rng.integers(0, n_ctr, n_blob)] + rng.normal(
        0, 0.01 * box, (n_blob, 3)
    )
    pos_c = np.concatenate([pos_u[: n - n_blob], blob % box]).astype(
        np.float32
    )

    res = {
        "n": n, "nmesh": nmesh, "ncell": ncell, "r_cut": float(r_cut),
        "chunk": chunk,
    }
    for tag, pos in (("uniform", pos_u), ("clustered", pos_c)):
        CK, W, gz, stride, nch_sum = _healed_knobs(
            pos, mass, box, float(r_cut), ncell, chunk
        )
        visits = 9 * chunk * W * nch_sum
        tree = cKDTree(np.asarray(pos, np.float64), boxsize=box)
        # ordered pair interactions (i != j) estimated by sampling:
        # true_pairs = N * E[neighbours(x) within r_cut] over particles
        # x.  The exact tree-vs-tree count_neighbors exceeded 20 min on
        # the blob state (dense-node traversal); 32k sampled query
        # balls give the mean to ~1% (SEM reported) in seconds.
        m = 1 << 15
        rng2 = np.random.default_rng(11)
        sample = rng2.choice(n, m, replace=False)
        counts = np.asarray(
            tree.query_ball_point(
                np.asarray(pos, np.float64)[sample], float(r_cut),
                workers=-1, return_length=True,
            ),
            dtype=np.int64,
        ) - 1
        true_pairs = int(round(n * counts.mean()))
        sem = float(n * counts.std(ddof=1) / np.sqrt(m))
        res[tag] = {
            "CK": CK, "W": W, "stride": stride,
            "pair_visits": int(visits),
            "true_pairs_in_rcut": int(true_pairs),
            "true_pairs_sem": round(sem),
            "visit_efficiency": round(true_pairs / visits, 4),
        }
    u, c = res["uniform"], res["clustered"]
    res["true_pairs_ratio"] = round(
        c["true_pairs_in_rcut"] / u["true_pairs_in_rcut"], 3
    )
    res["visits_ratio"] = round(c["pair_visits"] / u["pair_visits"], 3)
    # the wall ratio itself comes from bench.py's clustered row
    # (BENCH_r{N}.json: p3m_eval_clustered_s / p3m_eval_s)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "clustered_decomposition.json",
    )
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
