"""Chip correctness check for the supercell tier: the fused MXU
deposit/readback kernel vs the classic composition (scatter deposit +
columns short range + XLA gather), on the REAL TPU (the unit tests run
the kernels in interpret mode on CPU).

Clustered + uniform states, both splits; reports max relative error
against the classic composition evaluated at f32.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from nbody.forces.p3m import p3m_acc
    from nbody.forces.pm_supercell import supercell_params, p3m_supercell_acc
    from nbody.forces.p3m_columns import p3m_short_columns_pallas
    from nbody.forces.pm import pm_acc
    from nbody.mesh.cic import cic_deposit
    from nbody.forces.pm_supercell import supercell_deposit_from_plane
    from nbody.forces.p3m_columns import build_column_plane, ghost_slots

    box, nmesh = 500.0, 128
    n = 1 << 18
    rng = np.random.default_rng(7)
    # clustered state: blobs over a uniform floor
    centers = rng.uniform(0, box, (64, 3))
    blob = centers[rng.integers(0, 64, n // 2)] + rng.normal(0, 8.0, (n // 2, 3))
    pos = jnp.asarray(
        np.concatenate([blob, rng.uniform(0, box, (n - n // 2, 3))]) % box,
        jnp.float32,
    )
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    eps = 0.03 * box / round(n ** (1 / 3))

    r_s, r_cut, ncell, CK, W = supercell_params(box, nmesh, n)
    # size the capacity to the ACTUAL densest column of this clustered
    # state (the auto 6-sigma Poisson tail under-sizes blob states; the
    # driver would self-heal — here we just start at the healed value)
    cnp = np.asarray(pos)
    cid = ((cnp[:, 0] * (ncell / box)).astype(np.int64) % ncell) * ncell + (
        (cnp[:, 1] * (ncell / box)).astype(np.int64) % ncell
    )
    occ = int(np.bincount(cid, minlength=ncell * ncell).max())
    CK = -(-int(occ * 1.2 + 8) // 128) * 128
    czid = cid * nmesh + ((cnp[:, 2] * (nmesh / box)).astype(np.int64) % nmesh)
    from nbody.forces.p3m_columns import column_window
    W = max(column_window(box, float(r_cut), CK), 1280)
    print(f"geometry: r_cut={r_cut:.2f} ncell={ncell} CK={CK} W={W} "
          f"(densest column {occ})", flush=True)

    # --- deposit alone vs scatter CIC -----------------------------------
    plane, _, _, ovb, _, _, counts = build_column_plane(
        pos, mass, box, float(r_cut), ncell, CK, W)
    gz = ghost_slots(CK, (float(r_cut) / box) * CK)
    g = supercell_deposit_from_plane(
        plane, counts, box=box, nmesh=nmesh, ncell=ncell,
        stride=CK + 2 * gz, gz=gz)
    ref = cic_deposit(pos, box, nmesh, weights=mass)
    dg = np.abs(np.asarray(g) - np.asarray(ref))
    print(f"deposit: ov_b={int(ovb)} max|dg|={dg.max():.3e} "
          f"(grid max {float(ref.max()):.3e}) "
          f"mass err={abs(float(g.sum() - mass.sum())):.3e}", flush=True)

    for split in ("spline", "gaussian"):
        acc, ov = p3m_supercell_acc(
            pos, mass, box, nmesh, eps=float(eps), r_s=float(r_s),
            r_cut=float(r_cut), split=split, softening="spline",
            ncell=ncell, col_capacity=CK, window=W)
        a_long = pm_acc(
            pos, mass, box, nmesh,
            longrange_split=float(r_s) if split == "gaussian" else 0.0,
            spline_split=float(r_cut) if split == "spline" else 0.0)
        a_short, ov2 = p3m_short_columns_pallas(
            pos, mass, box, float(eps), float(r_s), float(r_cut),
            ncell=ncell, col_capacity=CK, window=W, split=split,
            softening="spline")
        ref_a = np.asarray(a_long, np.float64) + np.asarray(a_short, np.float64)
        got = np.asarray(acc, np.float64)
        scale = np.linalg.norm(ref_a, axis=1).max()
        err = np.linalg.norm(got - ref_a, axis=1) / scale
        print(f"split={split}: ov={int(ov)} ov_cols={int(ov2)} "
              f"max rel err={err.max():.3e} median={np.median(err):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
