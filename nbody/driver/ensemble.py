"""Seeded ensemble runner: many realizations, resume + retry semantics.

Rebuilds the reference's two CONCEPT orchestration drivers (SURVEY.md §2,
C13/C14): `SnapVsPK/Ucertain.py` (seed-only scatter ensembles, 5x retry,
`ensemble/single` CLI) and `TheFeedingPipeline/NeuNetværk_test.py`
(A_s-varying NN-data ensembles, resume-by-skip, missing-job detection,
up-to-3 re-passes, summary sidecar writers).  Here each "job" is an
in-process jitted simulation, so there is no subprocess/ETXTBSY machinery
to retry around — retries guard only against transient device errors —
and members that differ only in A_s reuse ONE compiled XLA program (the
traced ``amplitude`` path through nbody.ic, instead of one CONCEPT
process per member).
"""

from __future__ import annotations

import dataclasses
import os
import time
import traceback
from typing import Sequence

import numpy as np

from nbody.driver.config import SimulationConfig
from nbody.driver.simulate import SimulationResult, run_simulation
from nbody.io.sidecars import (
    BoxParams,
    MaxMinParams,
    write_box_params,
    write_maxmin_params,
    write_param_table,
)

# Fixed draw seeds, mirroring the reference's pinned 420 (train/val) and 39
# (test) parameter draws (`Cosmo data create (new).py:175-176,235`).
TRAIN_DRAW_SEED = 420
TEST_DRAW_SEED = 39


def make_seeds(n: int, master_seed: int = 0) -> np.ndarray:
    """n independent realization seeds (the role of the reference's
    ``random_seeds{'primordial amplitudes','primordial phases'}`` overrides,
    `Ucertain.py:57-61`; one jax PRNG key covers both)."""
    return np.random.default_rng(master_seed).integers(2**31, size=n)


def draw_A_s(
    n: int,
    center: float = 2.105e-9,
    width: float = 0.6e-9,
    draw_seed: int = TRAIN_DRAW_SEED,
) -> np.ndarray:
    """Uniform A_s draws in [center-width, center+width] with a pinned
    seed — the reference's +/- sigma-band label sampling
    (`Feeder_pipe.py:243-250`: test band inside the training band)."""
    rng = np.random.default_rng(draw_seed)
    return rng.uniform(center - width, center + width, size=n)


@dataclasses.dataclass
class EnsembleResult:
    run_dirs: list
    params: np.ndarray  # (n, 3) — (A_s, n_s, omega_cdm) per member
    seeds: np.ndarray
    failed: list  # indices that failed after all retries
    skipped: list  # indices resumed-by-skip
    wall_s: float


def _run_dir(root: str, idx: int, A_s: float) -> str:
    # directory naming parity with the reference's id0000_A_s... layout
    # (`NeuNetværk_test.py` run dirs, SURVEY.md §0)
    return os.path.join(root, f"id{idx:04d}_A_s{A_s:.6e}")


def _final_snapshot(run_dir: str, config: SimulationConfig) -> str:
    return os.path.join(
        run_dir, "snapshots", f"snapshot_a={config.a_end:.2f}.hdf5"
    )


def find_missing_jobs(
    root: str, config: SimulationConfig, params: np.ndarray
) -> list:
    """Indices whose run dir lacks the final snapshot — offline parity
    with the reference's `find_missing_jobs` (`NeuNetværk_test.py:297-313`)."""
    return [
        i
        for i in range(len(params))
        if not os.path.exists(
            _final_snapshot(_run_dir(root, i, float(params[i, 0])), config)
        )
    ]


def run_ensemble(
    config: SimulationConfig,
    n_samples: int,
    workdir: str,
    master_seed: int = 0,
    A_s_values: Sequence[float] | None = None,
    max_retries: int = 3,
    resume: bool = True,
    split_name: str = "Training",
) -> EnsembleResult:
    """Run n_samples seeded realizations of ``config``.

    A_s_values: per-member amplitudes (None -> all members use config.A_s,
    i.e. a pure realization-scatter ensemble like `Ucertain.py`).  Members
    are run sequentially on the chip (each is a single jitted program;
    ensemble-level parallelism across hosts is a matter of slicing the
    index range).  Sidecar files (BoxParams / MaxMinParams / <split>Params)
    are written for downstream emulator training (SURVEY.md §2.4).
    """
    t0 = time.perf_counter()
    seeds = make_seeds(n_samples, master_seed)
    if A_s_values is None:
        A_s_values = np.full(n_samples, config.A_s)
    A_s_values = np.asarray(A_s_values, dtype=np.float64)
    if len(A_s_values) != n_samples:
        raise ValueError("len(A_s_values) != n_samples")

    params = np.column_stack(
        [A_s_values, np.full(n_samples, config.n_s), np.full(n_samples, config.omega_cdm)]
    )
    os.makedirs(workdir, exist_ok=True)
    z_end = 1.0 / config.a_end - 1.0
    write_box_params(
        os.path.join(workdir, "BoxParams.txt"),
        BoxParams(z=z_end, L=config.box, N=config.n_side),
    )
    write_maxmin_params(
        os.path.join(workdir, "MaxMinParams.txt"),
        MaxMinParams(
            A_s_min=float(A_s_values.min()),
            A_s_max=float(A_s_values.max()),
            n_s_min=config.n_s,
            n_s_max=config.n_s,
            omega_cdm_min=config.omega_cdm,
            omega_cdm_max=config.omega_cdm,
            n_samples=n_samples,
        ),
    )
    write_param_table(os.path.join(workdir, f"{split_name}Params.txt"), params)

    run_dirs, failed, skipped = [], [], []
    for i in range(n_samples):
        member = config.replace(A_s=float(A_s_values[i]))
        rd = _run_dir(workdir, i, float(A_s_values[i]))
        run_dirs.append(rd)
        if resume and os.path.exists(_final_snapshot(rd, member)):
            skipped.append(i)
            continue
        for attempt in range(max_retries):
            try:
                run_simulation(member, seed=int(seeds[i]), workdir=rd, base=config)
                break
            except Exception:  # noqa: BLE001 — retry-then-record, like C13
                if attempt == max_retries - 1:
                    failed.append(i)
                    with open(os.path.join(workdir, "failures.log"), "a") as f:
                        f.write(f"member {i}:\n{traceback.format_exc()}\n")

    return EnsembleResult(
        run_dirs=run_dirs,
        params=params,
        seeds=seeds,
        failed=failed,
        skipped=skipped,
        wall_s=time.perf_counter() - t0,
    )
