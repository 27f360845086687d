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


def run_members_batched(
    config: SimulationConfig,
    seeds: np.ndarray,
    A_s_values: np.ndarray,
    base: SimulationConfig | None = None,
):
    """Integrate a batch of B realizations in ONE jitted program.

    vmap over (IC key, amplitude): the whole batch — LPT realization,
    the full KDK ``lax.scan`` — is a single XLA dispatch, the TPU-native
    form of the reference's process-pool ensembles
    (`Ucertain.py:143-146` ProcessPoolExecutor; SURVEY.md §2.3 maps them
    to "vmap over ensemble members").  Through a high-latency TPU relay
    this beats B sequential runs by amortising B x per-dispatch overhead;
    on-device it keeps the chip saturated at small N where one member
    underfills the VPU (the reference's 32^3 pipeline case).

    All members share every static config field except A_s (the traced
    amplitude).  Returns a batched ParticleState (leading axis B).
    """
    import jax
    import jax.numpy as jnp

    from nbody.core.cosmology import TabulatedPowerSpectrum  # noqa: F401
    from nbody.driver.simulate import _linear_power_fn, build_cosmo_force
    from nbody.ic.gaussian import GRFSpec
    from nbody.ic.zeldovich import lpt_ic
    from nbody.integrate.cosmo_stepping import (
        cosmo_kick_drift_factors,
        log_a_steps,
    )

    anchor = base or config
    cosmo = anchor.cosmology()
    power = _linear_power_fn(cosmo, anchor.transfer)
    spec = GRFSpec(nmesh=config.n_side, box=config.box)
    acc_fn = build_cosmo_force(anchor)

    a_grid = log_a_steps(config.a_begin, config.a_end, config.n_steps)
    K1, Dr, K2, _ = cosmo_kick_drift_factors(cosmo, a_grid)

    def one(seed, amp):
        st = lpt_ic(
            jax.random.key(seed), spec, power, cosmo, config.a_begin,
            order=config.lpt_order, amplitude=amp / anchor.A_s,
        )
        dtype = st.pos.dtype
        g = acc_fn(st.pos, st.mass, st.time)

        def body(carry, x):
            s, g = carry
            a1, k1, dr, k2 = x
            p_half = s.vel + g * k1
            pos_new = jnp.mod(s.pos + p_half * dr, config.box)
            g_new = acc_fn(pos_new, s.mass, a1)
            s = s.replace(pos=pos_new, vel=p_half + g_new * k2, time=a1)
            return (s, g_new), None

        xs = (
            jnp.asarray(a_grid[1:], dtype),
            jnp.asarray(K1, dtype),
            jnp.asarray(Dr, dtype),
            jnp.asarray(K2, dtype),
        )
        (final, _), _ = jax.lax.scan(body, (st, g), xs)
        return final

    run = jax.jit(jax.vmap(one))
    return run(
        jnp.asarray(seeds, jnp.uint32),
        jnp.asarray(A_s_values, jnp.float64 if jax.config.jax_enable_x64
                    else jnp.float32),
    )


def run_ensemble(
    config: SimulationConfig,
    n_samples: int,
    workdir: str,
    master_seed: int = 0,
    A_s_values: Sequence[float] | None = None,
    max_retries: int = 3,
    resume: bool = True,
    split_name: str = "Training",
    batch: int = 0,
) -> EnsembleResult:
    """Run n_samples seeded realizations of ``config``.

    A_s_values: per-member amplitudes (None -> all members use config.A_s,
    i.e. a pure realization-scatter ensemble like `Ucertain.py`).  With
    ``batch`` <= 1, members run sequentially (each a jitted program, with
    per-member retry + run.log).  ``batch=B`` > 1 switches to the vmapped
    tier: chunks of B members integrate as ONE dispatch
    (:func:`run_members_batched`), and snapshots/powerspecs are written
    from the host afterwards — dramatically faster for small-N pipeline
    data generation.  Sidecar files (BoxParams / MaxMinParams /
    <split>Params) are written for downstream emulator training
    (SURVEY.md §2.4).
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

    run_dirs = [
        _run_dir(workdir, i, float(A_s_values[i])) for i in range(n_samples)
    ]
    failed, skipped = [], []

    if batch > 1:
        import jax

        from nbody.core.types import ParticleState
        from nbody.driver.simulate import measure_powerspec
        from nbody.io.snapshot import SnapshotMeta, write_snapshot

        cosmo = config.cosmology()
        todo = []
        for i in range(n_samples):
            if resume and os.path.exists(
                _final_snapshot(run_dirs[i], config)
            ):
                skipped.append(i)
            else:
                todo.append(i)
        for lo in range(0, len(todo), batch):
            chunk = todo[lo : lo + batch]
            states = None
            for attempt in range(max_retries):
                try:
                    states = run_members_batched(
                        config, seeds[chunk], A_s_values[chunk], base=config
                    )
                    break
                except Exception:  # noqa: BLE001
                    if attempt == max_retries - 1:
                        failed.extend(chunk)
                        with open(
                            os.path.join(workdir, "failures.log"), "a"
                        ) as f:
                            f.write(
                                f"batch {chunk}:\n{traceback.format_exc()}\n"
                            )
            if states is None:
                continue
            for j, i in enumerate(chunk):
                member = config.replace(A_s=float(A_s_values[i]))
                st = jax.tree_util.tree_map(lambda x: x[j], states)
                rd = run_dirs[i]
                tag = f"a={config.a_end:.2f}"
                if config.output.snapshot:
                    write_snapshot(
                        os.path.join(rd, "snapshots", f"snapshot_{tag}.hdf5"),
                        ParticleState(
                            pos=st.pos, vel=st.vel, mass=st.mass, time=st.time
                        ),
                        SnapshotMeta.from_cosmology(
                            cosmo, config.box, a=config.a_end
                        ),
                    )
                if config.output.powerspec:
                    measure_powerspec(
                        st.pos, member, config.a_end,
                        path=os.path.join(rd, "powerspec", f"powerspec_{tag}"),
                        seed=int(seeds[i]),
                    )
                member.save(os.path.join(rd, "config.json"))
        return EnsembleResult(
            run_dirs=run_dirs,
            params=params,
            seeds=seeds,
            failed=failed,
            skipped=skipped,
            wall_s=time.perf_counter() - t0,
        )

    for i in range(n_samples):
        member = config.replace(A_s=float(A_s_values[i]))
        rd = run_dirs[i]
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
