"""End-to-end pipeline: data generation -> simulations -> ETL -> emulator.

Rebuilds the reference's `Feeder_pipe.py` orchestrator (component C29,
SURVEY.md §2/§3.3): `main_pipeline` chains linear-theory data creation
(±20 sigma A_s train band / ±10 sigma test band around 2.105e-9,
`Feeder_pipe.py:243-250`), simulation-derived delta grids (the reference's
CONCEPT snapshots -> `run_frap_to_delta`), and the EXPERIMENTS registry
(`:143-160`) training the CNN on one data source and testing on another
(CLASS2CONCEPT / CONCEPT3).

Differences by design: the reference loads `Cosmo NN5.py` as *text*,
strips its top-level training block and re-execs it with patched globals
(`import_cosmo_module`, `:45-141`) — here the emulator is a library, so
experiments are plain function calls; and the "CONCEPT" data source is
this framework's own TPU solver ensemble instead of an external binary.
Source layouts are identical (each data root uses the standard
Training & val data / Test data / sidecar layout), so datasets remain
interchangeable with the reference's.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Sequence

import numpy as np

from nbody.driver.config import OutputConfig, SimulationConfig
from nbody.driver.ensemble import (
    TEST_DRAW_SEED,
    TRAIN_DRAW_SEED,
    draw_A_s,
    run_ensemble,
)
from nbody.emulator.data import (
    DeltaDataset,
    create_linear_dataset,
    snapshots_to_delta,
)
from nbody.io.sidecars import (
    BoxParams,
    MaxMinParams,
    write_box_params,
    write_maxmin_params,
    write_param_table,
)

A_S_CENTER = 2.105e-9  # `Feeder_pipe.py:243-250`
A_S_SIGMA = 0.030e-9

#: Experiment registry — train/test data-source pairs (the reference's
#: EXPERIMENTS dict, `Feeder_pipe.py:143-160`; 'linear' is its CLASS path,
#: 'sim' its CONCEPT path).
EXPERIMENTS = {
    "CLASS2SIM": {"train": "linear", "test": "sim"},
    "SIM3": {"train": "sim", "test": "sim"},
}


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    z: float = 0.0
    box: float = 500.0
    n_side: int = 32
    n_trainval: int = 200
    n_test: int = 100
    sigma_train: float = 20.0  # A_s band half-widths in units of A_S_SIGMA
    sigma_test: float = 10.0
    val_size: float = 0.1
    # simulation source settings (the reference's NN.param: P3M, a=0.02->1)
    solver: str = "p3m"
    n_steps: int = 142
    master_seed: int = 0
    # emulator settings (`Feeder_pipe.py:20-22`)
    epochs: int = 1000
    batch_size: int = 16
    lr: float = 4e-3
    uq: str = "MC"
    experiments: Sequence[str] = ("CLASS2SIM", "SIM3")

    @property
    def a_end(self) -> float:
        return 1.0 / (1.0 + self.z)

    def sim_config(self) -> SimulationConfig:
        return SimulationConfig(
            box=self.box,
            n_side=self.n_side,
            solver=self.solver,
            n_steps=self.n_steps,
            a_end=self.a_end,
            output=OutputConfig(snapshot_times=(self.a_end,), powerspec=False),
        )

    def bands(self):
        tr = (
            A_S_CENTER - self.sigma_train * A_S_SIGMA,
            A_S_CENTER + self.sigma_train * A_S_SIGMA,
        )
        te = (
            A_S_CENTER - self.sigma_test * A_S_SIGMA,
            A_S_CENTER + self.sigma_test * A_S_SIGMA,
        )
        return tr, te


def create_simulation_dataset(
    cfg: PipelineConfig,
    out_dir: str,
    n_samples: int,
    A_s_values: np.ndarray,
    test: bool = False,
) -> str:
    """Run a solver ensemble for the given A_s draws and ETL the final
    snapshots into a standard-layout delta-grid data root (the reference's
    CONCEPT branch: `NeuNetværk_test.py` runs + `run_frap_to_delta`)."""
    sim = cfg.sim_config()
    ens_root = os.path.join(out_dir, "runs_test" if test else "runs_trainval")
    run_ensemble(
        sim, n_samples, workdir=ens_root,
        master_seed=cfg.master_seed + (1 if test else 0),
        A_s_values=A_s_values,
        split_name="Test" if test else "Training",
    )
    snapshots_to_delta(
        ens_root, out_dir, nmesh=cfg.n_side, a=cfg.a_end, test=test
    )
    labels = np.column_stack([
        A_s_values,
        np.full(n_samples, sim.n_s),
        np.full(n_samples, sim.omega_cdm),
    ])
    write_box_params(
        os.path.join(out_dir, "BoxParams.txt"),
        BoxParams(cfg.z, cfg.box, cfg.n_side),
    )
    write_maxmin_params(
        os.path.join(out_dir, "MaxMinParams.txt"),
        MaxMinParams(
            float(A_s_values.min()), float(A_s_values.max()),
            sim.n_s, sim.n_s, sim.omega_cdm, sim.omega_cdm, n_samples,
        ),
    )
    if test:
        write_param_table(os.path.join(out_dir, "TestParams.txt"), labels)
    else:
        n_train = int(n_samples * (1.0 - cfg.val_size))
        write_param_table(os.path.join(out_dir, "TrainingParams.txt"), labels[:n_train])
        write_param_table(os.path.join(out_dir, "ValParams.txt"), labels[n_train:])
    return out_dir


def run_experiment(
    name: str,
    cfg: PipelineConfig,
    roots: dict,
    out_dir: str,
    plot: bool = True,
) -> dict:
    """Train on one source, test on another; save metrics + figure
    (reference `run_experiment` + `test_og_plot_models`)."""
    from nbody.emulator.model import CosmoCNN, max_conv_blocks
    from nbody.emulator.train import evaluate_uq, fit

    spec = EXPERIMENTS[name]
    train_ds = DeltaDataset.from_directory(roots[spec["train"]], "train")
    val_ds = DeltaDataset.from_directory(roots[spec["train"]], "val")
    test_ds = DeltaDataset.from_directory(roots[spec["test"]], "test")

    model = CosmoCNN(
        n_out=train_ds.y.shape[1],
        n_conv=min(2, max_conv_blocks(train_ds.dim)),
        heteroscedastic=cfg.uq == "nlll",
        variational=cfg.uq == "bayesian",
    )
    res = fit(
        model, train_ds, val_ds,
        epochs=cfg.epochs, batch_size=cfg.batch_size, lr=cfg.lr,
        seed=cfg.master_seed,
        checkpoint_path=os.path.join(out_dir, f"{name}_params.msgpack"),
    )
    ev = evaluate_uq(model, res.params, test_ds, seed=cfg.master_seed)
    info = {
        "experiment": name,
        "train_source": spec["train"],
        "test_source": spec["test"],
        "uq": cfg.uq,
        "best_val_loss": res.best_val_loss,
        "wall_s": round(res.wall_s, 2),
        **ev.to_json(),
    }
    with open(os.path.join(out_dir, f"{name}_result.json"), "w") as f:
        json.dump(info | {"history": res.history}, f, indent=2)
    if plot:
        _experiment_figure(name, res, ev, out_dir, cfg)
    return info


def _experiment_figure(name, res, ev, out_dir, cfg):
    """Loss curves + pred-vs-true with error bars — the reference's 2x2
    evaluation figure (`Cosmo NN5.py:529-549`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    ax = axes[0]
    ax.plot(res.history["train_loss"], label="train")
    ax.plot(res.history["val_loss"], label="val")
    ax.set(xlabel="epoch", ylabel="loss", yscale="log", title=f"{name} ({cfg.uq})")
    ax.legend()

    ax = axes[1]
    t, m, s = ev.y_true[:, 0], ev.mu[:, 0], ev.sigma_total[:, 0]
    ax.errorbar(t, m, yerr=s, fmt="o", ms=3, alpha=0.7, lw=0.8)
    lo, hi = min(t.min(), m.min()), max(t.max(), m.max())
    ax.plot([lo, hi], [lo, hi], "k--", lw=1)
    ax.set(
        xlabel="true $A_s$", ylabel="predicted $A_s$",
        title=f"dev={ev.abs_dev_percent[0]:.1f}%  "
        f"cov(1σ)={ev.coverage[0, 0]:.2f}",
    )
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{name}_eval.png"), dpi=120)
    plt.close(fig)


def main_pipeline(cfg: PipelineConfig, data_dir: str) -> dict:
    """The full chain (reference `main_pipeline`, `Feeder_pipe.py:405-432`):

      1. linear-theory train/val + test delta volumes ('linear' root);
      2. solver-ensemble train/val + test delta volumes ('sim' root),
         using the SAME pinned A_s draws per split;
      3. each registered experiment: train -> UQ eval -> figure.
    """
    t0 = time.perf_counter()
    (tr_lo, tr_hi), (te_lo, te_hi) = cfg.bands()
    linear_root = os.path.join(data_dir, "linear")
    sim_root = os.path.join(data_dir, "sim")

    # 1. linear data (reference run_data_creation)
    create_linear_dataset(
        linear_root, cfg.n_trainval, z=cfg.z, box=cfg.box, nmesh=cfg.n_side,
        A_s_min=tr_lo, A_s_max=tr_hi, val_size=cfg.val_size,
        master_seed=cfg.master_seed,
    )
    create_linear_dataset(
        linear_root, cfg.n_test, z=cfg.z, box=cfg.box, nmesh=cfg.n_side,
        A_s_min=te_lo, A_s_max=te_hi, test=True,
        master_seed=cfg.master_seed + 10_000,
    )

    # 2. simulation data — same pinned parameter draws per split
    need_sim = any(
        "sim" in EXPERIMENTS[e].values() for e in cfg.experiments
    )
    roots = {"linear": linear_root, "sim": sim_root}
    if need_sim:
        A_s_tv = draw_A_s(
            cfg.n_trainval, center=(tr_lo + tr_hi) / 2,
            width=(tr_hi - tr_lo) / 2, draw_seed=TRAIN_DRAW_SEED,
        )
        A_s_te = draw_A_s(
            cfg.n_test, center=(te_lo + te_hi) / 2,
            width=(te_hi - te_lo) / 2, draw_seed=TEST_DRAW_SEED,
        )
        create_simulation_dataset(cfg, sim_root, cfg.n_trainval, A_s_tv)
        create_simulation_dataset(cfg, sim_root, cfg.n_test, A_s_te, test=True)

    # 3. experiments
    results = {}
    exp_dir = os.path.join(data_dir, "experiments")
    os.makedirs(exp_dir, exist_ok=True)
    for name in cfg.experiments:
        results[name] = run_experiment(name, cfg, roots, exp_dir)
    results["wall_s"] = round(time.perf_counter() - t0, 2)
    with open(os.path.join(data_dir, "pipeline_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results
