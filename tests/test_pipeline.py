"""End-to-end pipeline orchestrator tests (component C29)."""

import json
import os

import numpy as np
import pytest

from nbody.driver.pipeline import (
    EXPERIMENTS,
    PipelineConfig,
    main_pipeline,
)

TINY = PipelineConfig(
    n_side=8, box=200.0, n_trainval=8, n_test=4, n_steps=3,
    epochs=3, batch_size=4, solver="pm", val_size=0.25,
)


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    """One shared tiny pipeline execution (it costs minutes)."""
    d = str(tmp_path_factory.mktemp("pipe"))
    return d, main_pipeline(TINY, d)


def test_main_pipeline(pipeline_run):
    d, results = pipeline_run
    for name in TINY.experiments:
        assert name in results
        r = results[name]
        assert np.isfinite(r["best_val_loss"])
        assert np.isfinite(r["abs_dev_percent"]).all()
        assert os.path.exists(os.path.join(d, "experiments", f"{name}_eval.png"))
        assert os.path.exists(os.path.join(d, "experiments", f"{name}_result.json"))
        assert os.path.exists(os.path.join(d, "experiments", f"{name}_params.msgpack"))
    # both data roots in the standard layout
    for root in ("linear", "sim"):
        assert os.path.exists(os.path.join(d, root, "MaxMinParams.txt"))
        assert os.path.exists(os.path.join(d, root, "TestParams.txt"))
    assert os.path.exists(os.path.join(d, "pipeline_results.json"))


def test_same_parameter_draws_across_sources(pipeline_run):
    """CLASS2SIM compares like-for-like: linear and sim test sets use the
    same pinned A_s draws (reference seeds 420/39)."""
    d, _ = pipeline_run
    lin = np.loadtxt(os.path.join(d, "linear", "TestParams.txt"), skiprows=1, ndmin=2)
    sim = np.loadtxt(os.path.join(d, "sim", "TestParams.txt"), skiprows=1, ndmin=2)
    np.testing.assert_allclose(lin[:, 0], sim[:, 0], rtol=1e-12)


def test_experiment_registry():
    assert set(EXPERIMENTS) == {"CLASS2SIM", "SIM3"}
    for spec in EXPERIMENTS.values():
        assert spec["train"] in ("linear", "sim")
        assert spec["test"] in ("linear", "sim")


def test_cli_pipeline(tmp_path, capsys):
    from nbody.driver.cli import main

    rc = main(
        ["pipeline", "--data-dir", str(tmp_path), "--n-side", "8",
         "--box", "200", "--n-trainval", "8", "--n-test", "4",
         "--n-steps", "3", "--solver", "pm", "--epochs", "2",
         "--batch-size", "4", "--experiments", "SIM3"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "SIM3" in out and "CLASS2SIM" not in out


def test_max_conv_blocks():
    from nbody.emulator.model import max_conv_blocks

    assert max_conv_blocks(8) == 1
    assert max_conv_blocks(16) == 2
    assert max_conv_blocks(32) == 3
    with pytest.raises(ValueError):
        from nbody.emulator.model import CosmoCNN
        import jax, jax.numpy as jnp

        m = CosmoCNN(n_out=1, n_conv=2)
        k = jax.random.key(0)
        m.init({"params": k, "dropout": k, "sample": k}, jnp.zeros((1, 8, 8, 8)))
