"""Emulator tests: data pipeline, models/losses, training loop, UQ eval."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody.emulator import (
    CosmoCNN,
    DeltaDataset,
    augment_batch,
    create_linear_dataset,
    evaluate_uq,
    fit,
    gaussian_nll,
    mse_loss,
    snapshots_to_delta,
)
from nbody.emulator.model import KL_COLLECTION


def _make_dataset(tmp_path, n=12, nmesh=8, band=(1.5e-9, 2.7e-9)):
    root = str(tmp_path / "data")
    labels = create_linear_dataset(
        root, n, z=0.0, box=200.0, nmesh=nmesh,
        A_s_min=band[0], A_s_max=band[1], val_size=0.25,
    )
    create_linear_dataset(
        root, max(4, n // 3), z=0.0, box=200.0, nmesh=nmesh,
        A_s_min=band[0] + 0.2e-9, A_s_max=band[1] - 0.2e-9, test=True,
    )
    return root, labels


class TestDataCreation:
    def test_layout_and_sidecars(self, tmp_path):
        root, labels = _make_dataset(tmp_path)
        assert os.path.exists(
            os.path.join(root, "Training & val data", "delta_train_id-1.npy")
        )
        assert os.path.exists(os.path.join(root, "Test data", "delta_test_id-1.npy"))
        for f in ("BoxParams.txt", "MaxMinParams.txt", "TrainingParams.txt", "ValParams.txt", "TestParams.txt"):
            assert os.path.exists(os.path.join(root, f)), f
        v = np.load(os.path.join(root, "Training & val data", "delta_train_id-3.npy"))
        assert v.shape == (8, 8, 8) and v.dtype == np.float32
        assert abs(v.mean()) < 0.5  # overdensity: zero mean by construction

    def test_resume_by_skip(self, tmp_path):
        root, _ = _make_dataset(tmp_path)
        p = os.path.join(root, "Training & val data", "delta_train_id-2.npy")
        mtime = os.path.getmtime(p)
        create_linear_dataset(
            root, 12, z=0.0, box=200.0, nmesh=8,
            A_s_min=1.5e-9, A_s_max=2.7e-9, val_size=0.25,
        )
        assert os.path.getmtime(p) == mtime  # untouched

    def test_amplitude_variance_scaling(self, tmp_path):
        """var(delta) proportional to A_s — the physical signal the
        emulator regresses."""
        root = str(tmp_path / "d2")
        create_linear_dataset(root, 1, z=0.0, box=200.0, nmesh=16,
                              A_s_min=1e-9, A_s_max=1e-9)
        v1 = np.load(os.path.join(root, "Training & val data", "delta_train_id-1.npy"))
        root2 = str(tmp_path / "d3")
        create_linear_dataset(root2, 1, z=0.0, box=200.0, nmesh=16,
                              A_s_min=4e-9, A_s_max=4e-9)
        v2 = np.load(os.path.join(root2, "Training & val data", "delta_train_id-1.npy"))
        assert v2.var() / v1.var() == pytest.approx(4.0, rel=1e-3)


class TestETL:
    def test_snapshots_to_delta(self, tmp_path):
        from nbody.driver import SimulationConfig, run_ensemble
        from nbody.driver.config import OutputConfig

        cfg = SimulationConfig(
            n_side=8, box=200.0, solver="pm", pm_grid=16, n_steps=3,
            output=OutputConfig(powerspec=False),
        )
        root = str(tmp_path / "ens")
        run_ensemble(cfg, 2, workdir=root)
        out = str(tmp_path / "etl")
        written = snapshots_to_delta(root, out, nmesh=8)
        assert len(written) == 2
        v = np.load(written[0])
        assert v.shape == (8, 8, 8, 1)
        assert abs(v.mean()) < 1e-3  # overdensity integrates to ~0


class TestAugmentation:
    def test_voxel_permutation(self):
        """Flips/rot90s permute voxels — multiset of values is invariant."""
        X = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 8, 8)))
        out = augment_batch(jax.random.key(1), X)
        for i in range(4):
            np.testing.assert_allclose(
                np.sort(np.asarray(out[i]).ravel()),
                np.sort(np.asarray(X[i]).ravel()),
                rtol=1e-6,
            )

    def test_deterministic_given_key(self):
        X = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 8)))
        a = augment_batch(jax.random.key(7), X)
        b = augment_batch(jax.random.key(7), X)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = augment_batch(jax.random.key(8), X)
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_channel_dim_passthrough(self):
        X = jnp.ones((2, 8, 8, 8, 1))
        assert augment_batch(jax.random.key(0), X).shape == (2, 8, 8, 8, 1)


class TestDataset:
    def test_from_directory_and_batches(self, tmp_path):
        root, labels = _make_dataset(tmp_path)
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        test = DeltaDataset.from_directory(root, "test")
        assert len(train) == 9 and len(val) == 3
        assert train.y.shape == (9, 1)  # only A_s varies
        assert test.y.shape[1] == 3  # test keeps 3-wide labels (reference)
        # labels normalised by A_s_max
        np.testing.assert_allclose(
            train.y[:, 0] * train.maxima[0], labels[:9, 0], rtol=1e-6
        )
        batches = list(train.batches(4, seed=0))
        assert len(batches) == 2 and batches[0][0].shape == (4, 8, 8, 8)

    def test_val_ids_offset(self, tmp_path):
        """Val volumes are the files AFTER the train ids (reference
        partition layout)."""
        root, _ = _make_dataset(tmp_path)
        val = DeltaDataset.from_directory(root, "val")
        direct = np.load(
            os.path.join(root, "Training & val data", "delta_train_id-10.npy")
        )
        np.testing.assert_array_equal(val.X[0], direct)


class TestModels:
    def _x(self, b=2, n=16):
        return jnp.asarray(np.random.default_rng(0).normal(size=(b, n, n, n)), jnp.float32)

    def test_forward_shapes(self):
        x = self._x()
        k = jax.random.key(0)
        for kw, width in [
            (dict(n_out=1), 1),
            (dict(n_out=3), 3),
            (dict(n_out=2, heteroscedastic=True), 4),
        ]:
            m = CosmoCNN(**kw)
            v = m.init({"params": k, "dropout": k, "sample": k}, x)
            out = m.apply(v, x)
            assert out.shape == (2, width)

    def test_split_prediction(self):
        m = CosmoCNN(n_out=2, heteroscedastic=True)
        pred = jnp.asarray([[1.0, 2.0, -10.0, 10.0]])
        mu, sigma = m.split_prediction(pred)
        assert mu.shape == (1, 2) and sigma.shape == (1, 2)
        assert float(sigma[0, 0]) < 1e-3 and float(sigma[0, 1]) > 9.0

    def test_variational_kl(self):
        x = self._x()
        k = jax.random.key(0)
        m = CosmoCNN(n_out=1, variational=True, n_conv=1)
        v = m.init({"params": k, "dropout": k, "sample": k}, x)
        out, aux = m.apply(
            v, x, rngs={"dropout": k, "sample": k}, mutable=[KL_COLLECTION]
        )
        kls = jax.tree_util.tree_leaves(aux[KL_COLLECTION])
        assert len(kls) > 0 and all(float(t) >= 0 for t in kls)
        # stochastic: two different sample keys -> different outputs
        out2 = m.apply(
            v, x, rngs={"dropout": k, "sample": jax.random.key(1)},
            mutable=[KL_COLLECTION],
        )[0]
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_losses(self):
        y = jnp.zeros((4, 2))
        assert float(mse_loss(jnp.ones((4, 2)), y)) == pytest.approx(1.0)
        # NLL: tighter sigma around correct mean -> lower loss
        good = jnp.concatenate([jnp.zeros((4, 2)), -3 * jnp.ones((4, 2))], -1)
        bad = jnp.concatenate([jnp.ones((4, 2)), -3 * jnp.ones((4, 2))], -1)
        assert float(gaussian_nll(good, y)) < float(gaussian_nll(bad, y))


class TestTraining:
    @pytest.mark.parametrize("uq", ["MC", "nlll", "bayesian"])
    def test_fit_and_eval(self, tmp_path, uq):
        root, _ = _make_dataset(tmp_path, n=12, nmesh=8)
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        test = DeltaDataset.from_directory(root, "test")
        model = CosmoCNN(
            n_out=1, n_conv=1, filters=4, dense_units=8,
            heteroscedastic=uq == "nlll", variational=uq == "bayesian",
        )
        res = fit(model, train, val, epochs=5, batch_size=4, lr=1e-3, seed=0)
        assert np.isfinite(res.history["train_loss"]).all()
        assert res.best_epoch >= 0
        ev = evaluate_uq(model, res.params, test, n_mc=8, seed=0)
        m = len(test)
        assert ev.mu.shape == (m, 1) and ev.sigma_total.shape == (m, 1)
        assert (ev.sigma_epistemic >= 0).all()
        assert ev.coverage.shape == (1, 3)
        assert ((ev.coverage >= 0) & (ev.coverage <= 1)).all()
        if uq == "nlll":
            assert ev.sigma_aleatoric is not None
            assert (ev.sigma_total >= ev.sigma_epistemic - 1e-12).all()

    def test_data_parallel_matches_single_device(self, tmp_path):
        """fit(devices=8): batch sharded over the CPU mesh, params
        replicated, gradient psums placed by the SPMD partitioner — the
        per-epoch losses must track the single-device run (same batches,
        same keys; only the reduction order differs)."""
        root, _ = _make_dataset(tmp_path, n=16, nmesh=8)
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        model = CosmoCNN(n_out=1, n_conv=1, filters=4, dense_units=8)
        res1 = fit(model, train, val, epochs=3, batch_size=8, lr=1e-3,
                   seed=0, augment=False)
        res8 = fit(model, train, val, epochs=3, batch_size=8, lr=1e-3,
                   seed=0, augment=False, devices=8)
        np.testing.assert_allclose(
            res8.history["train_loss"], res1.history["train_loss"],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            res8.history["val_loss"], res1.history["val_loss"], rtol=1e-4
        )
        with pytest.raises(ValueError):
            fit(model, train, val, epochs=1, batch_size=6, devices=8)

    def test_learns_amplitude(self, tmp_path):
        """var(delta) ~ A_s is an easy signal: training must beat the
        predict-the-mean baseline on val loss."""
        root, _ = _make_dataset(tmp_path, n=24, nmesh=8, band=(0.5e-9, 4.0e-9))
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        model = CosmoCNN(n_out=1, n_conv=1, filters=8, dense_units=16)
        res = fit(model, train, val, epochs=40, batch_size=6, lr=3e-3,
                  seed=0, augment=False)
        baseline = float(np.var(val.y[:, 0] - train.y[:, 0].mean()))
        assert res.best_val_loss < baseline

    def test_scanned_loop_semantics(self, tmp_path):
        """The device-resident scan keeps the host loop's bookkeeping
        contract: best-val tracking, early stop (patience after start),
        plateau-LR reduction — all computed in-carry."""
        root, _ = _make_dataset(tmp_path, n=16, nmesh=8, band=(0.5e-9, 4.0e-9))
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        model = CosmoCNN(n_out=1, n_conv=1, filters=4, dense_units=8)
        res = fit(model, train, val, epochs=60, batch_size=4, lr=5e-2,
                  seed=1, augment=False,
                  early_stop_patience=4, early_stop_start=5,
                  reduce_lr_patience=3, reduce_lr_factor=0.5, min_lr=1e-4,
                  epoch_chunk=16)
        vl = np.asarray(res.history["val_loss"])
        lrs = np.asarray(res.history["lr"])
        n_run = len(vl)
        # best-val contract
        assert res.best_epoch == int(np.argmin(vl))
        assert res.best_val_loss == pytest.approx(float(vl.min()))
        # plateau-LR: lr never increases, respects the floor
        assert (np.diff(lrs) <= 1e-12).all() and lrs.min() >= 1e-4 - 1e-12
        # early stop: if we stopped before the epoch budget, the stop
        # epoch is past start and the last 4 epochs never improved on
        # the running best
        if n_run < 60:
            assert n_run - 1 >= 5
            run_best = np.minimum.accumulate(vl)
            assert (vl[-4:] > run_best[-5:-1]).all()

    def test_scanned_matches_contract_of_host_loop(self, tmp_path):
        """host_loop=True (the streaming fallback for HBM-oversized data)
        still trains and returns the same result structure."""
        root, _ = _make_dataset(tmp_path, n=12, nmesh=8)
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        model = CosmoCNN(n_out=1, n_conv=1, filters=4, dense_units=8)
        res = fit(model, train, val, epochs=3, batch_size=4, lr=1e-3,
                  seed=0, host_loop=True)
        assert len(res.history["val_loss"]) == 3
        assert np.isfinite(res.history["train_loss"]).all()
        res2 = fit(model, train, val, epochs=3, batch_size=4, lr=1e-3,
                   seed=0, epoch_chunk=2)  # uneven final chunk
        assert len(res2.history["val_loss"]) == 3

    def test_checkpoint_roundtrip(self, tmp_path):
        from nbody.emulator.train import load_params, save_params

        root, _ = _make_dataset(tmp_path, n=8, nmesh=8)
        train = DeltaDataset.from_directory(root, "train")
        val = DeltaDataset.from_directory(root, "val")
        model = CosmoCNN(n_out=1, n_conv=1, filters=4, dense_units=8)
        res = fit(model, train, val, epochs=2, batch_size=4, seed=0)
        p = str(tmp_path / "ckpt" / "params.msgpack")
        save_params(p, res.params)
        back = load_params(p, model, dim=8)
        flat1 = jax.tree_util.tree_leaves(res.params)
        flat2 = jax.tree_util.tree_leaves(back)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cli_train(self, tmp_path, capsys):
        from nbody.driver.cli import main

        root, _ = _make_dataset(tmp_path, n=8, nmesh=8)
        rc = main(
            ["train", "--data-dir", root, "--epochs", "2",
             "--batch-size", "4", "--output", str(tmp_path / "out")]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "best_val_loss" in info and "test" in info
        assert os.path.exists(str(tmp_path / "out" / "params.msgpack"))
        assert os.path.exists(str(tmp_path / "out" / "train_result.json"))


class TestMultiParameterDatasets:
    def test_vary_all_three(self, tmp_path):
        """Full (A_s, n_s, omega_cdm) variation — C15's general signature."""
        root = str(tmp_path / "d3")
        labels = create_linear_dataset(
            root, 6, z=0.0, box=200.0, nmesh=8,
            A_s_min=1.8e-9, A_s_max=2.4e-9,
            n_s_min=0.92, n_s_max=1.0,
            omega_cdm_min=0.10, omega_cdm_max=0.14,
            val_size=0.5,
        )
        assert labels.shape == (6, 3)
        assert np.ptp(labels[:, 1]) > 0 and np.ptp(labels[:, 2]) > 0
        train = DeltaDataset.from_directory(root, "train")
        assert train.y.shape == (3, 3)  # all three params vary
        assert len(train.maxima) == 3

    def test_shape_parameters_change_field(self, tmp_path):
        """Different omega_cdm -> different transfer -> different delta."""
        r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
        create_linear_dataset(r1, 1, z=0.0, box=200.0, nmesh=16,
                              omega_cdm_min=0.08, omega_cdm_max=0.08)
        create_linear_dataset(r2, 1, z=0.0, box=200.0, nmesh=16,
                              omega_cdm_min=0.16, omega_cdm_max=0.16)
        v1 = np.load(os.path.join(r1, "Training & val data", "delta_train_id-1.npy"))
        v2 = np.load(os.path.join(r2, "Training & val data", "delta_train_id-1.npy"))
        assert not np.allclose(v1, v2)
        # same phases though: fields are correlated
        c = np.corrcoef(v1.ravel(), v2.ravel())[0, 1]
        assert c > 0.8


def test_cli_sweep(tmp_path, capsys):
    """C27: hyperparameter grid sweep via the CLI."""
    from nbody.driver.cli import main

    root, _ = _make_dataset(tmp_path, n=8, nmesh=8)
    rc = main(
        ["sweep", "--data-dir", root, "--batch-sizes", "4",
         "--lrs", "1e-3", "3e-3", "--epochs", "2",
         "--output", str(tmp_path / "sw")]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.asarray(info["A_dev"]).shape == (1, 2, 1)
    assert os.path.exists(str(tmp_path / "sw" / "sweep_A_dev.npy"))
