"""Analysis-layer tests: runtime parsing (C12), accuracy metrics, studies."""

import os

import numpy as np
import pytest

from nbody.analysis import (
    compare_solver_spectra,
    lpt_comparison,
    mean_relative_error,
    nyquist_k,
    parse_runtime,
    relative_error,
    resolution_study,
)
from nbody.driver import SimulationConfig
from nbody.driver.config import OutputConfig

TINY = SimulationConfig(
    n_side=8, box=200.0, pm_grid=16, n_steps=3,
    output=OutputConfig(powerspec_bins=10),
)


class TestParseRuntime:
    def test_reference_formats(self):
        # the reference's exact runtime table (`pppmp3mplotter.py:18-22`)
        assert parse_runtime("2 days, 23:27:37") == pytest.approx(
            2 * 86400 + 23 * 3600 + 27 * 60 + 37
        )
        assert parse_runtime("12.1 s") == pytest.approx(12.1)
        assert parse_runtime("4:18 min") == pytest.approx(4 * 60 + 18)

    def test_more_formats(self):
        assert parse_runtime("90 s") == 90
        assert parse_runtime("5 min") == 300
        assert parse_runtime("01:02:03") == 3723
        assert parse_runtime("2:03") == 123
        with pytest.raises(ValueError):
            parse_runtime("whenever")


class TestMetrics:
    def test_relative_error(self):
        k = np.array([0.1, 0.2, 0.3, 0.5])
        P_th = 100.0 / k
        P = P_th * np.array([1.1, 0.9, 1.0, 2.0])
        km, rel = relative_error(k, P, k, P_th, k_max=0.35)
        assert len(km) == 3
        np.testing.assert_allclose(rel, [0.1, 0.1, 0.0], atol=1e-12)
        assert mean_relative_error(k, P, k, P_th, k_max=0.35) == pytest.approx(
            0.2 / 3
        )

    def test_nyquist(self):
        assert nyquist_k(64, 500.0) == pytest.approx(np.pi * 64 / 500.0)

    def test_signed_deviation(self):
        from nbody.analysis.compare import signed_deviation_percent

        k = np.array([0.1, 0.2, 0.3, 0.5])
        P_th = 100.0 / k
        P = P_th * np.array([1.1, 0.9, 1.0, 2.0])
        km, dev = signed_deviation_percent(k, P, k, P_th, k_max=0.35)
        assert len(km) == 3
        np.testing.assert_allclose(dev, [10.0, -10.0, 0.0], atol=1e-9)


class TestStudies:
    def test_solver_comparison(self, tmp_path):
        fig = str(tmp_path / "solvers.png")
        hist = str(tmp_path / "solver_hist.png")
        out = compare_solver_spectra(
            TINY, solvers=("pm", "p3m"), fig_path=fig, hist_fig_path=hist
        )
        assert set(out) == {"pm", "p3m"}
        for r in out.values():
            assert np.isfinite(r["mean_rel_err"])
            assert r["wall_s"] > 0
            assert (r["P"][r["modes"] > 0] >= 0).all()
            # the signed histogram channel (reference Figur 3)
            assert len(r["k_dev"]) == len(r["signed_dev_percent"])
            assert np.isfinite(r["signed_dev_percent"]).all()
        assert os.path.exists(fig)
        assert os.path.exists(hist)

    def test_lpt_comparison(self, tmp_path):
        fig = str(tmp_path / "lpt.png")
        out = lpt_comparison(TINY, fig_path=fig)
        assert set(out) == {"1lpt", "2lpt"}
        # same phases: spectra should agree at large scales
        r1, r2 = out["1lpt"], out["2lpt"]
        m = (r1["modes"] > 0) & (r1["k"] < 0.1) & (r1["P"] > 0) & (r2["P"] > 0)
        if m.sum():
            ratio = r2["P"][m] / r1["P"][m]
            assert np.all(ratio > 0.5) and np.all(ratio < 2.0)
        assert os.path.exists(fig)

    def test_resolution_study(self, tmp_path):
        fig = str(tmp_path / "res.png")
        out = resolution_study(TINY, n_sides=(8, 16), fig_path=fig)
        assert set(out) == {8, 16}
        assert out[16]["k_ny"] > out[8]["k_ny"]
        assert os.path.exists(fig)


def test_ensemble_scatter(tmp_path):
    """SnapVsPK-style realization scatter across an ensemble."""
    from nbody.analysis import ensemble_scatter
    from nbody.driver import run_ensemble

    root = str(tmp_path / "ens")
    run_ensemble(TINY, 3, workdir=root, master_seed=7)
    fig = str(tmp_path / "scatter.png")
    k, mean, std, n = ensemble_scatter(root, config=TINY, fig_path=fig)
    assert n == 3
    assert (mean >= 0).all() and (std >= 0).all()
    assert std[mean > 0].max() > 0  # different seeds -> nonzero scatter
    assert os.path.exists(fig)


def test_render(tmp_path):
    """Density-projection rendering from state and snapshot."""
    from nbody.analysis import density_projection, save_density_image
    from nbody.driver.cli import main
    from nbody.driver.simulate import realize_ics

    state = realize_ics(TINY, seed=1)
    img = np.asarray(density_projection(state.pos, TINY.box, res=32))
    assert img.shape == (32, 32)
    # CIC projection conserves total weight
    assert img.sum() == pytest.approx(state.n, rel=1e-5)
    p = str(tmp_path / "d.png")
    save_density_image(np.asarray(state.pos), TINY.box, p, res=32)
    assert os.path.exists(p)

    # CLI path over an HDF5 snapshot
    from nbody.driver import run_simulation

    res = run_simulation(TINY, seed=1, workdir=str(tmp_path / "run"))
    rc = main(["render", res.snapshots[-1], "--res", "32",
               "--output", str(tmp_path / "s.png")])
    assert rc == 0 and os.path.exists(str(tmp_path / "s.png"))
