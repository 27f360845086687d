"""CONCEPT powerspec_options parity (component list VERDICT missing #6).

The reference's measurement machinery (`SnapVsPK/Uncertain.param:83-107`)
uses variable bins-per-decade edges, k_max='nyquist', and a realization
correction; these tests pin our equivalents' semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nbody.driver.config import OutputConfig, SimulationConfig
from nbody.driver.simulate import measure_powerspec, realize_ics
from nbody.mesh.spectrum import concept_bin_edges, power_spectrum


class TestConceptBinEdges:
    BOX, NMESH = 1000.0, 64

    def test_density_follows_anchors(self):
        edges = concept_bin_edges(
            self.BOX, self.NMESH, ((4.0, 4.0), (100.0, 40.0)), "nyquist"
        )
        k_min = 2 * np.pi / self.BOX
        ratios = edges[2:] / edges[1:-1]
        # coarse (4/decade) at the low end, fine (-> 40/decade) at the top
        assert ratios[0] == pytest.approx(10 ** (1 / 4), rel=1e-6)
        assert ratios[-1] < 10 ** (1 / 25)
        # last edge reaches (just past) the Nyquist
        assert edges[-1] == pytest.approx(np.pi * self.NMESH / self.BOX,
                                          rel=1e-5)
        assert edges[0] < k_min <= edges[1]

    def test_bin_count_matches_reference_file(self):
        """The reference's powerspec file used exactly these options on a
        64-grid / 1000 Mpc box — our edge walk should land within a few
        bins of CONCEPT's (k-mean placement differs, count should not)."""
        ref = np.loadtxt("/root/reference/SnapVsPK/powerspec/powerspec_a=1.00")
        edges = concept_bin_edges(
            self.BOX, self.NMESH, ((4.0, 4.0), (100.0, 40.0)), "nyquist"
        )
        n_ours = len(edges) - 1
        # CONCEPT drops empty bins in the output; ours can only have more
        assert ref.shape[0] <= n_ours <= ref.shape[0] + 6

    def test_power_spectrum_accepts_edges(self):
        rng = np.random.default_rng(0)
        delta = jnp.asarray(rng.normal(size=(16, 16, 16)))
        edges = concept_bin_edges(100.0, 16, ((4.0, 4.0), (100.0, 40.0)),
                                  "nyquist")
        res = power_spectrum(delta, 100.0, edges=edges)
        assert res.k.shape[0] == len(edges) - 1
        k = np.asarray(res.k)[np.asarray(res.n_modes) > 0]
        assert (k <= np.pi * 16 / 100.0 * 1.0001).all()
        # white noise: flat P = V / N^3 in every well-sampled bin
        P = np.asarray(res.power)[np.asarray(res.n_modes) > 20]
        assert np.allclose(P, 100.0**3 / 16**3, rtol=0.35)


class TestRealizationCorrection:
    def test_correction_cancels_cosmic_variance(self):
        """At the (linear) IC time the corrected spectrum with
        realization correction reproduces the theory curve bin-by-bin —
        the realization's own scatter divides out (CONCEPT
        'realization correction': True)."""
        cfg = SimulationConfig(
            n_side=16, box=1000.0, a_begin=0.1,
            output=OutputConfig(
                powerspec_binning="concept",
                realization_correction=True,
            ),
        )
        state = realize_ics(cfg, seed=4)
        k, modes, P, Pc, Pl = measure_powerspec(
            state.pos, cfg, a=cfg.a_begin, seed=4
        )
        sel = (modes > 8) & (k < 0.5 * np.pi * 16 / 1000.0)
        dev_corr = np.abs(Pc[sel] / Pl[sel] - 1.0)
        # without correction the same bins scatter at ~sqrt(2/modes)
        cfg0 = cfg.replace(output=cfg.output.replace(
            realization_correction=False))
        _, _, _, Pc0, _ = measure_powerspec(state.pos, cfg0, a=cfg.a_begin)
        dev_raw = np.abs(Pc0[sel] / Pl[sel] - 1.0)
        assert np.median(dev_corr) < 0.05
        assert np.median(dev_corr) < 0.5 * np.median(dev_raw)

    def test_config_roundtrip(self, tmp_path):
        cfg = SimulationConfig(
            output=OutputConfig(
                powerspec_binning="concept",
                bins_per_decade=((4.0, 5.0), (64.0, 32.0)),
                powerspec_k_max="corner",
                realization_correction=True,
            )
        )
        p = str(tmp_path / "c.json")
        cfg.save(p)
        loaded = SimulationConfig.load(p)
        assert loaded.output == cfg.output


class TestAssignmentOrders:
    def test_bspline_orders_conserve_mass(self):
        from nbody.mesh.cic import bspline_deposit

        rng = np.random.default_rng(2)
        pos = jnp.asarray(rng.uniform(0, 100.0, (500, 3)))
        w = jnp.asarray(rng.uniform(0.5, 2.0, (500,)))
        for order in (2, 3, 4):
            g = bspline_deposit(pos, 100.0, 16, order=order, weights=w)
            assert float(jnp.sum(g)) == pytest.approx(float(jnp.sum(w)),
                                                      rel=1e-6)
            assert float(jnp.min(g)) >= 0.0 or order > 2  # TSC/PCS >= 0 too
            assert float(jnp.min(g)) > -1e-9

    def test_order2_is_cic(self):
        from nbody.mesh.cic import bspline_deposit, cic_deposit

        rng = np.random.default_rng(3)
        pos = jnp.asarray(rng.uniform(0, 50.0, (200, 3)))
        np.testing.assert_allclose(
            np.asarray(bspline_deposit(pos, 50.0, 8, order=2)),
            np.asarray(cic_deposit(pos, 50.0, 8)),
            rtol=1e-12,
        )

    def test_deconvolution_recovers_shot_noise(self):
        """Poisson particles have exactly flat P = V/N.  The amplitude-
        level deconvolution (P / prod sinc^(2 order)) keeps the measured
        spectrum flat to ~0.7 Nyquist for every assignment order; the old
        half-deconvolution drooped by ~sinc^2 there (the high-k bias the
        64^3 parity study exposed)."""
        from nbody.mesh.cic import bspline_deposit
        from nbody.mesh.spectrum import power_spectrum

        rng = np.random.default_rng(4)
        n, box, nmesh = 40**3, 100.0, 40
        pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
        expect = box**3 / n
        k_ny = np.pi * nmesh / box
        for order in (2, 4):
            g = bspline_deposit(pos, box, nmesh, order=order)
            delta = g / (n / nmesh**3) - 1.0
            res = power_spectrum(delta, box, n_bins=32, deconvolve_p=1,
                                 window_order=order)
            k = np.asarray(res.k)
            P = np.asarray(res.power)
            m = np.asarray(res.n_modes)
            sel = (m > 100) & (k > 0.3 * k_ny) & (k < 0.7 * k_ny)
            ratio = P[sel] / expect
            assert np.abs(np.median(ratio) - 1.0) < 0.1, (order, ratio)
