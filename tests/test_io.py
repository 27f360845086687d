"""Format round-trip + reference-interop tests for nbody.io (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from nbody.core.types import ParticleState
from nbody.io import (
    AsyncSnapshotWriter,
    BoxParams,
    MaxMinParams,
    SnapshotMeta,
    find_hdf5_files,
    read_box_params,
    read_boxsize,
    read_maxmin_params,
    read_param_table,
    read_positions,
    read_powerspec,
    read_snapshot,
    write_box_params,
    write_maxmin_params,
    write_param_table,
    write_powerspec,
    write_snapshot,
)

REF = "/root/reference"
ref_available = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def _state(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return ParticleState.create(
        pos=rng.uniform(0, 500.0, (n, 3)),
        vel=rng.normal(0, 1.0, (n, 3)),
        mass=np.full(n, 120583.76),
        time=1.0,
        dtype=np.float64,
    )


class TestSnapshot:
    def test_roundtrip(self, tmp_path):
        state = _state()
        meta = SnapshotMeta(a=1.0, boxsize=500.0, H0=0.0689, Omega_b=0.049, Omega_cdm=0.264)
        p = str(tmp_path / "snaps" / "snapshot_a=1.00.hdf5")
        write_snapshot(p, state, meta)
        back, meta2 = read_snapshot(p, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(back.pos), np.asarray(state.pos), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(back.vel), np.asarray(state.vel), rtol=1e-12)
        assert meta2.boxsize == 500.0
        assert abs(meta2.Omega_cdm - 0.264) < 1e-12
        assert read_boxsize(p) == 500.0
        assert read_positions(p).shape == (64, 3)

    def test_schema_matches_concept(self, tmp_path):
        """Datasets/attrs land exactly where the reference readers look
        (`FraP_kTilDelta.py:31-50`)."""
        import h5py

        p = str(tmp_path / "s.hdf5")
        write_snapshot(p, _state(), SnapshotMeta(a=0.5, boxsize=100.0))
        with h5py.File(p, "r") as f:
            assert f["components/matter/pos"].dtype == np.float64
            assert f["components/matter/mom"].shape == (64, 3)
            assert f["components/matter"].attrs["species"] == "matter"
            assert f.attrs["unit mass"] == "10**(10)*m_sun"
            assert "Ωb" in f.attrs

    def test_find_hdf5(self, tmp_path):
        write_snapshot(str(tmp_path / "a" / "x.hdf5"), _state(8), SnapshotMeta())
        write_snapshot(str(tmp_path / "b" / "c" / "y.hdf5"), _state(8), SnapshotMeta())
        hits = list(find_hdf5_files(tmp_path))
        assert len(hits) == 2 and hits == sorted(hits)

    def test_async_writer(self, tmp_path):
        meta = SnapshotMeta(boxsize=500.0)
        with AsyncSnapshotWriter() as w:
            for i in range(6):
                w.submit(str(tmp_path / f"snap_{i}.hdf5"), _state(seed=i), meta)
        for i in range(6):
            st, _ = read_snapshot(str(tmp_path / f"snap_{i}.hdf5"))
            ref = _state(seed=i)
            np.testing.assert_allclose(
                np.asarray(st.pos), np.asarray(ref.pos), rtol=1e-6
            )

    @ref_available
    def test_reads_reference_snapshot(self):
        p = (
            REF + "/Different_Sizes/newrun2/3giant32pm/snapshots/"
            "snapshot_a=1.00.hdf5"
        )
        state, meta = read_snapshot(p)
        assert state.n == 32768
        assert meta.boxsize == 1000.0
        assert 0.06 < meta.H0 < 0.08  # Gyr^-1
        assert np.asarray(state.pos).max() <= meta.boxsize


class TestPowerspec:
    def test_roundtrip_5col(self, tmp_path):
        k = np.logspace(-2, 0, 20)
        modes = np.arange(1, 21) * 3
        P = 1e4 / (1 + k * 50)
        p = str(tmp_path / "powerspec_a=1.00")
        write_powerspec(
            p, k, modes, P, P_corrected=P * 1.01, P_linear=P * 0.9,
            a=1.0, gridsize=64, sigma8=0.877, sigma8_corrected=0.877,
            sigma8_linear=0.816,
        )
        t = read_powerspec(p)
        np.testing.assert_allclose(t.k, k, rtol=1e-6)
        np.testing.assert_allclose(t.P, P, rtol=1e-6)
        np.testing.assert_allclose(t.P_corrected, P * 1.01, rtol=1e-6)
        np.testing.assert_allclose(t.P_linear, P * 0.9, rtol=1e-6)
        assert t.modes[3] == 12
        assert abs(t.sigma8 - 0.877) < 1e-9
        assert abs(t.sigma8_linear - 0.816) < 1e-9
        assert t.a == 1.0

    def test_roundtrip_3col(self, tmp_path):
        k = np.logspace(-2, 0, 5)
        p = str(tmp_path / "ps.txt")
        write_powerspec(p, k, np.ones(5), k**-1)
        t = read_powerspec(p)
        assert t.P_corrected is None and t.P_linear is None
        np.testing.assert_allclose(t.P, k**-1, rtol=1e-6)

    @ref_available
    def test_reads_reference_powerspec(self):
        t = read_powerspec(REF + "/PPPMP3M/PP/powerspec/powerspec_a=1.00")
        # header says σ₈ = 8.77e-01 (sim), 8.16e-01 (linear); first row
        # k=1.2566371e-02, 3 modes, P=7.8964837e+04
        assert abs(t.k[0] - 1.2566371e-02) < 1e-9
        assert t.modes[0] == 3
        assert abs(t.P[0] - 7.8964837e4) < 1e-3
        assert t.P_linear is not None
        assert abs(t.sigma8 - 0.877) < 5e-3
        assert abs(t.sigma8_linear - 0.816) < 5e-3


class TestSidecars:
    def test_box_params(self, tmp_path):
        p = str(tmp_path / "BoxParams.txt")
        write_box_params(p, BoxParams(z=5.0, L=500.0, N=32))
        bp = read_box_params(p)
        assert (bp.z, bp.L, bp.N) == (5.0, 500.0, 32)

    def test_maxmin_params(self, tmp_path):
        p = str(tmp_path / "MaxMinParams.txt")
        mm = MaxMinParams(1.505e-9, 2.705e-9, 0.9649, 0.9649, 0.12, 0.12, 200)
        write_maxmin_params(p, mm)
        back = read_maxmin_params(p)
        assert back == mm
        np.testing.assert_allclose(back.maxima(), [2.705e-9, 0.9649, 0.12])

    def test_param_table(self, tmp_path):
        p = str(tmp_path / "TrainingParams.txt")
        labels = np.array([[1.88e-9, 0.9649, 0.12], [2.05e-9, 0.9649, 0.12]])
        write_param_table(p, labels)
        np.testing.assert_allclose(read_param_table(p), labels, rtol=1e-12)

    @ref_available
    def test_reads_reference_sidecars(self):
        d = REF + "/TheFeedingPipeline/Datafolder4"
        bp = read_box_params(d + "/BoxParams.txt")
        assert (bp.z, bp.L, bp.N) == (0.0, 500.0, 32)
        mm = read_maxmin_params(d + "/MaxMinParams.txt")
        assert mm.n_samples == 200 and abs(mm.A_s_max - 2.705e-9) < 1e-15
        labels = read_param_table(d + "/TrainingParams.txt")
        assert labels.shape[1] == 3
        assert abs(labels[0, 0] - 1.883775097506553e-09) < 1e-24
