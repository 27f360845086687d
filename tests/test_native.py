"""Native C++ .npy loader tests: correctness vs numpy, errors, threading."""

import os

import numpy as np
import pytest

from nbody import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_builds(lib):
    assert native.available()


def test_single_f32_and_f64(tmp_path, lib):
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64):
        a = rng.normal(size=(5, 6, 7)).astype(dtype)
        p = str(tmp_path / f"{np.dtype(dtype).name}.npy")
        np.save(p, a)
        out = native.read_volumes([p], (5, 6, 7))
        np.testing.assert_allclose(out[0], a.astype(np.float32), rtol=0)


def test_batch_matches_numpy(tmp_path, lib):
    rng = np.random.default_rng(1)
    vols = [rng.normal(size=(8, 8, 8)).astype(np.float32) for _ in range(20)]
    paths = []
    for i, v in enumerate(vols):
        p = str(tmp_path / f"v{i}.npy")
        np.save(p, v)
        paths.append(p)
    out = native.read_volumes(paths, (8, 8, 8), n_threads=4)
    np.testing.assert_array_equal(out, np.stack(vols))


def test_channel_dim(tmp_path, lib):
    a = np.ones((4, 4, 4, 1), np.float32)
    p = str(tmp_path / "c.npy")
    np.save(p, a)
    out = native.read_volumes([p], (4, 4, 4, 1))
    assert out.shape == (1, 4, 4, 4, 1)


def test_shape_mismatch_raises(tmp_path, lib):
    np.save(str(tmp_path / "bad.npy"), np.ones((3, 3), np.float32))
    with pytest.raises(ValueError):
        native.read_volumes([str(tmp_path / "bad.npy")], (4, 4))


def test_bad_dtype_raises(tmp_path, lib):
    np.save(str(tmp_path / "int.npy"), np.ones((4,), np.int32))
    with pytest.raises(ValueError):
        native.read_volumes([str(tmp_path / "int.npy")], (4,))


def test_missing_file_raises(lib):
    with pytest.raises(ValueError):
        native.read_volumes(["/nonexistent/x.npy"], (4,))


def test_dataset_uses_native_loader(tmp_path, lib):
    """DeltaDataset loads volumes through the native path identically."""
    from nbody.emulator import DeltaDataset, create_linear_dataset

    root = str(tmp_path / "d")
    create_linear_dataset(root, 6, z=0.0, box=200.0, nmesh=8,
                          A_s_min=1.5e-9, A_s_max=2.7e-9, val_size=0.5)
    ds = DeltaDataset.from_directory(root, "train")
    direct = np.load(os.path.join(root, "Training & val data", "delta_train_id-1.npy"))
    np.testing.assert_array_equal(ds.X[0], direct.astype(np.float32))


def test_numpy_fallback(tmp_path, monkeypatch):
    """read_volumes degrades to numpy when no native library exists."""
    monkeypatch.setattr(native, "get_lib", lambda: None)
    a = np.random.default_rng(9).normal(size=(4, 4, 4)).astype(np.float64)
    p = str(tmp_path / "v.npy")
    np.save(p, a)
    out = native.read_volumes([p], (4, 4, 4))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0], a.astype(np.float32), rtol=0)
