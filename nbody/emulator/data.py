"""Emulator datasets: creation, ETL, streaming, on-device augmentation.

Rebuilds (SURVEY.md §2):
  C15 `createData`/`createTestData`/`saveDelta`
      (`Cosmo data create (new).py:139-325`) — linear-theory delta(x)
      training volumes over an A_s band, resume-by-skip, optional noise.
  C16 `process_folder_by_id` (`FraP_kTilDelta.py:129-194`) — HDF5 snapshot
      -> CIC -> delta -> deconvolve -> .npy ETL.
  C20 label plumbing (`Cosmo NN5.py:107-184`) — vary flags, max-normalised
      labels, partition dicts.
  C21/C22 augmentation + DataGenerator (`Cosmo NN5.py:145-241`).

TPU-first changes vs the reference: realizations are vmapped on device
(one compiled program for a whole batch of A_s draws, vs one CLASS+numpy
loop per sample under joblib); flip/rot90 augmentation is a jitted
``lax.switch`` on device (the reference's per-item host numpy loads are
its training bottleneck — SURVEY.md §3.4 "HOT: host-bound disk I/O");
small datasets are held resident in device memory.

File-name/layout parity with the reference is kept exactly
(``Training & val data/delta_train_id-{i}.npy``,
``Test data/delta_test_id-{i}.npy``, sidecar txt files) so either code
base can consume the other's datasets.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nbody.core.cosmology import Cosmology
from nbody.driver.ensemble import TEST_DRAW_SEED, TRAIN_DRAW_SEED
from nbody.ic.gaussian import GRFSpec, gaussian_field
from nbody.io.sidecars import (
    BoxParams,
    MaxMinParams,
    write_box_params,
    write_maxmin_params,
    write_param_table,
)

TRAIN_DIR = "Training & val data"
TEST_DIR = "Test data"


# --------------------------------------------------------------------------
# C15: linear-theory dataset creation (batched on device)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("spec", "power", "noise_frac"))
def _realize_batch(keys, amplitudes, spec, power, noise_frac: float = 0.0):
    """vmapped GRF realizations: (B,) keys + (B,) P(k) multipliers ->
    (B, N, N, N) delta volumes.  noise_frac > 0 adds the reference's
    training noise N(0, noise_frac * max(delta)) per volume
    (`Cosmo data create (new).py:158-159`)."""

    def one(key, amp):
        kf, kn = jax.random.split(key)
        delta = gaussian_field(kf, spec, power, amplitude=amp)
        if noise_frac > 0.0:
            sigma = noise_frac * jnp.max(delta)
            delta = delta + sigma * jax.random.normal(kn, delta.shape, delta.dtype)
        return delta

    return jax.vmap(one)(keys, amplitudes)


def create_linear_dataset(
    savepath: str,
    n_samples: int,
    z: float,
    box: float,
    nmesh: int,
    cosmo: Cosmology | None = None,
    A_s_min: float = 2.1e-9,
    A_s_max: float = 2.1e-9,
    n_s_min: float | None = None,
    n_s_max: float | None = None,
    omega_cdm_min: float | None = None,
    omega_cdm_max: float | None = None,
    val_size: float = 0.2,
    test: bool = False,
    noise_frac: float = 0.0,
    master_seed: int = 0,
    batch: int = 16,
    overwrite: bool = False,
) -> np.ndarray:
    """Generate delta(x) volumes + sidecars in the reference's layout.

    Train/val draws use the pinned seed 420, test draws 39 (reference
    `Cosmo data create (new).py:175-176,235`); field phases come from
    ``master_seed`` so parameter draws and realizations are independently
    reproducible (the reference resets np.random.seed for the same reason,
    `:216,251`).  Returns the (n_samples, 3) label array.
    """
    cosmo = cosmo or Cosmology()
    a = 1.0 / (1.0 + z)
    draw_seed = TEST_DRAW_SEED if test else TRAIN_DRAW_SEED
    rng = np.random.default_rng(draw_seed)

    def draw(lo, hi, default):
        lo = default if lo is None else lo
        hi = default if hi is None else hi
        return (
            rng.uniform(lo, hi, n_samples) if hi != lo
            else np.full(n_samples, lo)
        )

    A_s = draw(A_s_min, A_s_max, cosmo.A_s)
    n_s = draw(n_s_min, n_s_max, cosmo.n_s)
    omega_cdm = draw(omega_cdm_min, omega_cdm_max, cosmo.omega_cdm)
    labels = np.column_stack([A_s, n_s, omega_cdm])
    vary_shape = (n_s_max is not None and n_s_max != n_s_min) or (
        omega_cdm_max is not None and omega_cdm_max != omega_cdm_min
    )

    sub = TEST_DIR if test else TRAIN_DIR
    stem = "delta_test_id-" if test else "delta_train_id-"
    os.makedirs(os.path.join(savepath, sub), exist_ok=True)

    spec = GRFSpec(nmesh=nmesh, box=box)
    paths = [
        os.path.join(savepath, sub, f"{stem}{i + 1}.npy") for i in range(n_samples)
    ]
    todo = [
        i for i in range(n_samples) if overwrite or not os.path.exists(paths[i])
    ]  # resume-by-skip (`Cosmo data create (new).py:152-154`)
    keys = jax.random.split(jax.random.key(master_seed), n_samples)

    if not vary_shape:
        # amplitude-only variation: one compiled program for all samples
        # (A_s enters as a traced multiplier; growth folds redshift z).
        # constant-but-overridden shape parameters still enter the cosmology
        import dataclasses as _dc

        cosmo = _dc.replace(
            cosmo, n_s=float(n_s[0]), omega_cdm=float(omega_cdm[0])
        )
        power = _cached_power(cosmo)
        growth2 = float(cosmo.growth_D(a)) ** 2
        amps = A_s / cosmo.A_s * growth2
        for lo in range(0, len(todo), batch):
            idx = todo[lo : lo + batch]
            vols = _realize_batch(
                keys[np.asarray(idx)],
                jnp.asarray(amps[np.asarray(idx)], jnp.float32),
                spec,
                power,
                noise_frac=noise_frac,
            )
            vols = np.asarray(vols, dtype=np.float32)
            for j, i in enumerate(idx):
                np.save(paths[i], vols[j])
    else:
        # n_s / omega_cdm change the transfer-function SHAPE: one power
        # callable (and jit trace) per sample — the price of full
        # parameter variation (the reference recomputes CLASS per sample)
        import dataclasses as _dc

        for i in todo:
            ci = _dc.replace(
                cosmo, A_s=float(A_s[i]), n_s=float(n_s[i]),
                omega_cdm=float(omega_cdm[i]),
            )
            power = _cached_power(ci)
            growth2 = float(ci.growth_D(a)) ** 2
            vols = _realize_batch(
                keys[i][None], jnp.asarray([growth2], jnp.float32),
                spec, power, noise_frac=noise_frac,
            )
            np.save(paths[i], np.asarray(vols[0], dtype=np.float32))

    # sidecars
    write_box_params(os.path.join(savepath, "BoxParams.txt"), BoxParams(z, box, nmesh))
    write_maxmin_params(
        os.path.join(savepath, "MaxMinParams.txt"),
        MaxMinParams(
            float(A_s.min()), float(A_s.max()),
            float(n_s.min()), float(n_s.max()),
            float(omega_cdm.min()), float(omega_cdm.max()),
            n_samples,
        ),
    )
    if test:
        write_param_table(os.path.join(savepath, "TestParams.txt"), labels)
    else:
        n_train = int(n_samples * (1.0 - val_size))
        write_param_table(
            os.path.join(savepath, "TrainingParams.txt"), labels[:n_train]
        )
        write_param_table(os.path.join(savepath, "ValParams.txt"), labels[n_train:])
    return labels


@functools.lru_cache(maxsize=16)
def _cached_power(cosmo: Cosmology):
    return lambda k: cosmo.linear_power(k, a=1.0)


# --------------------------------------------------------------------------
# C16: snapshot -> delta ETL
# --------------------------------------------------------------------------


def snapshots_to_delta(
    ensemble_root: str,
    out_dir: str,
    nmesh: int,
    a: float = 1.0,
    deconvolve: bool = True,
    test: bool = False,
    overwrite: bool = False,
) -> list:
    """Walk an ensemble's id-dirs, convert final snapshots to delta grids.

    Parity with `FraP_kTilDelta.process_folder_by_id` (`:129-194`): picks
    ``snapshot_a={a}``, CIC-deposits on nmesh^3, converts to overdensity,
    optionally FFT-deconvolves the CIC window, saves (N,N,N,1) float32
    .npy (the channel dim the reference adds at `:168`).
    """
    from nbody.io.snapshot import read_snapshot
    from nbody.mesh.cic import cic_deposit, deconvolve as deconvolve_k, density_to_delta

    sub = TEST_DIR if test else TRAIN_DIR
    stem = "delta_test_id-" if test else "delta_train_id-"
    os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    id_dirs = sorted(
        d for d in os.listdir(ensemble_root)
        if d.startswith("id") and os.path.isdir(os.path.join(ensemble_root, d))
    )
    written = []
    for j, d in enumerate(id_dirs):
        out = os.path.join(out_dir, sub, f"{stem}{j + 1}.npy")
        written.append(out)
        if not overwrite and os.path.exists(out):
            continue
        snap = os.path.join(
            ensemble_root, d, "snapshots", f"snapshot_a={a:.2f}.hdf5"
        )
        state, meta = read_snapshot(snap)
        grid = cic_deposit(state.pos, meta.boxsize, nmesh)
        delta = density_to_delta(grid, state.n)
        if deconvolve:
            delta_k = deconvolve_k(jnp.fft.rfftn(delta), nmesh, meta.boxsize, p=1)
            delta = jnp.fft.irfftn(delta_k, s=(nmesh,) * 3)
        np.save(out, np.asarray(delta, dtype=np.float32)[..., None])
    return written


# --------------------------------------------------------------------------
# C21: on-device augmentation
# --------------------------------------------------------------------------

# the 12 (plane, k) rot90 cases over axes (0,1), (1,2), (0,2) of the volume
_PLANES = ((0, 1), (1, 2), (0, 2))


def _rot_case(plane_k: int):
    plane, k = _PLANES[plane_k // 4], plane_k % 4

    def f(v):
        return jnp.rot90(v, k=k, axes=plane)

    return f


@jax.jit
def augment_batch(key, X):
    """Random per-axis flips (50%) + one random rot90 per sample — jitted,
    on-device equivalent of the reference's host-numpy `random_flip_3d` /
    `random_rotate90_3d` (`Cosmo NN5.py:145-164`).

    X: (B, N, N, N) or (B, N, N, N, C); flips/rotations act on the three
    spatial axes.
    """
    squeeze = X.ndim == 4
    if squeeze:
        X = X[..., None]
    B = X.shape[0]
    kf, kr = jax.random.split(key)
    flips = jax.random.bernoulli(kf, 0.5, (B, 3))
    cases = jax.random.randint(kr, (B,), 0, 12)

    branches = [_rot_case(i) for i in range(12)]

    def one(v, fl, case):
        v = jnp.where(fl[0], jnp.flip(v, 0), v)
        v = jnp.where(fl[1], jnp.flip(v, 1), v)
        v = jnp.where(fl[2], jnp.flip(v, 2), v)
        return jax.lax.switch(case, branches, v)

    out = jax.vmap(one)(X, flips, cases)
    return out[..., 0] if squeeze else out


# --------------------------------------------------------------------------
# C20 + C22: labels and the batch stream
# --------------------------------------------------------------------------


def vary_flags_from_maxmin(mm) -> tuple:
    """Which of (A_s, n_s, omega_cdm) vary — reference
    `get_variable_params` (`Cosmo NN5.py:107-115`)."""
    return (
        mm.A_s_min != mm.A_s_max,
        mm.n_s_min != mm.n_s_max,
        mm.omega_cdm_min != mm.omega_cdm_max,
    )


@dataclasses.dataclass
class DeltaDataset:
    """A split of delta volumes + max-normalised labels.

    In-memory by default (a 200-sample 32^3 float32 set is 26 MB — the
    reference streams per-item from disk through keras Sequence and is
    I/O-bound; SURVEY.md §3.4).  ``from_directory`` reads the reference's
    on-disk layout.
    """

    X: np.ndarray  # (M, N, N, N) float32
    y: np.ndarray  # (M, P) labels normalised by per-param maxima
    maxima: np.ndarray  # (P,) the normalisers (subset of maxima with vary flag)
    vary_flags: tuple = (True, False, False)

    def __len__(self) -> int:
        return len(self.X)

    @property
    def dim(self) -> int:
        return self.X.shape[1]

    @classmethod
    def from_directory(
        cls, path: str, split: str = "train", in_memory: bool = True
    ) -> "DeltaDataset":
        """Load a split ('train' | 'val' | 'test') from the reference
        layout (delta_*_id-{i}.npy + *Params.txt + MaxMinParams.txt)."""
        from nbody.io.sidecars import read_maxmin_params, read_param_table

        mm = read_maxmin_params(os.path.join(path, "MaxMinParams.txt"))
        flags = vary_flags_from_maxmin(mm)
        if not any(flags):
            flags = (True, False, False)
        train_n = 0
        if split in ("val",):
            train_n = len(read_param_table(os.path.join(path, "TrainingParams.txt")))
        table = {
            "train": "TrainingParams.txt",
            "val": "ValParams.txt",
            "test": "TestParams.txt",
        }[split]
        labels3 = read_param_table(os.path.join(path, table))
        sub = TEST_DIR if split == "test" else TRAIN_DIR
        stem = "delta_test_id-" if split == "test" else "delta_train_id-"
        # val ids continue after train ids (reference
        # `make_partition_and_labels`, `Cosmo NN5.py:167-184`)
        offset = train_n if split == "val" else 0
        paths = [
            os.path.join(path, sub, f"{stem}{offset + i + 1}.npy")
            for i in range(len(labels3))
        ]
        # shape from the first file's header; bulk read via the C++
        # thread-pool loader (numpy fallback inside)
        shape = np.load(paths[0], mmap_mode="r").shape
        from nbody.native import read_volumes

        X = read_volumes(paths, shape)
        if X.ndim == 5:  # (M, N, N, N, 1) CONCEPT-path channel dim
            X = X[..., 0]
        maxima_all = mm.maxima()
        if split == "test":
            # test labels stay 3-wide in the reference (`Cosmo NN5.py:141`)
            y = labels3 / maxima_all[None, :]
            maxima = maxima_all
        else:
            keep = [j for j, f in enumerate(flags) if f]
            y = labels3[:, keep] / maxima_all[keep][None, :]
            maxima = maxima_all[keep]
        return cls(X=X, y=np.asarray(y, np.float32), maxima=maxima, vary_flags=flags)

    def batches(
        self,
        batch_size: int,
        key=None,
        shuffle: bool = True,
        augment: bool = False,
        drop_remainder: bool = True,
        seed: int = 0,
    ):
        """Yield (X, y) jnp batches for one epoch.  Augmentation runs
        jitted on device."""
        m = len(self)
        order = np.arange(m)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if key is None:
            key = jax.random.key(seed)
        stop = m - (m % batch_size) if drop_remainder else m
        for lo in range(0, stop, batch_size):
            idx = order[lo : lo + batch_size]
            X = jnp.asarray(self.X[idx])
            if augment:
                key, sub = jax.random.split(key)
                X = augment_batch(sub, X)
            yield X, jnp.asarray(self.y[idx])
