"""CONCEPT-compatible HDF5 snapshot read/write + async host streaming.

Schema (inspected from the reference's
`Different_Sizes/newrun2/3giant32pm/snapshots/snapshot_a=1.00.hdf5`, read
paths reference `SnapVsPK/Power_compare.py:71-77` and
`TheFeedingPipeline/FraP_kTilDelta.py:31-68`; SURVEY.md §2.4):

  root attrs : H0 [Gyr^-1], a, boxsize [Mpc],
               'unit length'='Mpc', 'unit mass'='10**(10)*m_sun',
               'unit time'='Gyr', Ωb, Ωcdm
  group      : components/matter  (attrs N, mass, species='matter')
  datasets   : components/matter/pos (N,3) float64
               components/matter/mom (N,3) float64

Momentum convention: CONCEPT stores canonical momenta mom = a^2 m dx/dt
(comoving x).  ``ParticleState.vel`` holds exactly a^2 dx/dt per unit mass
for cosmological runs (see nbody/core/types.py), so mom = mass * vel with
no scale-factor juggling.

h5py (C libhdf5) stays host-side only: arrays cross the device boundary
once per snapshot.  ``AsyncSnapshotWriter`` overlaps that host write with
on-device stepping (the reference's CONCEPT logs a blocking 18 ms snapshot
write; here the device never waits on the disk).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Iterator

import numpy as np

from nbody.core.types import ParticleState

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover
    HAVE_H5PY = False


def _require_h5py():
    if not HAVE_H5PY:
        raise ImportError("h5py is required for CONCEPT snapshot I/O")


@dataclasses.dataclass(frozen=True)
class SnapshotMeta:
    """Root + component attributes of a CONCEPT snapshot."""

    a: float = 1.0
    boxsize: float = 0.0  # Mpc
    H0: float = 0.0  # Gyr^-1 (reference stores ~0.0689 for h=0.674)
    Omega_b: float = 0.0
    Omega_cdm: float = 0.0
    species: str = "matter"
    unit_length: str = "Mpc"
    unit_mass: str = "10**(10)*m_sun"
    unit_time: str = "Gyr"

    @classmethod
    def from_cosmology(cls, cosmo, boxsize: float, a: float = 1.0):
        return cls(
            a=a,
            boxsize=boxsize,
            H0=cosmo.H0,
            Omega_b=cosmo.Omega_b,
            Omega_cdm=cosmo.Omega_cdm,
        )


def write_snapshot(path, state: ParticleState, meta: SnapshotMeta) -> None:
    """Write a ParticleState as a CONCEPT-layout HDF5 snapshot."""
    _require_h5py()
    pos = np.asarray(state.pos, dtype=np.float64)
    mom = np.asarray(state.mass, dtype=np.float64)[:, None] * np.asarray(
        state.vel, dtype=np.float64
    )
    mass = float(np.asarray(state.mass, dtype=np.float64).mean())
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["H0"] = float(meta.H0)
        f.attrs["a"] = float(meta.a)
        f.attrs["boxsize"] = float(meta.boxsize)
        f.attrs["unit length"] = meta.unit_length
        f.attrs["unit mass"] = meta.unit_mass
        f.attrs["unit time"] = meta.unit_time
        f.attrs["Ωb"] = float(meta.Omega_b)
        f.attrs["Ωcdm"] = float(meta.Omega_cdm)
        grp = f.create_group(f"components/{meta.species}")
        grp.attrs["N"] = np.int64(state.n)
        grp.attrs["mass"] = mass
        grp.attrs["species"] = meta.species
        grp.create_dataset("pos", data=pos)
        grp.create_dataset("mom", data=mom)


def read_snapshot(path, species: str = "matter", dtype=np.float32):
    """Read a CONCEPT snapshot -> (ParticleState, SnapshotMeta).

    Velocities are reconstructed as mom / mass (i.e. back to the canonical
    a^2 dx/dt per-unit-mass convention of ParticleState).
    """
    _require_h5py()
    with h5py.File(path, "r") as f:
        grp = f[f"components/{species}"]
        pos = grp["pos"][...]
        mom = grp["mom"][...]
        mass = float(grp.attrs["mass"])
        meta = SnapshotMeta(
            a=float(f.attrs.get("a", 1.0)),
            boxsize=float(f.attrs.get("boxsize", 0.0)),
            H0=float(f.attrs.get("H0", 0.0)),
            Omega_b=float(f.attrs.get("Ωb", 0.0)),
            Omega_cdm=float(f.attrs.get("Ωcdm", 0.0)),
            species=species,
        )
    state = ParticleState.create(
        pos=pos.astype(dtype),
        vel=(mom / mass).astype(dtype),
        mass=np.full(pos.shape[0], mass, dtype=dtype),
        time=meta.a,
    )
    return state, meta


def read_positions(path, species: str = "matter") -> np.ndarray:
    """(N,3) positions — parity with reference
    `TheFeedingPipeline/FraP_kTilDelta.py:31-40` (`components/matter/pos`)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        return f[f"components/{species}/pos"][...]


def read_boxsize(path) -> float:
    """Root attr ``boxsize`` — parity with reference
    `TheFeedingPipeline/FraP_kTilDelta.py:43-50`."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        return float(f.attrs["boxsize"])


def find_hdf5_files(root) -> Iterator[str]:
    """Recursive walk for ``*.hdf5`` files, sorted — parity with the
    reference's `find_all_hdf5`/`find_hdf5_files`
    (`FraP_kTilDelta.py:53-68`, `SnapVsPK/Power_compare.py:143-144`)."""
    hits = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if name.endswith(".hdf5") or name.endswith(".h5"):
                hits.append(os.path.join(dirpath, name))
    return iter(sorted(hits))


class AsyncSnapshotWriter:
    """Background-thread snapshot writer: device -> host copy happens on
    the caller, the libhdf5 disk write happens off-thread so the jitted
    stepping loop never blocks on I/O.

    Usage::

        with AsyncSnapshotWriter() as w:
            for ...:
                state = run(state, dt, steps_per_snap, acc_fn)
                w.submit(path, state, meta)
        # context exit drains the queue and re-raises the first failure
    """

    def __init__(self, max_pending: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._exc: BaseException | None = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            path, state, meta = item
            try:
                if self._exc is None:
                    write_snapshot(path, state, meta)
            except BaseException as e:  # noqa: BLE001 — surfaced at close()
                self._exc = e
            finally:
                self._q.task_done()

    def submit(self, path, state: ParticleState, meta: SnapshotMeta) -> None:
        if self._exc is not None:
            raise self._exc
        # materialise on host NOW so the device buffers can be reused
        host = ParticleState(
            pos=np.asarray(state.pos),
            vel=np.asarray(state.vel),
            mass=np.asarray(state.mass),
            time=np.asarray(state.time),
        )
        self._q.put((path, host, meta))

    def close(self) -> None:
        self._q.join()
        self._q.put(None)
        self._thread.join()
        if self._exc is not None:
            raise self._exc

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        if exc_info[0] is None:
            self.close()
        return False
