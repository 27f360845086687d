"""Simulation checkpoint / resume.

The reference gets autosave from CONCEPT (``autosave_interval = 6*hr``,
`Different_Sizes/Giant.param:17,63`) and dataset-level resume from
existing-file skips (SURVEY.md §5.4).  Here a checkpoint is a lossless
.npz of the full ParticleState (pos, vel, mass, time) plus a JSON header
(step index, seed, config echo), so a `lax.scan` integration can resume
**bit-exactly**: the remaining scale-factor grid is identical and float
ops replay deterministically on the same backend.

Writes are atomic (tmp file + rename) so an interrupted autosave never
corrupts the previous checkpoint.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nbody.core.types import ParticleState

CHECKPOINT_NAME = "checkpoint.npz"


def save_checkpoint(path: str, state: ParticleState, extra: dict | None = None) -> str:
    """Atomically write ``state`` (+ a JSON-serialisable ``extra`` dict)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            pos=np.asarray(state.pos),
            vel=np.asarray(state.vel),
            mass=np.asarray(state.mass),
            time=np.asarray(state.time),
            extra=json.dumps(extra or {}),
        )
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, dtype=None):
    """-> (ParticleState, extra dict).  dtype=None keeps the stored dtype
    (bit-exact resume); pass jnp.float32 etc. to cast."""
    with np.load(path, allow_pickle=False) as z:
        state = ParticleState.create(
            pos=z["pos"], vel=z["vel"], mass=z["mass"], time=z["time"],
            dtype=dtype,
        )
        extra = json.loads(str(z["extra"]))
    return state, extra


def latest_checkpoint(workdir: str) -> str | None:
    """The autosave checkpoint in a run directory, if any."""
    p = os.path.join(workdir, "autosave", CHECKPOINT_NAME)
    return p if os.path.exists(p) else None
