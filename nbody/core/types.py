"""Core particle state pytree.

The reference keeps particle data in CONCEPT HDF5 snapshots as
``components/matter/pos (N,3)`` and ``mom (N,3)`` float64 datasets
(SURVEY.md §2.4; read at reference `SnapVsPK/Power_compare.py:71-77`).
Here the state is a JAX pytree of SoA device arrays so a whole simulation
(`jax.lax.scan` over KDK steps) stays on-device with zero host round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """Positions, velocities (or canonical momenta) and masses.

    Attributes:
      pos:  (N, 3) positions. Comoving for cosmological runs.
      vel:  (N, 3). For static-space runs this is velocity dx/dt.
            For cosmological runs it is the canonical momentum
            p = a^2 dx/dt (per unit mass), the standard comoving-coordinate
            choice: p' = -grad(phi)/(a H), x' = p/(a^3 H).
      mass: (N,) particle masses.
      time: scalar — physical time t for static runs, scale factor a for
            cosmological runs.
    """

    pos: jax.Array
    vel: jax.Array
    mass: jax.Array
    time: jax.Array

    # -- constructors ------------------------------------------------------
    @classmethod
    def create(cls, pos, vel, mass, time=0.0, dtype=None) -> "ParticleState":
        pos = jnp.asarray(pos, dtype=dtype)
        vel = jnp.asarray(vel, dtype=pos.dtype)
        mass = jnp.asarray(mass, dtype=pos.dtype)
        if mass.ndim == 0:
            mass = jnp.full(pos.shape[0], mass, dtype=pos.dtype)
        time = jnp.asarray(time, dtype=pos.dtype)
        return cls(pos=pos, vel=vel, mass=mass, time=time)

    # -- helpers -----------------------------------------------------------
    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dtype(self):
        return self.pos.dtype

    def replace(self, **changes: Any) -> "ParticleState":
        return dataclasses.replace(self, **changes)

    def astype(self, dtype) -> "ParticleState":
        return ParticleState(
            pos=self.pos.astype(dtype),
            vel=self.vel.astype(dtype),
            mass=self.mass.astype(dtype),
            time=self.time.astype(dtype),
        )
