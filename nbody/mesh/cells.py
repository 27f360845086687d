"""Cell lists: spatial bucketing for short-range pair interactions.

CONCEPT's P3M tiles its domain for the short-range pass (the reference
selects it via ``'gravity': 'p3m'``, `TheFeedingPipeline/NN.param:81-83`);
the TPU equivalent is a fixed-capacity cell list with static shapes so the
whole build lives inside jit/scan:

  particle -> cell id -> argsort by cell -> rank-within-cell (searchsorted)
  -> scatter indices into an (n_cells, capacity) bucket table.

Padding slots hold the sentinel index ``n`` which maps to a zero-mass
far-away ghost particle, so downstream kernels need no masking beyond the
self-pair.  Capacity is a static compile-time choice; the build returns an
``overflow`` count (particles whose cell was full — their *short-range*
contribution would be dropped) that callers should check at IC time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CellList(NamedTuple):
    indices: jax.Array  # (ncell^3, capacity) int32; padding slots hold n
    counts: jax.Array  # (ncell^3,) true occupancy
    overflow: jax.Array  # scalar int32: particles that did not fit
    slots: jax.Array  # (n,) int32: each particle's bucket slot
    # (cid * capacity + rank); overflowed particles hold the sentinel
    # ncell^3 * capacity — lets consumers GATHER per-particle results
    # back from bucket tables instead of scatter-adding every slot


def cell_capacity(n: int, ncell: int, headroom: float = 1.0, minimum: int = 8) -> int:
    """Static capacity heuristic: mean occupancy + 5 sigma Poisson tail
    (x headroom), rounded up to a multiple of 8 for sublane alignment.

    Deliberately tight: the Pallas cell kernels lane-align buckets to
    K = ceil(capacity / 128) * 128 and evaluate O(K^2) pairs per cell, so
    a capacity that spills past a 128 boundary costs ~4x kernel work.
    Near-uniform states fit mean + 5 sigma; clustered late-time states
    overflow regardless of any static margin and are handled by the
    in-scan overflow self-heal (capacity-doubling re-jit) in
    run_simulation.
    """
    mean = n / ncell**3
    cap = max(minimum, int(headroom * (mean + 5.0 * mean**0.5) + 2))
    return -(-cap // 8) * 8


@functools.partial(jax.jit, static_argnames=("ncell", "capacity"))
def build_cell_list(pos, box, ncell: int, capacity: int,
                    valid=None) -> CellList:
    """Bucket particles into an (ncell,)*3 grid of side box/ncell.

    ``pos`` may be unwrapped; positions are folded into [0, box).
    ``valid`` (n,) bool excludes particles entirely (sentinel slot, no
    bucket space, not counted as overflow) — used by the rung tier's
    active-target planes.
    """
    n = pos.shape[0]
    s = jnp.mod(pos, box) * (ncell / box)
    c = jnp.clip(s.astype(jnp.int32), 0, ncell - 1)
    cid = (c[:, 0] * ncell + c[:, 1]) * ncell + c[:, 2]
    if valid is not None:
        # invalid particles sort past every real cell and never fit
        cid = jnp.where(valid, cid, ncell**3)

    order = jnp.argsort(cid)
    cid_s = cid[order]
    # rank within cell: position in sorted order minus the cell's start
    # offset (exclusive cumsum of counts, gathered — a binary-search
    # searchsorted here costs ~4x the whole rest of the build at N=1M)
    counts = jnp.bincount(cid, length=ncell**3).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = jnp.arange(n, dtype=jnp.int32) - starts[jnp.minimum(cid_s, ncell**3 - 1)]
    ok = (rank < capacity) & (cid_s < ncell**3)

    table = jnp.full((ncell**3 * capacity,), n, dtype=jnp.int32)
    lin = cid_s * capacity + rank
    slot_s = jnp.where(ok, lin, ncell**3 * capacity)
    table = table.at[slot_s].set(order.astype(jnp.int32), mode="drop")
    slots = (
        jnp.zeros((n,), jnp.int32).at[order].set(slot_s.astype(jnp.int32))
    )
    overflow = jnp.sum(~ok & (cid_s < ncell**3)).astype(jnp.int32)
    return CellList(
        indices=table.reshape(ncell**3, capacity),
        counts=counts,
        overflow=overflow,
        slots=slots,
    )


def neighbor_offsets():
    """The 27 neighbor-cell offsets (self included)."""
    import numpy as np

    return [
        (ox, oy, oz)
        for ox in (-1, 0, 1)
        for oy in (-1, 0, 1)
        for oz in (-1, 0, 1)
    ]
