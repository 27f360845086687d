"""Blocked CIC deposit/gather as batched MXU contractions.

The naive deposit is an 8-corner ``.at[].add`` scatter and the force
readback an 8-corner gather — both lower to serialized XLA scatter/gather
on TPU (~80 ms each at N = 2^20, the largest non-kernel cost of a P3M
evaluation).  This module reformulates both as dense per-block tensor
contractions that ride the MXU:

  * the PM grid is tiled into (block,)^3-cell blocks; particles are
    bucketed by the block containing floor(s) (fixed-capacity slots,
    sentinel-padded — same machinery as the P3M cell list);
  * per axis, hat weights w[ix, k] = relu(1 - |s_k - node_ix|) are
    evaluated on the block's (block+1) node columns — exactly CIC's two
    nonzero entries per particle, embedded in a dense (block+1, K) strip;
  * deposit:   sub[b] = einsum('xk,yk,zk->xyz', wx, wy, wz * m)
    — an outer product plus ONE batched (B^3, (b+1)^2 K) @ (K, b+1)
    matmul; sub-grids combine into the global grid by 8 reshape/roll
    ADDS (interior cells are disjoint, only the +1 ghost layer overlaps);
  * gather:    F[k] = einsum('xyzc,xk,yk,zk->kc', sub[b], ...)
    — the transpose contraction against sub-grids EXTRACTED by pure
    slicing (no gather op anywhere).

Everything is jit-compatible with static shapes; overflowed buckets
(beyond K slots) fall back to nothing — callers size K for the near-
uniform deposit statistics (mean + 5 sigma), and the P3M driver's
overflow self-heal protects clustered states the same way it does for
the short-range cell list.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _block_buckets(pos, box, nmesh: int, block: int, K: int):
    """Bucket particles by deposit block; returns (s, slots, nb) where
    ``s`` is pos in grid units, ``slots`` the per-particle bucket slot
    (sentinel nb^3*K when overflowed), nb the blocks per axis."""
    nb = nmesh // block
    n = pos.shape[0]
    s = pos * (nmesh / box)
    i0 = jnp.floor(s).astype(jnp.int32)
    b3 = jnp.clip(i0 // block, 0, nb - 1)
    bid = (b3[:, 0] * nb + b3[:, 1]) * nb + b3[:, 2]

    order = jnp.argsort(bid)
    bid_s = bid[order]
    counts = jnp.bincount(bid, length=nb**3).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = jnp.arange(n, dtype=jnp.int32) - starts[bid_s]
    ok = rank < K
    slot_s = jnp.where(ok, bid_s * K + rank, nb**3 * K)
    slots = jnp.zeros((n,), jnp.int32).at[order].set(slot_s.astype(jnp.int32))
    overflow = jnp.sum(~ok).astype(jnp.int32)
    return s, slots, nb, overflow


def _axis_weights(sb, nodes):
    """Hat (CIC) weights of block-local coords sb (B3, K) on the node
    columns (block+1,): w[b, x, k] = relu(1 - |sb - x|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(sb[:, None, :] - nodes[None, :, None]))


def _scatter_block_coords(s, slots, nb, block: int, K: int, extra=None):
    """Scatter per-particle block-local coords (and optional extra row)
    into (B3*K,) slot tables; padding slots hold -2 (zero hat weight)."""
    B3 = nb**3
    defaults = jnp.full((B3 * K + 1,), -2.0, s.dtype)
    cols = []
    # block-local coordinate per axis: s - block_origin
    bx = (slots // K) // (nb * nb)
    by = ((slots // K) // nb) % nb
    bz = (slots // K) % nb
    org = jnp.stack([bx, by, bz], axis=-1).astype(s.dtype) * block
    loc = s - org
    for a in range(3):
        cols.append(defaults.at[slots].set(loc[:, a])[: B3 * K])
    if extra is not None:
        cols.append(
            jnp.zeros((B3 * K + 1,), s.dtype).at[slots].set(extra)[: B3 * K]
        )
    return [c.reshape(B3, K) for c in cols]


def _combine_subgrids(sub, nb: int, block: int, nmesh: int):
    """(B3, p, p, p) sub-grids (p = block+1) -> (nmesh,)^3 global grid.
    Interior cells are disjoint (pure reshape); the +1 ghost plane on
    each axis rolls onto the next block — 8 reshape/roll adds total."""
    p = block + 1
    sub = sub.reshape(nb, nb, nb, p, p, p)

    def to_grid(a):  # (nb,nb,nb,block,block,block) -> (nmesh,)*3
        return a.transpose(0, 3, 1, 4, 2, 5).reshape(nmesh, nmesh, nmesh)

    out = jnp.zeros((nmesh,) * 3, sub.dtype)
    for gx in (0, 1):
        sx = sub[:, :, :, block:, :, :] if gx else sub[:, :, :, :block, :, :]
        for gy in (0, 1):
            sy = sx[:, :, :, :, block:, :] if gy else sx[:, :, :, :, :block, :]
            for gz in (0, 1):
                sz = (
                    sy[:, :, :, :, :, block:]
                    if gz
                    else sy[:, :, :, :, :, :block]
                )
                if gx or gy or gz:
                    # ghost piece: occupies plane 0 of the NEXT block
                    padded = jnp.zeros(
                        (nb, nb, nb, block, block, block), sub.dtype
                    )
                    padded = padded.at[
                        :, :, :, : sz.shape[3], : sz.shape[4], : sz.shape[5]
                    ].set(sz)
                    out = out + jnp.roll(
                        to_grid(padded),
                        (gx * block, gy * block, gz * block),
                        (0, 1, 2),
                    )
                else:
                    out = out + to_grid(sz)
    return out


def _extract_subgrids(grid, nb: int, block: int):
    """(nmesh,)^3 -> (B3, p, p, p) sub-grids with the +1 ghost layer
    wrapped in (pure slicing: pad with wrap then window)."""
    nmesh = grid.shape[0]
    g = jnp.pad(grid, ((0, 1),) * 3, mode="wrap")  # (nmesh+1,)^3
    p = block + 1
    # windows at strides of `block`: gather via reshape trickery —
    # overlapping windows need an explicit index; one small take per
    # axis on block-aligned starts
    idx = (jnp.arange(nb)[:, None] * block + jnp.arange(p)[None, :]).reshape(-1)
    sub = g[idx][:, idx][:, :, idx]  # (nb*p, nb*p, nb*p)
    sub = sub.reshape(nb, p, nb, p, nb, p).transpose(0, 2, 4, 1, 3, 5)
    return sub.reshape(nb**3, p, p, p)


@functools.partial(
    jax.jit, static_argnames=("box", "nmesh", "block", "capacity", "chunks")
)
def blocked_cic_deposit(
    pos,
    box: float,
    nmesh: int,
    weights=None,
    block: int = 8,
    capacity: int = 0,
    chunks: int = 16,
):
    """CIC deposit via per-block MXU contractions.

    Bit-compatible with :func:`nbody.mesh.cic.cic_deposit` (same hat
    weights, node-centred grid) for every particle that fits its block
    bucket.  Returns (grid, overflow).
    """
    n = pos.shape[0]
    dtype = pos.dtype
    if weights is None:
        weights = jnp.ones((n,), dtype)
    if nmesh % block:
        raise ValueError(f"block {block} must divide nmesh {nmesh}")
    nb = nmesh // block
    if capacity <= 0:
        mean = n / nb**3
        capacity = int(mean + 5.0 * mean**0.5 + 2)
    K = -(-capacity // 8) * 8

    posw = jnp.mod(pos, box)
    s, slots, nb, overflow = _block_buckets(posw, box, nmesh, block, K)
    sxb, syb, szb, mb = _scatter_block_coords(
        s, slots, nb, block, K, extra=weights
    )
    nodes = jnp.arange(block + 1, dtype=dtype)
    B3 = nb**3
    p = block + 1

    def chunk_fn(args):
        sx, sy, sz, m = args
        wx = _axis_weights(sx, nodes)          # (c, p, K)
        wy = _axis_weights(sy, nodes)
        wz = _axis_weights(sz, nodes) * m[:, None, :]
        t = jnp.einsum("cxk,cyk->cxyk", wx, wy)
        return jnp.einsum("cxyk,czk->cxyz", t, wz)

    # chunks must divide nb^3; small meshes (B3 < chunks) would otherwise
    # fail the reshape below, so fall back to the largest divisor
    chunks = math.gcd(chunks, B3)
    csize = B3 // chunks
    sub = jax.lax.map(
        chunk_fn,
        tuple(
            a.reshape(chunks, csize, *a.shape[1:]) for a in (sxb, syb, szb, mb)
        ),
    ).reshape(B3, p, p, p)
    return _combine_subgrids(sub, nb, block, nmesh), overflow


@functools.partial(
    jax.jit, static_argnames=("box", "block", "capacity", "chunks")
)
def blocked_cic_gather_vec(
    grids,
    pos,
    box: float,
    block: int = 8,
    capacity: int = 0,
    chunks: int = 16,
):
    """CIC readback of C grids via per-block MXU contractions
    (transpose of :func:`blocked_cic_deposit`).  Returns ((n, C) values,
    overflow); overflowed particles read back 0 — pair with the caller's
    overflow protocol.
    """
    C = grids.shape[0]
    nmesh = grids.shape[1]
    n = pos.shape[0]
    dtype = pos.dtype
    if nmesh % block:
        raise ValueError(f"block {block} must divide nmesh {nmesh}")
    nb = nmesh // block
    if capacity <= 0:
        mean = n / nb**3
        capacity = int(mean + 5.0 * mean**0.5 + 2)
    K = -(-capacity // 8) * 8

    posw = jnp.mod(pos, box)
    s, slots, nb, overflow = _block_buckets(posw, box, nmesh, block, K)
    sxb, syb, szb = _scatter_block_coords(s, slots, nb, block, K)
    nodes = jnp.arange(block + 1, dtype=dtype)
    B3 = nb**3
    p = block + 1

    sub = jnp.stack(
        [_extract_subgrids(grids[c], nb, block) for c in range(C)], axis=-1
    )  # (B3, p, p, p, C)

    def chunk_fn(args):
        sx, sy, sz, sg = args
        wx = _axis_weights(sx, nodes)          # (c, p, K)
        wy = _axis_weights(sy, nodes)
        wz = _axis_weights(sz, nodes)
        t = jnp.einsum("cxyzf,cxk->cyzkf", sg, wx)
        t = jnp.einsum("cyzkf,cyk->czkf", t, wy)
        return jnp.einsum("czkf,czk->ckf", t, wz)  # (c, K, C)

    chunks = math.gcd(chunks, B3)
    csize = B3 // chunks
    vals = jax.lax.map(
        chunk_fn,
        (
            sxb.reshape(chunks, csize, K),
            syb.reshape(chunks, csize, K),
            szb.reshape(chunks, csize, K),
            sub.reshape(chunks, csize, p, p, p, C),
        ),
    ).reshape(B3 * K, C)
    vals = jnp.concatenate([vals, jnp.zeros((1, C), vals.dtype)], axis=0)
    return vals[slots], overflow
