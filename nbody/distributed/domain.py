"""Spatially-resident slab domain decomposition (memory-scaling multi-chip).

The TPU-native equivalent of CONCEPT's MPI domain decomposition (the
reference's run logs show "Domain decomposition: 1x1x1"; launcher `-n` flag
`SnapVsPK/Ucertain.py:89`; SURVEY.md §2.3/§5.8): each device *owns* the
particles inside its x-slab of the box, so per-device memory is ~N/D and
the N=1M configs scale to N*D over a pod.  Contrast with
nbody.distributed.sharding, whose short-range pass all_gathers the full
particle set (compute-scaling only).

Layout (1-D mesh axis, D devices):
  * the box is cut into D x-slabs aligned with the P3M chaining-cell grid
    (slab d owns cell layers [d*ncell/D, (d+1)*ncell/D));
  * each device holds a fixed-capacity block of C particle slots; empty
    slots carry mass 0 and sit parked at the slab centre (they deposit
    nothing and never migrate);
  * after every drift, :func:`slab_exchange` migrates boundary-crossing
    particles to the neighbouring device with two ``ppermute`` hops
    (left + right) and an in-place compaction — the analogue of MPI
    particle exchange;
  * the short-range force builds only the **local** slab of the
    ghost-padded bucket plane; the two boundary cell layers arrive from
    the neighbours via ``ppermute`` (halo exchange);
  * the PM far field deposits to the local grid x-slab (one ghost plane
    ppermuted to the right neighbour), solves Poisson through the
    transpose-decomposed distributed FFT (nbody.distributed.fft), and
    gathers forces from the local slab (+1 halo plane from the right).

Per-step communication: 2 particle buffers + 2 bucket layers + 2 grid
planes + 2 all_to_all transposes — all O(N/D + nmesh^2), nothing O(N).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from nbody.core.types import ParticleState
from nbody.distributed.fft import kvecs_slab, slab_irfftn, slab_rfftn


# ---------------------------------------------------------------------------
# Host-side decomposition
# ---------------------------------------------------------------------------


def slab_counts(pos, box: float, ncell: int, n_dev: int) -> np.ndarray:
    """Particles per x-slab (slabs aligned to the chaining-cell grid)."""
    x = np.mod(np.asarray(pos)[:, 0], box)
    cx = np.clip((x * (ncell / box)).astype(np.int64), 0, ncell - 1)
    return np.bincount(cx // (ncell // n_dev), minlength=n_dev)


def domain_decompose(
    state: ParticleState,
    mesh: Mesh,
    box: float,
    ncell: int,
    local_capacity: int | None = None,
    headroom: float = 1.3,
    axis_name: str = "shard",
) -> ParticleState:
    """Scatter a ParticleState into slab-resident sharded storage.

    Returns a ParticleState whose arrays have D*C rows, block-sharded over
    the mesh; rows with ``mass == 0`` are empty slots parked at their
    slab's centre.  ``local_capacity`` (C) defaults to
    ``headroom * max(slab occupancy)`` rounded up to a multiple of 8.
    """
    D = mesh.shape[axis_name]
    if ncell % D:
        raise ValueError(f"ncell={ncell} not divisible by {D} devices")
    nxl = ncell // D
    pos = np.asarray(state.pos, np.float64)
    vel = np.asarray(state.vel, np.float64)
    mass = np.asarray(state.mass, np.float64)
    x = np.mod(pos[:, 0], box)
    cx = np.clip((x * (ncell / box)).astype(np.int64), 0, ncell - 1)
    slab = cx // nxl
    counts = np.bincount(slab, minlength=D)
    C = local_capacity or -(-int(headroom * counts.max() + 8) // 8) * 8
    if counts.max() > C:
        raise ValueError(
            f"local_capacity={C} < max slab occupancy {counts.max()}"
        )
    dtype = np.asarray(state.pos).dtype
    W = box / D
    pos_b = np.zeros((D, C, 3), dtype)
    vel_b = np.zeros((D, C, 3), dtype)
    mass_b = np.zeros((D, C), dtype)
    for d in range(D):
        sel = slab == d
        nd = int(counts[d])
        pos_b[d, :nd] = pos[sel]
        vel_b[d, :nd] = vel[sel]
        mass_b[d, :nd] = mass[sel]
        pos_b[d, nd:] = [(d + 0.5) * W, 0.5 * box, 0.5 * box]
    sharded = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return ParticleState(
        pos=jax.device_put(jnp.asarray(pos_b.reshape(D * C, 3)), sharded),
        vel=jax.device_put(jnp.asarray(vel_b.reshape(D * C, 3)), sharded),
        mass=jax.device_put(jnp.asarray(mass_b.reshape(D * C)), sharded),
        time=jax.device_put(jnp.asarray(state.time, dtype), repl),
    )


def domain_gather(state: ParticleState) -> ParticleState:
    """Collect a slab-resident state back to a dense host-side state
    (drops empty slots; for measurement / snapshots)."""
    mass = np.asarray(state.mass)
    keep = mass > 0
    return ParticleState(
        pos=jnp.asarray(np.asarray(state.pos)[keep]),
        vel=jnp.asarray(np.asarray(state.vel)[keep]),
        mass=jnp.asarray(mass[keep]),
        time=jnp.asarray(np.asarray(state.time)),
    )


# ---------------------------------------------------------------------------
# Local shard_map bodies
# ---------------------------------------------------------------------------


def _perm_fwd(n_dev):
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


def _perm_bwd(n_dev):
    return [(i, (i - 1) % n_dev) for i in range(n_dev)]


def slab_exchange(
    pos_l,
    vel_l,
    mass_l,
    *,
    box: float,
    ncell: int,
    n_dev: int,
    exchange_capacity: int,
    axis_name: str,
    extras: tuple = (),
):
    """Migrate boundary-crossing particles to the neighbouring slabs.

    All shapes static: up to ``exchange_capacity`` particles move each way
    per step (a particle is assumed to cross at most one slab per step —
    true for any stable timestep since slab width >> per-step drift;
    violations are counted in the returned overflow).  Empty slots are
    re-parked at the slab centre.  Returns
    (pos, vel, mass, overflow:int32) — or
    (pos, vel, mass, extras_out, overflow) when ``extras`` (a tuple of
    per-particle (C, ...) arrays, e.g. a carried force) are given; they
    ride the same permutation so rows stay aligned with their particles.
    """
    d = jax.lax.axis_index(axis_name)
    C = pos_l.shape[0]
    E = exchange_capacity
    nxl = ncell // n_dev
    dtype = pos_l.dtype

    valid = mass_l > 0
    x = jnp.mod(pos_l[:, 0], box)
    cx = jnp.clip((x * (ncell / box)).astype(jnp.int32), 0, ncell - 1)
    dest = cx // nxl
    go_r = valid & (dest == jnp.mod(d + 1, n_dev)) if n_dev > 1 else jnp.zeros_like(valid)
    if n_dev == 2:
        # (d+1)%2 == (d-1)%2: the two directions reach the SAME neighbour, so
        # a dest!=d mask used for both would deliver every migrant twice
        # (mass duplication).  Send all migrants via the forward permute only.
        go_l = jnp.zeros_like(valid)
    else:
        go_l = valid & (dest == jnp.mod(d - 1, n_dev)) if n_dev > 1 else jnp.zeros_like(valid)
    if n_dev > 2:
        far = valid & (dest != d) & ~go_r & ~go_l
    else:
        far = jnp.zeros_like(valid)
    stay = valid & ~go_r & ~go_l & ~far

    def pack(flag):
        order = jnp.argsort(~flag)  # stable: flagged rows first
        sel = order[:E]
        cnt = jnp.sum(flag)
        slot = jnp.arange(E) < cnt
        m = jnp.where(slot, mass_l[sel], 0.0)
        ex = tuple(e[sel] for e in extras)
        return pos_l[sel], vel_l[sel], m, ex, jnp.maximum(cnt - E, 0)

    pr, vr, mr, exr, ov_r = pack(go_r)
    plft, vlft, mlft, exl, ov_l = pack(go_l)

    fwd, bwd = _perm_fwd(n_dev), _perm_bwd(n_dev)
    # right-goers travel +1; left-goers travel -1
    rp = [jax.lax.ppermute(t, axis_name, fwd) for t in (pr, vr, mr, *exr)]
    lp = [jax.lax.ppermute(t, axis_name, bwd) for t in (plft, vlft, mlft, *exl)]

    cand_pos = jnp.concatenate([pos_l, rp[0], lp[0]], axis=0)
    cand_vel = jnp.concatenate([vel_l, rp[1], lp[1]], axis=0)
    cand_mass = jnp.concatenate(
        [jnp.where(stay, mass_l, 0.0), rp[2], lp[2]], axis=0
    )
    cand_extras = tuple(
        jnp.concatenate([extras[t], rp[3 + t], lp[3 + t]], axis=0)
        for t in range(len(extras))
    )
    cand_valid = cand_mass > 0
    order = jnp.argsort(~cand_valid)[:C]  # valid rows first, truncate to C
    new_pos = cand_pos[order]
    new_vel = cand_vel[order]
    new_mass = cand_mass[order]
    new_extras = tuple(e[order] for e in cand_extras)
    n_valid = jnp.sum(cand_valid)
    ov_cap = jnp.maximum(n_valid - C, 0)

    park = jnp.stack(
        [
            (d.astype(dtype) + 0.5) * (box / n_dev),
            jnp.asarray(0.5 * box, dtype),
            jnp.asarray(0.5 * box, dtype),
        ]
    )
    ok = new_mass > 0
    new_pos = jnp.where(ok[:, None], new_pos, park[None, :])
    new_vel = jnp.where(ok[:, None], new_vel, 0.0)
    overflow = (ov_r + ov_l + ov_cap + jnp.sum(far)).astype(jnp.int32)
    if extras:
        return new_pos, new_vel, new_mass, new_extras, overflow
    return new_pos, new_vel, new_mass, overflow


def build_local_plane(
    pos_l,
    mass_l,
    *,
    box: float,
    r_cut: float,
    ncell: int,
    n_dev: int,
    capacity: int,
    axis_name: str,
    valid=None,
):
    """Bucket the local slab's particles and assemble its ghost-padded SoA
    cell plane, pulling the two x-halo layers from the neighbours.

    ``valid``: optional (C,) bool mask restricting which local particles
    enter the plane (ANDed with mass > 0) — the rung tier's compact
    ACTIVE-target plane (cf. `nbody.forces.p3m.build_padded_plane`).

    Local-slab sibling of :func:`nbody.forces.p3m.build_padded_plane`:
    y/z ghosts are periodic wraps of local data (those axes are not
    decomposed); the x=0 / x=nxl+1 ghost layers are the neighbours'
    boundary layers, moved by one ``ppermute`` each and x-shifted by
    -/+box where the ring wraps around the box.

    Returns (plane (8, (nxl+2) * M^2 * K), overflow, K, gidx (C,)) —
    ``gidx`` is each local particle's own interior slot in the padded
    plane (non-resident / overflowed rows hold the sentinel
    (nxl+2) M^2 K), so the short-range result comes back by a GATHER of
    C rows instead of scatter-adding every bucket slot; the plane itself
    is built by a scatter-SET of the C local rows plus wrap-padding,
    never by gathering every slot.
    """
    d = jax.lax.axis_index(axis_name)
    C = pos_l.shape[0]
    dtype = jnp.float32
    nxl = ncell // n_dev
    M = ncell + 2
    K = -(-capacity // 128) * 128  # lane-align bucket width

    valid = (mass_l > 0) if valid is None else (valid & (mass_l > 0))
    s = jnp.mod(pos_l, box) * (ncell / box)
    c = jnp.clip(s.astype(jnp.int32), 0, ncell - 1)
    cxl = c[:, 0] - d * nxl
    C3l = nxl * ncell * ncell
    resident = valid & (cxl >= 0) & (cxl < nxl)
    cid = jnp.where(
        resident, (cxl * ncell + c[:, 1]) * ncell + c[:, 2], C3l
    )
    order = jnp.argsort(cid)
    cid_s = cid[order]
    counts = jnp.bincount(cid, length=C3l + 1).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = jnp.arange(C, dtype=jnp.int32) - starts[cid_s]
    ok = (rank < K) & (cid_s < C3l)
    overflow = (jnp.sum(valid) - jnp.sum(ok)).astype(jnp.int32)

    # per-particle slots: interior (cid * K + rank) for the scatter-SET
    # plane build, padded (((x+1)*M + y+1)*M + z+1)*K + rank for the
    # gather-back
    sxl = cid_s // (ncell * ncell)
    sy = (cid_s // ncell) % ncell
    sz = cid_s % ncell
    pad_slot = ((((sxl + 1) * M) + sy + 1) * M + sz + 1) * K + rank
    sentinel = (nxl + 2) * M * M * K
    gidx = (
        jnp.full((C,), sentinel, jnp.int32)
        .at[order]
        .set(jnp.where(ok, pad_slot, sentinel).astype(jnp.int32))
    )
    slot_l = (
        jnp.full((C,), C3l * K, jnp.int32)
        .at[order]
        .set(jnp.where(ok, cid_s * K + rank, C3l * K).astype(jnp.int32))
    )

    # scatter-SET the local rows; padding slots keep the far-away
    # zero-mass sentinel defaults
    posw = jnp.mod(pos_l, box).astype(dtype)
    data = jnp.concatenate([posw, mass_l.astype(dtype)[:, None]], axis=1)
    defaults = jnp.asarray([-4.0 * r_cut] * 3 + [0.0], dtype)
    interior = (
        jnp.broadcast_to(defaults, (C3l * K + 1, 4))
        .at[slot_l]
        .set(data)[: C3l * K]
        .reshape(nxl, ncell, ncell, K, 4)
    )

    # y/z ghosts: periodic wrap via contiguous slab copies with the
    # +/-box shift baked into the copied coordinates (x halos come from
    # the neighbours below)
    padded = jnp.pad(interior, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)),
                     mode="wrap")
    for ax in (1, 2):

        def shifted(sl, delta):
            lo = padded[(slice(None),) * ax + (sl,)]
            return lo.at[..., ax].add(
                jnp.where(lo[..., 3] > 0, delta, 0.0)
            )

        padded = padded.at[(slice(None),) * ax + (0,)].set(
            shifted(0, -box)
        )
        padded = padded.at[(slice(None),) * ax + (M - 1,)].set(
            shifted(M - 1, box)
        )

    soa = jnp.concatenate(
        [
            jnp.moveaxis(padded, -1, 0),
            jnp.zeros((4, nxl, M, M, K), dtype),
        ],
        axis=0,
    ).reshape(8, nxl, M * M * K)
    zero_layer = jnp.zeros((8, 1, M * M * K), dtype)
    p5 = jnp.concatenate([zero_layer, soa, zero_layer], axis=1)

    # x halos: my left ghost is the left neighbour's LAST real layer,
    # my right ghost the right neighbour's FIRST — shift x by -/+box at
    # the periodic wrap (device 0 / device D-1 respectively)
    from_left = jax.lax.ppermute(p5[:, nxl], axis_name, _perm_fwd(n_dev))
    from_right = jax.lax.ppermute(p5[:, 1], axis_name, _perm_bwd(n_dev))
    shift_l = jnp.where(d == 0, -box, 0.0).astype(dtype)
    shift_r = jnp.where(d == n_dev - 1, box, 0.0).astype(dtype)
    from_left = from_left.at[0].add(shift_l)
    from_right = from_right.at[0].add(shift_r)
    p5 = p5.at[:, 0].set(from_left).at[:, nxl + 1].set(from_right)

    return p5.reshape(8, (nxl + 2) * M * M * K), overflow, K, gidx


def slab_deposit(pos_l, mass_l, *, box: float, nmesh: int, n_dev: int,
                 axis_name: str, shift: float = 0.0):
    """CIC deposit of resident particles onto the local grid x-slab.

    Spill planes (particles whose trilinear cloud reaches one plane into
    a neighbouring slab) travel by a single ``ppermute`` each way and are
    added to the neighbours' edge planes.  Empty slots (mass 0) deposit
    nothing.  ``shift`` (cells) offsets the grid origin — the second
    interlacing pass (cf. :func:`nbody.mesh.cic.cic_deposit`).  Returns
    the (nmesh/D, nmesh, nmesh) local slab.
    """
    import itertools

    d = jax.lax.axis_index(axis_name)
    Xl = nmesh // n_dev
    dtype = pos_l.dtype
    s = jnp.mod(pos_l, box) * (nmesh / box) - shift
    i0 = jnp.floor(s)
    f = s - i0
    i0 = i0.astype(jnp.int32)
    # two-sided buffer: with shift > 0 a resident particle's base plane
    # can be one to the LEFT of the slab; plane index 1..Xl are the
    # slab's own planes, 0 / Xl+1 the spills
    il = jnp.clip(i0[:, 0] - d * Xl + 1, 0, Xl + 1)

    flat = jnp.zeros(((Xl + 2) * nmesh * nmesh,), dtype)
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        w = (
            (f[:, 0] if dx else 1.0 - f[:, 0])
            * (f[:, 1] if dy else 1.0 - f[:, 1])
            * (f[:, 2] if dz else 1.0 - f[:, 2])
            * mass_l
        )
        ix = jnp.clip(il + dx, 0, Xl + 1)
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        flat = flat.at[(ix * nmesh + iy) * nmesh + iz].add(w)
    buf = flat.reshape(Xl + 2, nmesh, nmesh)
    spill_r = jax.lax.ppermute(buf[Xl + 1], axis_name, _perm_fwd(n_dev))
    spill_l = jax.lax.ppermute(buf[0], axis_name, _perm_bwd(n_dev))
    out = buf[1 : Xl + 1]
    return out.at[0].add(spill_r).at[Xl - 1].add(spill_l)


def slab_bspline_deposit(pos_l, mass_l, *, box: float, nmesh: int,
                         n_dev: int, axis_name: str, order: int = 2,
                         shift: float = 0.0):
    """Order-generalised :func:`slab_deposit`: 2 = CIC (delegates),
    3 = TSC, 4 = PCS — the sharded measurement's higher-order
    assignments (CONCEPT's powerspec 'interpolation' option; round-3
    VERDICT weak #4 left the sharded estimator CIC-only).  The wider
    stencils spill up to TWO planes into each neighbouring slab, so the
    apron is two planes each way (needs nmesh/n_dev >= 2)."""
    import itertools

    if order == 2:
        return slab_deposit(
            pos_l, mass_l, box=box, nmesh=nmesh, n_dev=n_dev,
            axis_name=axis_name, shift=shift,
        )
    d = jax.lax.axis_index(axis_name)
    Xl = nmesh // n_dev
    if Xl < 2:
        raise ValueError(
            f"order-{order} slab deposit needs nmesh/n_dev >= 2"
        )
    dtype = pos_l.dtype
    s = jnp.mod(pos_l, box) * (nmesh / box) - shift
    if order == 3:  # TSC
        ic = jnp.floor(s + 0.5).astype(jnp.int32)
        offsets = (-1, 0, 1)

        def W(u):
            au = jnp.abs(u)
            return jnp.where(
                au <= 0.5, 0.75 - u * u,
                jnp.where(au < 1.5, 0.5 * (1.5 - au) ** 2, 0.0),
            )
    elif order == 4:  # PCS
        ic = jnp.floor(s).astype(jnp.int32)
        offsets = (-1, 0, 1, 2)

        def W(u):
            au = jnp.abs(u)
            return jnp.where(
                au <= 1.0, (4.0 - 6.0 * au * au + 3.0 * au**3) / 6.0,
                jnp.where(au < 2.0, (2.0 - au) ** 3 / 6.0, 0.0),
            )
    else:
        raise ValueError(f"unsupported assignment order {order}")

    il = jnp.clip(ic[:, 0] - d * Xl + 2, 0, Xl + 3)
    wx = {o: W(s[:, 0] - (ic[:, 0] + o)) * mass_l for o in offsets}
    wy = {o: W(s[:, 1] - (ic[:, 1] + o)) for o in offsets}
    wz = {o: W(s[:, 2] - (ic[:, 2] + o)) for o in offsets}
    flat = jnp.zeros(((Xl + 4) * nmesh * nmesh,), dtype)
    for ox, oy, oz in itertools.product(offsets, repeat=3):
        ix = jnp.clip(il + ox, 0, Xl + 3)
        iy = jnp.mod(ic[:, 1] + oy, nmesh)
        iz = jnp.mod(ic[:, 2] + oz, nmesh)
        flat = flat.at[(ix * nmesh + iy) * nmesh + iz].add(
            wx[ox] * wy[oy] * wz[oz]
        )
    buf = flat.reshape(Xl + 4, nmesh, nmesh)
    spill_r = jax.lax.ppermute(
        buf[Xl + 2 : Xl + 4], axis_name, _perm_fwd(n_dev)
    )
    spill_l = jax.lax.ppermute(buf[0:2], axis_name, _perm_bwd(n_dev))
    out = buf[2 : Xl + 2]
    out = out.at[0:2].add(spill_r)
    return out.at[Xl - 2 : Xl].add(spill_l)


def slab_gather3(grids_l, pos_l, *, box: float, n_dev: int, axis_name: str,
                 shift: float = 0.0):
    """Trilinear readback of C grid slabs (C = 3 force components; any
    C works — the domain energy budget gathers one potential slab) at
    resident particle positions; halo planes come from both neighbours
    (one ``ppermute`` each).  ``shift`` (cells) reads from a
    half-cell-offset grid (the second interlacing force pass)."""
    import itertools

    d = jax.lax.axis_index(axis_name)
    C = grids_l.shape[0]
    nmesh = grids_l.shape[2]
    Xl = grids_l.shape[1]
    halo_r = jax.lax.ppermute(grids_l[:, 0], axis_name, _perm_bwd(n_dev))
    halo_l = jax.lax.ppermute(grids_l[:, Xl - 1], axis_name, _perm_fwd(n_dev))
    # plane p of ext = global plane d*Xl + (p-1)
    ext = jnp.concatenate(
        [halo_l[:, None], grids_l, halo_r[:, None]], axis=1
    )  # (C, Xl+2, Y, Z)
    flat = ext.reshape(C, -1).T

    s = jnp.mod(pos_l, box) * (nmesh / box) - shift
    i0 = jnp.floor(s)
    f = s - i0
    i0 = i0.astype(jnp.int32)
    il = jnp.clip(i0[:, 0] - d * Xl + 1, 0, Xl)
    out = jnp.zeros((pos_l.shape[0], C), grids_l.dtype)
    for dx, dy, dz in itertools.product((0, 1), repeat=3):
        w = (
            (f[:, 0] if dx else 1.0 - f[:, 0])
            * (f[:, 1] if dy else 1.0 - f[:, 1])
            * (f[:, 2] if dz else 1.0 - f[:, 2])
        )
        ix = il + dx
        iy = jnp.mod(i0[:, 1] + dy, nmesh)
        iz = jnp.mod(i0[:, 2] + dz, nmesh)
        out = out + w[:, None] * flat[(ix * nmesh + iy) * nmesh + iz]
    return out


def _grad1(k, h: float, order: str):
    if order == "fd2":
        return jnp.sin(k * h) / h
    if order == "fd4":
        return (8.0 * jnp.sin(k * h) - jnp.sin(2.0 * k * h)) / (6.0 * h)
    raise ValueError(f"domain PM supports fd2/fd4 gradients, not {order!r}")


# ---------------------------------------------------------------------------
# The full domain-decomposed P3M force
# ---------------------------------------------------------------------------


class DomainP3M(NamedTuple):
    """Static geometry of a domain-decomposed P3M force."""

    box: float
    nmesh: int
    ncell: int
    r_s: float
    r_cut: float
    bucket_capacity: int
    n_dev: int
    axis_name: str


def domain_p3m_geometry(
    box: float,
    nmesh: int,
    n_dev: int,
    n_global: int,
    r_s: float | None = None,
    r_cut: float | None = None,
    bucket_capacity: int | None = None,
    axis_name: str = "shard",
) -> DomainP3M:
    """Derive the slab geometry: P3M split scales and a chaining-cell grid
    whose x-layers divide evenly over the devices."""
    from nbody.mesh.cells import cell_capacity

    cell = box / nmesh
    if r_s is None:
        r_s = 1.25 * cell
    if r_cut is None:
        r_cut = 4.5 * r_s
    ncell = int(box / float(r_cut))
    ncell -= ncell % n_dev
    if ncell < max(3, n_dev):
        raise ValueError(f"box/r_cut={box / r_cut:.1f} cannot host {n_dev} x-slabs")
    if nmesh % n_dev:
        raise ValueError(f"nmesh={nmesh} not divisible by {n_dev} devices")
    cap = bucket_capacity or cell_capacity(n_global, ncell)
    return DomainP3M(
        box=box, nmesh=nmesh, ncell=ncell, r_s=float(r_s), r_cut=float(r_cut),
        bucket_capacity=cap, n_dev=n_dev, axis_name=axis_name,
    )


def make_domain_p3m_local(
    cosmo,
    geom: DomainP3M,
    eps: float,
    deconvolve_p: int = 2,
    split: str = "spline",
    softening: str = "plummer",
    grad_order: str = "fd4",
    interlace: bool = False,
    part: str = "both",
    target_capacity: int = 128,
    shortrange: str = "cells",
    col_capacity: int | None = None,
    col_window: int | None = None,
) -> Callable:
    """Local (inside-shard_map) body: acc(pos_l, mass_l, a) -> (g_l, overflow).

    g is the canonical-momentum force -grad(phi)/a of
    nbody.integrate.run_cosmological; overflow counts particles whose
    bucket was full (their short-range force is dropped this step).
    ``split="none"`` turns off the force split and the short-range pass
    entirely — a pure domain-decomposed PM solver (local-slab deposit,
    distributed FFT, local-slab gather; no full-grid psum anywhere).

    ``interlace`` enables CONCEPT's two interlacing passes on the far
    field (half-cell-shifted second deposit combined in k space, forces
    gathered from BOTH grids — cf. `nbody.forces.pm._pm_acc_impl`).
    ``part`` selects "both" (default), "long" (mesh far field only,
    returns g without overflow) or "short" (pair correction only,
    returns (g, overflow)) — the split the subcycled domain integrator
    consumes (cf. `nbody.driver.simulate.build_cosmo_force_split`) — or
    "short_masked": ``acc(pos_l, mass_l, active_l, a) -> (g, ov_source,
    ov_target, occ_target)``, the rung tier's interior-tick force ON the
    active subset FROM all (two-plane cell kernel with a compact
    ``target_capacity``-wide active plane, cf.
    `nbody.forces.p3m.p3m_short_cells_pallas_masked`).

    ``shortrange`` selects the full short-range packing: "cells" (the
    ghost-padded cell plane) or "columns" (the z-sorted column tier,
    `nbody.forces.p3m_columns.p3m_short_columns_local` — measured 4.7x
    faster on clustered states single-device; its overflow word is
    field-encoded bucket*65536 + window).  ``col_capacity``/
    ``col_window`` override the auto column knobs.  The masked
    ("short_masked") kernel always rides the cells geometry.
    """
    from nbody.core import units as u
    from nbody.forces.p3m import run_cell_plane
    from nbody.forces.pm import _spline_filter_radial

    box, nmesh, ncell = geom.box, geom.nmesh, geom.ncell
    D, axis_name = geom.n_dev, geom.axis_name
    nxl = ncell // D
    M = ncell + 2
    base = 1.5 * cosmo.Omega_m * cosmo.H0**2
    G = u.COSMO.G
    eps2 = float(eps) ** 2
    if split == "spline":
        k_max = float(3.0**0.5 * np.pi * nmesh / box) * 1.0001
        ks_tab, F_tab = _spline_filter_radial(geom.r_cut, k_max)
        ks_tab, F_tab = jnp.asarray(ks_tab), jnp.asarray(F_tab)

    def _solve_grids(delta_k, a, kx, ky, kz, dtype):
        """k-space Poisson solve -> 3 real-space local force grids
        (3, nmesh/D, nmesh, nmesh), shared by the classic far field and
        the supercell tier.  ``delta_k`` must already be deconvolved."""
        h_cell = box / nmesh
        k2 = kx**2 + ky**2 + kz**2
        if split == "spline":
            km = jnp.sqrt(k2)
            F = jnp.interp(km, ks_tab, F_tab).astype(dtype)
        else:
            inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
            F = inv_k2
            if split == "gaussian":
                F = F * jnp.exp(-k2 * geom.r_s**2)
        amp = (base / a).astype(dtype) if hasattr(base / a, "astype") else base / a
        phi_k = -amp * delta_k * F
        gx = _grad1(kx, h_cell, grad_order)
        gy = _grad1(ky, h_cell, grad_order)
        gz = _grad1(kz, h_cell, grad_order)
        return phi_k, jnp.stack(
            [
                slab_irfftn(-1j * gj * phi_k, nmesh, axis_name)
                for gj in (gx, gy, gz)
            ]
        )

    def _deconvolved(delta_k, kx, ky, kz):
        if not deconvolve_p:
            return delta_k
        h_cell = box / nmesh

        def sinc(k):
            return jnp.sinc(k * (h_cell / (2.0 * np.pi)))

        W = (sinc(kx) * sinc(ky) * sinc(kz)) ** deconvolve_p
        return delta_k / jnp.maximum(W, 1e-8)

    def far_field(pos_l, mass_l, a):
        dtype = pos_l.dtype
        d = jax.lax.axis_index(axis_name)

        # ---- far field: slab deposit -> distributed FFT Poisson -------
        kx, ky, kz = kvecs_slab(nmesh, box, d, D, dtype)
        total_mass = jax.lax.psum(jnp.sum(mass_l), axis_name)
        mean_cell = total_mass / nmesh**3
        h_cell = box / nmesh
        if interlace:
            g0 = slab_deposit(
                pos_l, mass_l, box=box, nmesh=nmesh, n_dev=D,
                axis_name=axis_name,
            )
            g1 = slab_deposit(
                pos_l, mass_l, box=box, nmesh=nmesh, n_dev=D,
                axis_name=axis_name, shift=0.5,
            )
            k0 = slab_rfftn(g0, axis_name)
            k1 = slab_rfftn(g1, axis_name)
            # see nbody.mesh.cic.cic_deposit_interlaced_k for the phase
            # sign: e^{-i k.d/2} aligns the shifted grid so odd alias
            # images cancel
            ph = jnp.exp(-1j * ((kx + ky + kz) * (h_cell / 2.0)).astype(dtype))
            delta_k = 0.5 * (k0 + k1 * ph) / mean_cell
        else:
            grid_l = slab_deposit(
                pos_l, mass_l, box=box, nmesh=nmesh, n_dev=D,
                axis_name=axis_name,
            )
            delta_k = slab_rfftn(grid_l, axis_name) / mean_cell
        delta_k = _deconvolved(delta_k, kx, ky, kz)
        phi_k, grids = _solve_grids(delta_k, a, kx, ky, kz, dtype)
        acc_long = slab_gather3(
            grids, pos_l, box=box, n_dev=D, axis_name=axis_name
        )
        if interlace:
            # second force pass: read the alias-cancelled potential back
            # from the half-cell-shifted grid too and average (CONCEPT's
            # two passes; one-grid gather measured +-200% pair scatter)
            gx = _grad1(kx, h_cell, grad_order)
            gy = _grad1(ky, h_cell, grad_order)
            gz = _grad1(kz, h_cell, grad_order)
            ph_f = jnp.exp(
                1j * ((kx + ky + kz) * (h_cell / 2.0)).astype(dtype)
            )
            grids1 = jnp.stack(
                [
                    slab_irfftn(-1j * gj * phi_k * ph_f, nmesh, axis_name)
                    for gj in (gx, gy, gz)
                ]
            )
            acc1 = slab_gather3(
                grids1, pos_l, box=box, n_dev=D, axis_name=axis_name,
                shift=0.5,
            )
            acc_long = 0.5 * (acc_long + acc1)
        return acc_long

    if shortrange not in ("cells", "columns", "supercell"):
        raise ValueError(f"unknown domain shortrange {shortrange!r}")
    if shortrange in ("columns", "supercell") and not col_capacity:
        raise ValueError(
            f"shortrange={shortrange!r} needs an explicit col_capacity "
            "(compute it via nbody.forces.p3m_columns.column_params)"
        )
    sc_ncell = None
    if shortrange == "supercell":
        from nbody.forces.p3m import supercell_ncell

        sc_ncell = supercell_ncell(box, nmesh, geom.r_cut)
        if sc_ncell is None or sc_ncell % D:
            raise ValueError(
                f"domain supercell needs a divisor chaining grid that "
                f"also splits over {D} devices "
                f"(got sc_ncell={sc_ncell}) — use shortrange='columns'"
            )

    def supercell_eval(pos_l, mass_l, a_s, a_l):
        """Fused slab supercell evaluation: ONE local column sort, the
        MXU deposit (x-halo node planes by ppermute instead of the
        scatter deposit's spill exchanges), distributed-FFT solve, and
        the PM readback fused into the column kernel.  Returns
        (gs_raw * G/a_s, gl/a_l, overflow-word) — the split halves of
        `nbody.driver.simulate.build_cosmo_force_both`, on the slab.
        Reference: CONCEPT runs its identical P3M solver under MPI
        (`TheFeedingPipeline/NN.param:81-83`, `SnapVsPK/Ucertain.py:89`
        "Domain decomposition") — this is that solver's production
        tier, domain-resident."""
        from nbody.forces.p3m_columns import (
            build_local_column_plane, column_window, ghost_slots,
        )
        from nbody.forces.pm_supercell import (
            extract_local_subgrids, run_fused_column_plane,
            supercell_deposit_local, supercell_geometry,
        )

        dtype = pos_l.dtype
        d = jax.lax.axis_index(axis_name)
        S, ZP = supercell_geometry(nmesh, sc_ncell)
        CK = -(-col_capacity // 128) * 128
        gzs = ghost_slots(CK, (geom.r_cut / box) * CK)
        chunk = 256 if CK % 256 == 0 else 128
        stride = CK + 2 * gzs
        W = min(
            -(-(col_window or column_window(box, geom.r_cut, CK)) // 128)
            * 128,
            stride,
        )
        maxch = CK // chunk
        nxl_sc = sc_ncell // D

        plane, ws, nch, ov_b, ov_w, gidx, counts = build_local_column_plane(
            pos_l, mass_l, box=box, r_cut=geom.r_cut, ncell=sc_ncell,
            n_dev=D, col_capacity=CK, window=W, axis_name=axis_name,
            chunk=chunk,
        )
        # slab-local x for the deposit/readback node arithmetic (pair
        # differences are shift-invariant; sentinel x stays far outside
        # the node range)
        xoff = jnp.asarray(d * (box / D), dtype)
        plane = plane.at[0].add(-xoff)
        rho_l = supercell_deposit_local(
            plane, counts, box=box, nmesh=nmesh, ncell=sc_ncell, n_dev=D,
            stride=stride, gz=gzs, axis_name=axis_name, chunk=chunk,
        )
        kx, ky, kz = kvecs_slab(nmesh, box, d, D, dtype)
        total_mass = jax.lax.psum(jnp.sum(mass_l), axis_name)
        mean_cell = total_mass / nmesh**3
        h_cell = box / nmesh
        if interlace:
            # slab sibling of the single-device fused interlacing
            # (`nbody.forces.pm.pm_force_grids_from_rho_pair`): second
            # MXU deposit at the half-cell shift, alias cancellation in
            # k (phase e^{-i k.d/2} — CLAUDE.md convention), and the
            # shifted force grids contracted in-kernel as node rows 3-5
            # (the reference's shipped NN config interlaces forces AND
            # runs under MPI, `TheFeedingPipeline/NN.param:72-76` +
            # `SnapVsPK/Ucertain.py:89`)
            rho1_l = supercell_deposit_local(
                plane, counts, box=box, nmesh=nmesh, ncell=sc_ncell,
                n_dev=D, stride=stride, gz=gzs, axis_name=axis_name,
                chunk=chunk, shift=0.5,
            )
            ph_c = jnp.exp(
                -1j * ((kx + ky + kz) * (h_cell / 2.0)).astype(dtype)
            )
            delta_k = 0.5 * (
                slab_rfftn(rho_l, axis_name)
                + slab_rfftn(rho1_l, axis_name) * ph_c
            ) / mean_cell
        else:
            delta_k = slab_rfftn(rho_l, axis_name) / mean_cell
        delta_k = _deconvolved(delta_k, kx, ky, kz)
        phi_k, grids = _solve_grids(delta_k, a_l, kx, ky, kz, dtype)
        if interlace:
            # second force-readback grid set at the +half-cell shift
            # (phase e^{+i k.d/2}); the fused kernel's second triangle
            # contraction averages the two passes
            gxk = _grad1(kx, h_cell, grad_order)
            gyk = _grad1(ky, h_cell, grad_order)
            gzk = _grad1(kz, h_cell, grad_order)
            ph_f = jnp.exp(
                1j * ((kx + ky + kz) * (h_cell / 2.0)).astype(dtype)
            )
            grids1 = jnp.stack(
                [
                    slab_irfftn(-1j * gj * phi_k * ph_f, nmesh, axis_name)
                    for gj in (gxk, gyk, gzk)
                ]
            )
            grids = jnp.concatenate([grids, grids1], axis=0)
        subgrids = extract_local_subgrids(
            grids, sc_ncell, S, ZP, n_dev=D, axis_name=axis_name
        )
        out = run_fused_column_plane(
            plane, ws, nch, subgrids, ncell=sc_ncell, stride=stride, W=W,
            maxch=maxch, gz=gzs, chunk=chunk, eps2=eps2, r_s=geom.r_s,
            r_cut=geom.r_cut, split=split, softening=softening, S=S,
            ZP=ZP, scale=float(nmesh / box), split_out=True, nx=nxl_sc,
            interlaced=interlace,
        )
        buckets6 = jnp.concatenate(
            [out[:6].reshape(6, -1).T, jnp.zeros((1, 6), jnp.float32)],
            axis=0,
        )
        both = buckets6[gidx]
        acc_short = (G / a_s) * both[:, 0:3].astype(dtype)
        acc_long = both[:, 3:6].astype(dtype)
        ov = jnp.minimum(ov_b, 32767) * 65536 + jnp.minimum(ov_w, 65535)
        return acc_short, acc_long, ov

    def short_range(pos_l, mass_l, a):
        dtype = pos_l.dtype
        if shortrange in ("columns", "supercell"):
            # the supercell tier's part-half fallback rides the SAME
            # chaining geometry (sc_ncell) so capacity knobs stay
            # coherent across parts — cf. p3m_acc's supercell fallback
            from nbody.forces.p3m_columns import (
                column_window,
                p3m_short_columns_local,
            )

            acc, overflow = p3m_short_columns_local(
                pos_l, mass_l, box=box, eps=float(eps), r_s=geom.r_s,
                r_cut=geom.r_cut, G=G, ncell=sc_ncell or ncell, n_dev=D,
                col_capacity=col_capacity,
                window=col_window or column_window(
                    box, geom.r_cut, col_capacity
                ),
                axis_name=axis_name, split=split, softening=softening,
            )
            return acc / a, overflow
        plane, overflow, K, gidx = build_local_plane(
            pos_l, mass_l, box=box, r_cut=geom.r_cut, ncell=ncell, n_dev=D,
            capacity=geom.bucket_capacity, axis_name=axis_name,
        )
        out = run_cell_plane(
            plane, nx=nxl, ncell=ncell, K=K, eps2=eps2,
            r_s=geom.r_s, r_cut=geom.r_cut, split=split,
            softening=softening,
        )
        # gather back: each resident particle's acc lives in exactly one
        # interior slot; the sentinel row zeroes non-resident/overflow
        acc_buckets = jnp.concatenate(
            [out[:3].reshape(3, -1).T, jnp.zeros((1, 3), jnp.float32)],
            axis=0,
        )
        return acc_buckets[gidx].astype(dtype) * (G / a), overflow

    def short_range_masked(pos_l, mass_l, act_l, a):
        dtype = pos_l.dtype
        d = jax.lax.axis_index(axis_name)
        plane_j, ov_j, K_j, _ = build_local_plane(
            pos_l, mass_l, box=box, r_cut=geom.r_cut, ncell=ncell, n_dev=D,
            capacity=geom.bucket_capacity, axis_name=axis_name,
        )
        plane_i, ov_i, K_i, gidx = build_local_plane(
            pos_l, mass_l, box=box, r_cut=geom.r_cut, ncell=ncell, n_dev=D,
            capacity=target_capacity, axis_name=axis_name, valid=act_l,
        )
        # densest ACTIVE resident bucket (local slab cells only) so the
        # driver can pre-warm target_capacity for the next segment
        s = jnp.mod(pos_l, box) * (ncell / box)
        c = jnp.clip(s.astype(jnp.int32), 0, ncell - 1)
        cxl = c[:, 0] - d * nxl
        C3l = nxl * ncell * ncell
        res = act_l & (mass_l > 0) & (cxl >= 0) & (cxl < nxl)
        cid = jnp.where(
            res, (cxl * ncell + c[:, 1]) * ncell + c[:, 2], C3l
        )
        occ_i = (
            jnp.bincount(cid, length=C3l + 1)[:-1].max().astype(jnp.int32)
        )
        out = run_cell_plane(
            plane_i, nx=nxl, ncell=ncell, K=K_i, eps2=eps2,
            r_s=geom.r_s, r_cut=geom.r_cut, split=split,
            softening=softening, plane_j=plane_j, K_j=K_j,
        )
        acc_buckets = jnp.concatenate(
            [out[:3].reshape(3, -1).T, jnp.zeros((1, 3), jnp.float32)],
            axis=0,
        )
        return acc_buckets[gidx].astype(dtype) * (G / a), ov_j, ov_i, occ_i

    if part == "long":
        return far_field
    if part == "short":
        if split == "none":
            raise ValueError("part='short' is meaningless with split='none'")
        return short_range
    if part == "short_masked":
        if split == "none":
            raise ValueError(
                "part='short_masked' is meaningless with split='none'"
            )
        return short_range_masked
    if part == "split":
        if shortrange != "supercell":
            raise ValueError("part='split' is the fused supercell path")
        return supercell_eval
    if part != "both":
        raise ValueError(f"unknown part {part!r}")

    if shortrange == "supercell":

        def local_sc(pos_l, mass_l, a):
            acc_short, acc_long, ov = supercell_eval(pos_l, mass_l, a, a)
            return acc_long + acc_short, ov

        return local_sc

    def local(pos_l, mass_l, a):
        acc_long = far_field(pos_l, mass_l, a)
        if split == "none":  # pure PM: no short-range pass
            return acc_long, jnp.int32(0)
        acc_short, overflow = short_range(pos_l, mass_l, a)
        return acc_long + acc_short, overflow

    return local


def make_domain_p3m_force(
    cosmo,
    box: float,
    nmesh: int,
    mesh: Mesh,
    eps: float,
    n_global: int,
    axis_name: str = "shard",
    **kwargs,
) -> Callable:
    """shard_map-wrapped acc_fn(pos, mass, a) -> (g, overflow) on
    slab-resident sharded inputs (see domain_decompose)."""
    geom = domain_p3m_geometry(
        box, nmesh, mesh.shape[axis_name], n_global,
        r_s=kwargs.pop("r_s", None), r_cut=kwargs.pop("r_cut", None),
        bucket_capacity=kwargs.pop("bucket_capacity", None),
        axis_name=axis_name,
    )
    local = make_domain_p3m_local(cosmo, geom, eps, **kwargs)

    def body(pos_l, mass_l, a):
        g, ov = local(pos_l, mass_l, a)
        # pmax: the columns tier's overflow word is field-encoded
        return g, jax.lax.pmax(ov, axis_name)

    return _shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    ), geom


# ---------------------------------------------------------------------------
# Full domain-decomposed cosmological integration
# ---------------------------------------------------------------------------


def _rung_ticks(pos, p, mass, gl, gs, rung, Fk, Dr, A_sub, *, box, geom,
                D, E, axis_name, n_rungs, short_acc, masked_acc,
                frozen_masked=None, plan=None, stale_fn=None):
    """Sub-ticks 1..n_sub of one rung block step on the local slab.

    Each tick: drift all particles, migrate (rung labels + carried
    forces ride the exchange ppermutes), then kick — interior ticks via
    the masked two-plane kernel on the active rungs only (skipped in
    lockstep across devices while the active set is globally empty),
    the boundary tick via the full short force.  The caller applies the
    long half-kicks and the tick-0 short kick.

    With ``frozen_masked``/``plan`` (round-4 VERDICT item 5) interior
    ticks instead ride the step's FROZEN local column plan
    (`nbody.forces.p3m_columns.p3m_local_columns_frozen_masked`):
    no slab_exchange and no plane rebuild mid-step — particles stay on
    their freeze-time device (drift is bounded by the plan's skin/2,
    inside the halo margin) and migrate once, at the boundary tick.
    Drift beyond skin/2 raises the separate plan-stale channel (the
    driver heals ``column_skin``) — never a silent accuracy loss.

    Returns (pos, p, mass, gl, gs, ov_ex, ov_bk, ov_tg, occ_tg, ov_pl,
    ov_st) with per-knob overflow channels (exchange / source-plane
    bucket / active-target plane / frozen-plan word / plan staleness)
    plus the densest-active-bucket occupancy.
    """
    from nbody.integrate.cosmo_stepping import rung_active_min

    n_sub = 2 ** (n_rungs - 1)
    ov_ex = jnp.int32(0)
    ov_bk = jnp.int32(0)
    ov_tg = jnp.int32(0)
    occ_tg = jnp.int32(0)
    ov_pl = jnp.int32(0)
    ov_st = jnp.int32(0)
    dtype = pos.dtype
    rungf = rung.astype(dtype)
    for j in range(1, n_sub + 1):
        pos = jnp.mod(pos + p * Dr[j - 1], box)
        if frozen_masked is None or j == n_sub:
            pos, p, mass, (gl, gs, rungf), ov_e = slab_exchange(
                pos, p, mass,
                box=box, ncell=geom.ncell, n_dev=D,
                exchange_capacity=E, axis_name=axis_name,
                extras=(gl, gs, rungf),
            )
            ov_ex = jnp.maximum(ov_ex, ov_e)
            rung = rungf.astype(jnp.int32)
        if j < n_sub:
            act = (rung >= rung_active_min(j, n_rungs)) & (mass > 0)
            # uniform predicate (psum) so every device takes the same
            # branch and the collectives inside the masked force stay
            # aligned
            n_act = jax.lax.psum(jnp.sum(act.astype(jnp.int32)), axis_name)
            if frozen_masked is not None:
                g, ov_p = jax.lax.cond(
                    n_act > 0,
                    lambda pos=pos, mass=mass, act=act, j=j:
                        frozen_masked(pos, mass, act, A_sub[j - 1], plan),
                    lambda: (jnp.zeros_like(pos), jnp.int32(0)),
                )
                ov_pl = jnp.maximum(ov_pl, ov_p)
                if stale_fn is not None:
                    ov_st = jnp.maximum(
                        ov_st,
                        jnp.where(
                            n_act > 0, stale_fn(pos, plan), jnp.int32(0)
                        ),
                    )
            else:
                g, ov_j, ov_i, occ_i = jax.lax.cond(
                    n_act > 0,
                    lambda pos=pos, mass=mass, act=act, j=j:
                        masked_acc(pos, mass, act, A_sub[j - 1]),
                    lambda: (
                        jnp.zeros_like(pos),
                        jnp.int32(0),
                        jnp.int32(0),
                        jnp.int32(0),
                    ),
                )
                ov_bk = jnp.maximum(ov_bk, ov_j)
                ov_tg = jnp.maximum(ov_tg, ov_i)
                occ_tg = jnp.maximum(occ_tg, occ_i)
        else:
            g, ov_b = short_acc(pos, mass, A_sub[j - 1])
            gs = g
            ov_bk = jnp.maximum(ov_bk, ov_b)
        p = p + g * Fk[j][rung][:, None]
    return (pos, p, mass, gl, gs, ov_ex, ov_bk, ov_tg, occ_tg, ov_pl,
            ov_st)


class DomainRunResult(NamedTuple):
    state: ParticleState
    exchange_overflow: jax.Array  # int32 max over steps
    bucket_overflow: jax.Array  # int32 max over steps
    # rung tier only (None otherwise): active-target-plane overflow /
    # max TRUE occupancy (pre-warm signal), per-step rung populations
    target_overflow: jax.Array | None = None
    target_occupancy: jax.Array | None = None
    rung_hists: jax.Array | None = None  # (n_steps, n_rungs)
    # frozen rung tier only: the plan's field-encoded freeze-time
    # overflow word (heal: col_capacity / col_window) and the
    # plan-staleness count (drift beyond skin/2; heal: column_skin) —
    # both pmax-reduced across devices and steps
    plan_overflow: jax.Array | None = None
    plan_stale: jax.Array | None = None


def run_cosmological_domain(
    state: ParticleState,
    cosmo,
    a_grid,
    mesh: Mesh,
    *,
    box: float,
    nmesh: int,
    eps: float,
    n_global: int,
    axis_name: str = "shard",
    exchange_capacity: int | None = None,
    geom: DomainP3M | None = None,
    deconvolve_p: int = 2,
    split: str = "spline",
    grad_order: str = "fd4",
    interlace: bool = False,
    subcycles: int = 1,
    softening: str = "plummer",
    rungs: int = 0,
    eta_disp: float = 0.25,
    eta_acc: float = 0.025,
    target_capacity: int = 128,
    shortrange: str = "cells",
    col_capacity: int | None = None,
    col_window: int | None = None,
    rung_frozen: bool = False,
    column_skin: float = 0.0,
) -> DomainRunResult:
    """Comoving KDK over ``a_grid`` with slab-resident particles.

    One shard_map around the whole ``lax.scan``: per step a kick
    (domain P3M force), drift (+periodic wrap), ``slab_exchange``
    migration, and the closing kick — every collective (halo ppermutes,
    FFT all_to_alls, psums) stays inside the single XLA program.
    ``state`` must come from :func:`domain_decompose` (same mesh/ncell).

    ``subcycles`` > 1 runs the split-Hamiltonian KDK (far field at the
    global step, short-range KDK subcycled inside — the same scheme as
    `nbody.integrate.run_cosmological_subcycled`); each subcycle drift
    does its own slab migration, with the carried far-field force riding
    the exchange permutation.  ``interlace`` enables the two-pass
    interlaced far field.

    ``rungs`` >= 2 integrates with PER-PARTICLE rungs instead (CONCEPT's
    block-step scheme, the domain sibling of
    `nbody.integrate.run_cosmological_rungs`; overrides ``subcycles``):
    rungs assigned per global step from displacement+acceleration demand
    (``eta_disp``/``eta_acc``; the carried gl+gs rides the exchange),
    interior sub-ticks kick only the active rungs via the two-plane
    masked cell kernel (compact ``target_capacity``-wide active plane),
    and every sub-tick drift migrates — the rung labels travel with
    their particles through the same ppermutes.  While the active set is
    globally empty the interior tick skips plane build + kernel via
    ``lax.cond`` on a psum'd predicate (uniform across devices, so the
    collectives inside the taken branch stay aligned).
    """
    from nbody.integrate.cosmo_stepping import cosmo_kick_drift_factors

    D = mesh.shape[axis_name]
    if geom is None:
        geom = domain_p3m_geometry(box, nmesh, D, n_global, axis_name=axis_name)
    C = state.pos.shape[0] // D
    E = exchange_capacity or max(64, C // 8)
    if int(rungs) >= 2 and split == "none":
        raise ValueError(
            "rungs require a force split (split='none' is a pure PM "
            "solver with no short-range pass to subdivide)"
        )
    rung_mode = int(rungs) >= 2
    n_sub = int(subcycles)
    subcycled = (not rung_mode) and n_sub > 1 and split != "none"
    fkw = dict(deconvolve_p=deconvolve_p, split=split, grad_order=grad_order,
               interlace=interlace, softening=softening)
    # the rung tiers' BOUNDARY/masked evals keep the cells packing (the
    # masked interior kernel shares the cells geometry, and mixing the
    # columns tier's field-encoded overflow word with the cells counts
    # on one channel would confuse the driver's heal) — columns applies
    # to the plain and subcycled paths.  rung_frozen=True instead rides
    # a per-step FROZEN local column plan for the interior masked ticks
    # (separate plan_overflow/plan_stale channels; round-4 VERDICT
    # item 5 — the single-device frozen masked column tick measured
    # 51 ms vs the 304 ms masked cells tick, clustered N=2^20).
    fkw_s = fkw if rung_mode else fkw | dict(
        shortrange=shortrange, col_capacity=col_capacity,
        col_window=col_window,
    )
    frozen_fns = None
    if rung_mode:
        long_acc = make_domain_p3m_local(cosmo, geom, eps, part="long", **fkw)
        short_acc = make_domain_p3m_local(cosmo, geom, eps, part="short", **fkw)
        masked_acc = None
        if rung_frozen:
            if not col_capacity:
                raise ValueError(
                    "rung_frozen needs an explicit col_capacity (compute "
                    "it via nbody.forces.p3m_columns.column_params)"
                )
            if column_skin <= 0.0:
                raise ValueError(
                    "rung_frozen needs column_skin > 0 (the per-step "
                    "drift budget the frozen plan is sized for)"
                )
            from nbody.core import units as u
            from nbody.forces.p3m_columns import (
                column_window, freeze_local_column_plan, local_plan_stale,
                p3m_local_columns_frozen_masked,
            )

            _ck = -(-int(col_capacity) // 128) * 128
            _cw = int(col_window or column_window(box, geom.r_cut, _ck))
            _G = u.COSMO.G
            _skin = float(column_skin)

            def _freeze(pos_l, mass_l):
                return freeze_local_column_plan(
                    pos_l, mass_l, box=box, r_cut=geom.r_cut,
                    ncell=geom.ncell, n_dev=D, col_capacity=_ck,
                    window=_cw, axis_name=axis_name, skin=_skin,
                )

            def _frozen_masked(pos_l, mass_l, act_l, a, plan):
                g, ov = p3m_local_columns_frozen_masked(
                    pos_l, mass_l, act_l, plan, box=box, eps=float(eps),
                    r_s=geom.r_s, r_cut=geom.r_cut, G=_G,
                    ncell=geom.ncell, n_dev=D, col_capacity=_ck,
                    window=_cw, axis_name=axis_name, split=split,
                    softening=softening,
                )
                return g / a, ov

            def _stale(pos_l, plan):
                return local_plan_stale(pos_l, plan, box, _skin)

            frozen_fns = (_freeze, _frozen_masked, _stale)
        else:
            masked_acc = make_domain_p3m_local(
                cosmo, geom, eps, part="short_masked",
                target_capacity=target_capacity, **fkw,
            )
    elif subcycled:
        long_acc = make_domain_p3m_local(cosmo, geom, eps, part="long", **fkw)
        short_acc = make_domain_p3m_local(
            cosmo, geom, eps, part="short", **fkw_s
        )
        # fused trailing tick: the supercell tier evaluates the trailing
        # subcycle's short force and the closing long force from ONE
        # plane build + MXU deposit (cf. the single-device
        # run_cosmological_subcycled's acc_both_fn)
        both_acc = (
            make_domain_p3m_local(cosmo, geom, eps, part="split", **fkw_s)
            if shortrange == "supercell"
            else None
        )
    else:
        local_acc = make_domain_p3m_local(cosmo, geom, eps, **fkw_s)

    a_grid = np.asarray(a_grid, dtype=np.float64)
    K1, Dr, K2, _ = cosmo_kick_drift_factors(cosmo, a_grid)
    dtype = state.pos.dtype
    if rung_mode:
        from nbody.integrate.cosmo_stepping import rung_kick_tables

        Fk_t, Dr_t, A_t = rung_kick_tables(cosmo, a_grid, int(rungs))
        xs = (
            jnp.asarray(a_grid[:-1], dtype),
            jnp.asarray(a_grid[1:], dtype),
            jnp.asarray(K1, dtype),
            jnp.asarray(K2, dtype),
            jnp.asarray(Fk_t, dtype),
            jnp.asarray(Dr_t, dtype),
            jnp.asarray(A_t, dtype),
        )
    elif subcycled:
        n_steps = len(a_grid) - 1
        a0s, a1s = a_grid[:-1], a_grid[1:]
        Ks1 = np.empty((n_steps, n_sub))
        Drs = np.empty((n_steps, n_sub))
        Ks2 = np.empty((n_steps, n_sub))
        A_sub = np.empty((n_steps, n_sub))
        for i in range(n_steps):
            sub = np.geomspace(a0s[i], a1s[i], n_sub + 1)
            k1, dr, k2, _ = cosmo_kick_drift_factors(cosmo, sub)
            Ks1[i], Drs[i], Ks2[i] = k1, dr, k2
            A_sub[i] = sub[1:]
        xs = (
            jnp.asarray(a1s, dtype),
            jnp.asarray(K1, dtype),
            jnp.asarray(K2, dtype),
            jnp.asarray(Ks1, dtype),
            jnp.asarray(Drs, dtype),
            jnp.asarray(Ks2, dtype),
            jnp.asarray(A_sub, dtype),
        )
    else:
        xs = (
            jnp.asarray(a_grid[1:], dtype),
            jnp.asarray(K1, dtype),
            jnp.asarray(Dr, dtype),
            jnp.asarray(K2, dtype),
        )

    def local_run(pos_l, vel_l, mass_l, t0, xs):
        if rung_mode:
            from nbody.integrate.cosmo_stepping import (
                _assign_rungs,
                _rung_demand,
            )

            n_rungs = int(rungs)
            H0, Om, OL = (
                float(cosmo.H0), float(cosmo.Omega_m), float(cosmo.Omega_L)
            )
            celld = jnp.asarray(box / nmesh, dtype)
            etad = jnp.asarray(eta_disp, dtype)
            etaa = jnp.asarray(2.0 * float(eta_acc) * float(eps), dtype)

            gl0 = long_acc(pos_l, mass_l, t0)
            gs0, ov0 = short_acc(pos_l, mass_l, t0)

            def body(carry, x):
                (pos, vel, mass, gl, gs, ov_ex, ov_bk, ov_tg, occ_tg,
                 ov_pl, ov_st) = carry
                a0, a1, kl1, kl2, Fk_s, Dr_s, A_s = x

                dla_i = _rung_demand(vel, gl, gs, a0, celld, etad, etaa,
                                     H0, Om, OL)
                dla_i = jnp.where(mass > 0, dla_i, jnp.inf)
                rung = _assign_rungs(
                    dla_i, jnp.log(a1) - jnp.log(a0), n_rungs
                )
                # resident populations only (parked rows -> drop bin)
                hist = jax.lax.psum(
                    jnp.bincount(
                        jnp.where(mass > 0, rung, n_rungs),
                        length=n_rungs + 1,
                    )[:-1].astype(jnp.int32),
                    axis_name,
                )

                if frozen_fns is not None:
                    # per-step boundary freeze: positions are unchanged
                    # since the previous boundary exchange, so this IS
                    # the boundary-freeze protocol (at most one argsort
                    # per global step; CLAUDE.md); the plan serves all
                    # of this step's interior masked ticks
                    plan = frozen_fns[0](pos, mass)
                    ov_pl = jnp.maximum(ov_pl, plan.ov)
                else:
                    plan = None

                p = vel + gl * kl1             # long opening half-kick
                p = p + gs * Fk_s[0][rung][:, None]
                (pos, p, mass, gl, gs, ov_e, ov_b, ov_t, occ_t, ov_p,
                 ov_s) = _rung_ticks(
                    pos, p, mass, gl, gs, rung, Fk_s, Dr_s, A_s,
                    box=box, geom=geom, D=D, E=E, axis_name=axis_name,
                    n_rungs=n_rungs, short_acc=short_acc,
                    masked_acc=masked_acc,
                    frozen_masked=(
                        frozen_fns[1] if frozen_fns is not None else None
                    ),
                    plan=plan,
                    stale_fn=(
                        frozen_fns[2] if frozen_fns is not None else None
                    ),
                )
                ov_ex = jnp.maximum(ov_ex, ov_e)
                ov_bk = jnp.maximum(ov_bk, ov_b)
                ov_tg = jnp.maximum(ov_tg, ov_t)
                occ_tg = jnp.maximum(occ_tg, occ_t)
                ov_pl = jnp.maximum(ov_pl, ov_p)
                ov_st = jnp.maximum(ov_st, ov_s)

                gl = long_acc(pos, mass, a1)
                vel = p + gl * kl2
                return (
                    pos, vel, mass, gl, gs, ov_ex, ov_bk, ov_tg, occ_tg,
                    ov_pl, ov_st,
                ), hist

            init = (
                pos_l, vel_l, mass_l, gl0, gs0,
                jnp.int32(0), ov0, jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.int32(0),
            )
            (
                pos_l, vel_l, mass_l, _, _, ov_ex, ov_bk, ov_tg, occ_tg,
                ov_pl, ov_st,
            ), hists = jax.lax.scan(body, init, xs)
            return (
                pos_l, vel_l, mass_l,
                jax.lax.psum(ov_ex, axis_name),
                jax.lax.psum(ov_bk, axis_name),
                jax.lax.psum(ov_tg, axis_name),
                jax.lax.pmax(occ_tg, axis_name),
                jax.lax.pmax(ov_pl, axis_name),
                jax.lax.pmax(ov_st, axis_name),
                hists,
            )

        if subcycled:
            gl0 = long_acc(pos_l, mass_l, t0)
            gs0, ov0 = short_acc(pos_l, mass_l, t0)

            def body(carry, x):
                pos, vel, mass, gl, gs, ov_ex, ov_bk = carry
                a1, kl1, kl2, ks1, drs, ks2, a_sub = x
                p = vel + gl * kl1  # long half-kick (far field frozen)

                def sub(j, c):
                    pos, p, mass, gl, gs, ov_e2, ov_b2 = c
                    p1 = p + gs * ks1[j]
                    pos1 = jnp.mod(pos + p1 * drs[j], box)
                    pos1, p1, mass, (gl,), ov_e = slab_exchange(
                        pos1, p1, mass,
                        box=box, ncell=geom.ncell, n_dev=D,
                        exchange_capacity=E, axis_name=axis_name,
                        extras=(gl,),
                    )
                    gs1, ov_b = short_acc(pos1, mass, a_sub[j])
                    p2 = p1 + gs1 * ks2[j]
                    return (
                        pos1, p2, mass, gl, gs1,
                        jnp.maximum(ov_e2, ov_e), jnp.maximum(ov_b2, ov_b),
                    )

                if both_acc is None:
                    pos, p, mass, gl, gs, ov_e, ov_b = jax.lax.fori_loop(
                        0, n_sub, sub,
                        (pos, p, mass, gl, gs, jnp.int32(0), jnp.int32(0)),
                    )
                    gl_new = long_acc(pos, mass, a1)
                else:
                    pos, p, mass, gl, gs, ov_e, ov_b = jax.lax.fori_loop(
                        0, n_sub - 1, sub,
                        (pos, p, mass, gl, gs, jnp.int32(0), jnp.int32(0)),
                    )
                    j = n_sub - 1
                    p = p + gs * ks1[j]
                    pos = jnp.mod(pos + p * drs[j], box)
                    pos, p, mass, ov_e2 = slab_exchange(
                        pos, p, mass,
                        box=box, ncell=geom.ncell, n_dev=D,
                        exchange_capacity=E, axis_name=axis_name,
                    )
                    ov_e = jnp.maximum(ov_e, ov_e2)
                    gs, gl_new, ov_b2 = both_acc(pos, mass, a_sub[j], a1)
                    ov_b = jnp.maximum(ov_b, ov_b2)
                    p = p + gs * ks2[j]
                vel = p + gl_new * kl2
                return (
                    pos, vel, mass, gl_new, gs,
                    jnp.maximum(ov_ex, ov_e), jnp.maximum(ov_bk, ov_b),
                ), None

            init = (pos_l, vel_l, mass_l, gl0, gs0, jnp.int32(0), ov0)
            (pos_l, vel_l, mass_l, _, _, ov_ex, ov_bk), _ = jax.lax.scan(
                body, init, xs
            )
            # pmax, not psum: with the columns tier the overflow word is
            # field-encoded (bucket*65536 + window) and summing across
            # devices could bleed the window field into the bucket field;
            # the max word keeps the bucket field dominant — the heal
            # priority the driver wants
            return (
                pos_l, vel_l, mass_l,
                jax.lax.psum(ov_ex, axis_name),
                jax.lax.pmax(ov_bk, axis_name),
            )

        g0, ov0 = local_acc(pos_l, mass_l, t0)

        def body(carry, x):
            pos, vel, mass, g, ov_ex, ov_bk = carry
            a1, k1, dr, k2 = x
            p_half = vel + g * k1
            pos = jnp.mod(pos + p_half * dr, box)
            pos, p_half, mass, ov_e = slab_exchange(
                pos, p_half, mass,
                box=box, ncell=geom.ncell, n_dev=D,
                exchange_capacity=E, axis_name=axis_name,
            )
            g_new, ov_b = local_acc(pos, mass, a1)
            vel = p_half + g_new * k2
            return (
                pos, vel, mass, g_new,
                jnp.maximum(ov_ex, ov_e), jnp.maximum(ov_bk, ov_b),
            ), None

        init = (pos_l, vel_l, mass_l, g0, jnp.int32(0), ov0)
        (pos_l, vel_l, mass_l, _, ov_ex, ov_bk), _ = jax.lax.scan(
            body, init, xs
        )
        # pmax for the (possibly field-encoded) bucket word — see the
        # subcycled branch
        return (
            pos_l, vel_l, mass_l,
            jax.lax.psum(ov_ex, axis_name), jax.lax.pmax(ov_bk, axis_name),
        )

    n_scalar_out = 7 if rung_mode else 2
    run = _shard_map(
        local_run,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name), P(),
            tuple(P() for _ in xs),
        ),
        out_specs=(
            P(axis_name), P(axis_name), P(axis_name),
            *([P()] * n_scalar_out),
        ),
        check_vma=False,
    )
    out = jax.jit(run)(
        state.pos, state.vel, state.mass,
        jnp.asarray(a_grid[0], dtype), xs,
    )
    if rung_mode:
        (pos, vel, mass, ov_ex, ov_bk, ov_tg, occ_tg, ov_pl, ov_st,
         hists) = out
        return DomainRunResult(
            state=ParticleState(
                pos=pos, vel=vel, mass=mass,
                time=jnp.asarray(a_grid[-1], dtype),
            ),
            exchange_overflow=ov_ex,
            bucket_overflow=ov_bk,
            target_overflow=ov_tg,
            target_occupancy=occ_tg,
            rung_hists=hists,
            plan_overflow=ov_pl,
            plan_stale=ov_st,
        )
    pos, vel, mass, ov_ex, ov_bk = out
    return DomainRunResult(
        state=ParticleState(
            pos=pos, vel=vel, mass=mass, time=jnp.asarray(a_grid[-1], dtype)
        ),
        exchange_overflow=ov_ex,
        bucket_overflow=ov_bk,
    )


class DomainAdaptiveResult(NamedTuple):
    state: ParticleState
    n_steps: jax.Array  # int32 steps taken this call
    exchange_overflow: jax.Array
    bucket_overflow: jax.Array
    target_overflow: jax.Array
    target_occupancy: jax.Array
    dla_last: jax.Array  # last chosen background step
    rung_hist: jax.Array  # (n_rungs,) populations of the last step


def run_cosmological_domain_adaptive(
    state: ParticleState,
    cosmo,
    a_end: float,
    mesh: Mesh,
    *,
    box: float,
    nmesh: int,
    eps: float,
    n_global: int,
    axis_name: str = "shard",
    exchange_capacity: int | None = None,
    geom: DomainP3M | None = None,
    deconvolve_p: int = 2,
    split: str = "spline",
    grad_order: str = "fd4",
    interlace: bool = False,
    softening: str = "plummer",
    rungs: int = 1,
    dla_max: float = 0.03,
    eta_disp: float = 0.25,
    eta_acc: float = 0.025,
    target_capacity: int = 128,
    max_steps: int = 8,
) -> DomainAdaptiveResult:
    """Adaptive background step x per-particle rungs on the slab domain
    tier — the multi-chip form of
    `nbody.integrate.cosmo_stepping.make_adaptive_rung_runner` (CONCEPT's
    full integrator structure; its MPI runs pick the step collectively
    the same way).

    Per step, fully on device inside one ``lax.while_loop`` under one
    ``shard_map``: per-particle demand on the local slab, the global
    step

        dla = min(dla_max, 2^(rungs-1) * pmin_i dla_i, ln a_end - ln a0)

    (``lax.pmin`` makes the choice identical on every device, so the
    while_loop trip count and every collective stay aligned), on-device
    Gauss-Legendre kick tables for the traced [a0, a1], then the same
    rung tick loop as the fixed-grid tier (:func:`_rung_ticks` —
    per-tick migration, masked interior kicks).  ``rungs=1`` degenerates
    to a plain adaptive KDK (boundary ticks only).

    ``max_steps`` bounds one dispatch (TPU relay limit) — call
    repeatedly until ``state.time`` reaches ``a_end``.
    """
    from nbody.integrate.cosmo_stepping import (
        _assign_rungs,
        _rung_demand,
        _rung_tables_device,
    )

    D = mesh.shape[axis_name]
    if geom is None:
        geom = domain_p3m_geometry(box, nmesh, D, n_global,
                                   axis_name=axis_name)
    C = state.pos.shape[0] // D
    E = exchange_capacity or max(64, C // 8)
    n_rungs = int(rungs)
    depth = float(2 ** (n_rungs - 1))
    fkw = dict(deconvolve_p=deconvolve_p, split=split,
               grad_order=grad_order, interlace=interlace,
               softening=softening)
    long_acc = make_domain_p3m_local(cosmo, geom, eps, part="long", **fkw)
    short_acc = make_domain_p3m_local(cosmo, geom, eps, part="short", **fkw)
    masked_acc = make_domain_p3m_local(
        cosmo, geom, eps, part="short_masked",
        target_capacity=target_capacity, **fkw,
    )
    H0, Om, OL = float(cosmo.H0), float(cosmo.Omega_m), float(cosmo.Omega_L)
    eta_acc_eps2 = 2.0 * float(eta_acc) * float(eps)
    dtype = state.pos.dtype

    def local_run(pos_l, vel_l, mass_l, t0, a_end_):
        celld = jnp.asarray(box / nmesh, dtype)
        etad = jnp.asarray(eta_disp, dtype)
        etaa = jnp.asarray(eta_acc_eps2, dtype)

        gl0 = long_acc(pos_l, mass_l, t0)
        gs0, ov0 = short_acc(pos_l, mass_l, t0)
        hist0 = jnp.zeros((n_rungs,), jnp.int32)

        def cond(carry):
            t, n = carry[3], carry[-1]
            return jnp.logical_and(t < a_end_, n < max_steps)

        def body(carry):
            (pos, vel, mass, t, gl, gs,
             ov_ex, ov_bk, ov_tg, occ_tg, _dla, _hist, n) = carry
            dla_i = _rung_demand(vel, gl, gs, t, celld, etad, etaa,
                                 H0, Om, OL)
            dla_i = jnp.where(mass > 0, dla_i, jnp.inf)
            # identical on every device: pmin over the slab minima
            dla_min = jax.lax.pmin(jnp.min(dla_i), axis_name)
            dla = jnp.minimum(
                jnp.minimum(jnp.asarray(dla_max, dtype), depth * dla_min),
                jnp.log(a_end_) - jnp.log(t),
            )
            dla = jnp.maximum(dla, jnp.asarray(1e-8, dtype))
            a1 = jnp.exp(jnp.log(t) + dla)
            kl1, kl2, Fk, Dr, A_sub = _rung_tables_device(
                t, a1, n_rungs, H0, Om, OL, dtype
            )
            rung = _assign_rungs(dla_i, dla, n_rungs)
            hist = jax.lax.psum(
                jnp.bincount(
                    jnp.where(mass > 0, rung, n_rungs), length=n_rungs + 1
                )[:-1].astype(jnp.int32),
                axis_name,
            )
            p = vel + gl * kl1
            p = p + gs * Fk[0][rung][:, None]
            (pos, p, mass, gl, gs, ov_e, ov_b, ov_t, occ_t, _,
             _) = _rung_ticks(
                pos, p, mass, gl, gs, rung, Fk, Dr, A_sub,
                box=box, geom=geom, D=D, E=E, axis_name=axis_name,
                n_rungs=n_rungs, short_acc=short_acc,
                masked_acc=masked_acc,
            )
            gl = long_acc(pos, mass, a1)
            vel = p + gl * kl2
            return (
                pos, vel, mass, a1, gl, gs,
                jnp.maximum(ov_ex, ov_e), jnp.maximum(ov_bk, ov_b),
                jnp.maximum(ov_tg, ov_t), jnp.maximum(occ_tg, occ_t),
                dla, hist, n + 1,
            )

        init = (
            pos_l, vel_l, mass_l, t0, gl0, gs0,
            jnp.int32(0), ov0, jnp.int32(0), jnp.int32(0),
            jnp.asarray(dla_max, dtype), hist0, jnp.int32(0),
        )
        (pos_l, vel_l, mass_l, t, _, _, ov_ex, ov_bk, ov_tg, occ_tg,
         dla, hist, n) = jax.lax.while_loop(cond, body, init)
        return (
            pos_l, vel_l, mass_l, t, n,
            jax.lax.psum(ov_ex, axis_name),
            jax.lax.psum(ov_bk, axis_name),
            jax.lax.psum(ov_tg, axis_name),
            jax.lax.pmax(occ_tg, axis_name),
            dla, hist,
        )

    run = _shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=(
            P(axis_name), P(axis_name), P(axis_name),
            *([P()] * 8),
        ),
        check_vma=False,
    )
    pos, vel, mass, t, n, ov_ex, ov_bk, ov_tg, occ_tg, dla, hist = jax.jit(
        run
    )(state.pos, state.vel, state.mass, jnp.asarray(state.time, dtype),
      jnp.asarray(a_end, dtype))
    return DomainAdaptiveResult(
        state=ParticleState(pos=pos, vel=vel, mass=mass, time=t),
        n_steps=n,
        exchange_overflow=ov_ex,
        bucket_overflow=ov_bk,
        target_overflow=ov_tg,
        target_occupancy=occ_tg,
        dla_last=dla,
        rung_hist=hist,
    )
