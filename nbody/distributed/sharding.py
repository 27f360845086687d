"""Multi-chip scaling: shard_map ring all-pairs and sharded PM.

This is the TPU-native replacement for the MPI domain decomposition the
reference gets from CONCEPT ("MPI layout: Node 0", "Domain decomposition:
1x1x1" in its run logs; launcher `-n` flag `SnapVsPK/Ucertain.py:89`;
SURVEY.md §2.3 and §5.8).  Instead of spatial domains + ghost exchange,
particles are block-sharded over a 1-D ``jax.sharding.Mesh`` axis and the
O(N^2) force is computed ring-attention-style (SURVEY.md §5.7):

  each device holds N/D targets; the (pos, mass) source block rotates
  around the ring via ``ppermute`` D times; every hop each device
  accumulates the partial force of its resident targets against the
  visiting sources with the Pallas tiled kernel.  After D hops every
  target has seen every source — no psum needed for the force itself
  (it is fully local); collectives appear only in scalar diagnostics.

The sharded PM path deposits each shard's particles to a local grid,
``psum``s the grids (one all-reduce of nmesh^3 values over ICI), runs the
replicated FFT Poisson solve, and gathers forces locally.

Communication volume per force evaluation: ring PP moves 4 N floats per
device total (same as ring attention's K/V blocks); PM moves one grid.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from nbody.core.types import ParticleState
from nbody.forces.pallas_pp import block_acc_pallas
from nbody.forces.allpairs import _pair_terms
from nbody.mesh.cic import cic_deposit, cic_gather, cic_window
from nbody.forces.pm import gradient_kernel
from nbody.mesh.grids import kvecs


def device_mesh(n_devices: int | None = None, axis_name: str = "shard") -> Mesh:
    """A 1-D mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), axis_names=(axis_name,))


def shard_state(state: ParticleState, mesh: Mesh, axis_name: str = "shard") -> ParticleState:
    """Place a ParticleState with particles block-sharded over the mesh.

    N must be divisible by the axis size (pad upstream if needed — ICs in
    this framework produce power-of-two or nmesh^3 counts).
    """
    d = mesh.shape[axis_name]
    if state.n % d:
        raise ValueError(f"N={state.n} not divisible by {d} devices")
    sharded = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return ParticleState(
        pos=jax.device_put(state.pos, sharded),
        vel=jax.device_put(state.vel, sharded),
        mass=jax.device_put(state.mass, sharded),
        time=jax.device_put(state.time, repl),
    )


def make_ring_acc_fn(
    mesh: Mesh,
    eps: float,
    G: float = 1.0,
    axis_name: str = "shard",
    use_pallas: bool | None = None,
) -> Callable:
    """Build acc_fn(pos, mass) -> (acc, phi) running the ring exchange.

    The returned function is a shard_map program: call it under jit with
    block-sharded (N,3)/(N,) inputs (see shard_state); outputs carry the
    same sharding.  Composes with nbody.integrate.run / run_with_diagnostics
    unchanged — the whole simulation including the ring stays in one XLA
    program.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n_dev = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    eps2 = float(eps) ** 2

    def local_block(pos_i, pos_j, mass_j):
        if use_pallas:
            return block_acc_pallas(pos_i, pos_j, mass_j, eps)
        return _pair_terms(pos_i, pos_j, mass_j, jnp.asarray(eps2, pos_i.dtype))

    def ring(pos_l, mass_l):
        # pos_l: (n_loc, 3) local block
        def body(carry, _):
            pj, mj, acc, pot = carry
            a, p = local_block(pos_l, pj, mj)
            pj = jax.lax.ppermute(pj, axis_name, perm)
            mj = jax.lax.ppermute(mj, axis_name, perm)
            return (pj, mj, acc + a, pot + p), None

        acc0 = jnp.zeros_like(pos_l)
        pot0 = jnp.zeros(pos_l.shape[:1], pos_l.dtype)
        (_, _, acc, pot), _ = jax.lax.scan(
            body, (pos_l, mass_l, acc0, pot0), None, length=n_dev
        )
        # strip the self-pair potential (eps > 0: zero force, m/eps pot)
        phi = -G * (pot - mass_l * (eps2**-0.5))
        return G * acc, phi

    return _shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )


def make_ring_ewald_acc_fn(
    mesh: Mesh,
    box: float,
    eps: float,
    G: float = 1.0,
    r_s: float | None = None,
    n_max: int = 10,
    softening: str = "plummer",
    axis_name: str = "shard",
) -> Callable:
    """Distributed EXACT periodic PP force (Ewald) — the multi-device
    sibling of `nbody.forces.ewald.ewald_pp_acc` (round-3 VERDICT
    missing #4: CONCEPT's PP solver runs under the same MPI
    decomposition, `Different_Sizes/Giant.param:66-68`).

    Real-space half: the erfc-weighted pair sum over MINIMUM images
    rides the ring exchange (each device's block visits every other
    block by ppermute; r_cut = 0.4999 box, so every pair is evaluated
    once at its nearest image — the same decomposition ewald_pp_acc's
    dense kernel uses).  k-space half: the structure factor (Ck, Sk)
    is a psum over the ring's local partial sums, then each device
    reads back its own rows — one scan over lane-chunked mode tables.

    Returns acc_fn(pos, mass) -> acc for block-sharded inputs (parked
    rows with mass 0 contribute nothing and get the field of the
    others — harmless, their kicks are mass-weighted downstream).
    """
    from nbody.forces.ewald import _half_space_modes
    from nbody.forces.p3m import _weight_fn

    if r_s is None:
        r_s = box / 16.0
    n_dev = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    eps2 = float(eps) ** 2
    r_cut = 0.4999 * box
    wfn = _weight_fn("gaussian", softening)
    chunk = 512
    nmod = _half_space_modes(n_max)
    K = nmod.shape[0]
    pad = -(-K // chunk) * chunk
    kv = np.zeros((pad, 3))
    kv[:K] = nmod * (2.0 * np.pi / box)
    k2 = (kv**2).sum(axis=1)
    w = np.zeros(pad)
    w[:K] = np.exp(-k2[:K] * float(r_s) ** 2) / k2[:K]

    def block(pos_i, pos_j, mass_j):
        d = pos_j[None, :, :] - pos_i[:, None, :]
        d = d - box * jnp.round(d * (1.0 / box))
        r2 = jnp.sum(d * d, axis=-1)
        wgt = mass_j[None, :] * wfn(r2, eps2, float(r_s), r_cut)
        return jnp.sum(wgt[..., None] * d, axis=1)

    def local(pos_l, mass_l):
        dtype = pos_l.dtype
        posw = jnp.mod(pos_l, box)

        def body(carry, _):
            pj, mj, acc = carry
            a = block(posw, pj, mj)
            pj = jax.lax.ppermute(pj, axis_name, perm)
            mj = jax.lax.ppermute(mj, axis_name, perm)
            return (pj, mj, acc + a), None

        (_, _, acc_sr), _ = jax.lax.scan(
            body, (posw, mass_l, jnp.zeros_like(pos_l)), None,
            length=n_dev,
        )

        kvecs = jnp.asarray(kv.reshape(pad // chunk, chunk, 3), dtype)
        wk = jnp.asarray(w.reshape(pad // chunk, chunk), dtype)

        def kbody(acc, x):
            kc, wc = x
            phase = posw @ kc.T  # (n_loc, chunk)
            c = jnp.cos(phase)
            s = jnp.sin(phase)
            Ck = jax.lax.psum(mass_l @ c, axis_name)  # (chunk,)
            Sk = jax.lax.psum(mass_l @ s, axis_name)
            kw = kc * wc[:, None]
            return acc + s @ (kw * Ck[:, None]) - c @ (kw * Sk[:, None]), None

        acc_lr, _ = jax.lax.scan(
            kbody, jnp.zeros_like(pos_l), (kvecs, wk)
        )
        acc_lr = acc_lr * jnp.asarray(
            -2.0 * 4.0 * np.pi / box**3, dtype
        )
        return G * acc_sr + G * acc_lr

    return _shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )


def make_sharded_pm_cosmo_force(
    cosmo,
    box: float,
    nmesh: int,
    mesh: Mesh,
    axis_name: str = "shard",
    deconvolve_p: int = 2,
    grad_order: str = "fd4",
) -> Callable:
    """Sharded comoving PM force: local CIC deposit -> psum(grid) ->
    replicated FFT Poisson -> local gather.

    g(pos, mass, a) = -grad phi,  lap phi = (3/2) Om H0^2 delta / a.
    Inputs block-sharded like make_ring_acc_fn; the psum of the deposit
    grid is the single collective per evaluation (the analogue of
    CONCEPT's FFTW-MPI transpose exchange).
    """
    base = 1.5 * cosmo.Omega_m * cosmo.H0**2

    def local(pos_l, mass_l, a):
        dtype = pos_l.dtype
        grid = cic_deposit(pos_l, box, nmesh, weights=mass_l)
        grid = jax.lax.psum(grid, axis_name)
        total_mass = jax.lax.psum(jnp.sum(mass_l), axis_name)
        mean = total_mass / nmesh**3
        delta_k = jnp.fft.rfftn(grid) / mean
        if deconvolve_p:
            W = cic_window(nmesh, box, p=deconvolve_p, dtype=dtype)
            delta_k = delta_k / jnp.maximum(W, 1e-8)
        kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=dtype)
        k2 = kx**2 + ky**2 + kz**2
        inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
        amp = base / a
        phi_k = -amp * delta_k * inv_k2
        gx, gy, gz = gradient_kernel(nmesh, box, grad_order, dtype)
        shape = (nmesh,) * 3
        acc = [
            cic_gather(jnp.fft.irfftn(-1j * gj * phi_k, s=shape), pos_l, box)
            for gj in (gx, gy, gz)
        ]
        return jnp.stack(acc, axis=-1)

    return _shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )


def make_sharded_p3m_cosmo_force(
    cosmo,
    box: float,
    nmesh: int,
    mesh: Mesh,
    eps: float,
    axis_name: str = "shard",
    deconvolve_p: int = 2,
    split: str = "spline",
    grad_order: str = "fd4",
    r_s: float | None = None,
    r_cut: float | None = None,
    capacity: int | None = None,
) -> Callable:
    """Sharded comoving P3M: sharded PM far field + slab-decomposed
    cell-kernel short range.

    This is the full production multi-chip gravity — the TPU equivalent of
    CONCEPT's MPI domain decomposition for P3M (SURVEY.md §2.2/§5.8):

      * far field: local CIC deposit of each particle shard ->
        ``psum``(grid) -> replicated filtered FFT Poisson solve -> local
        gather (one nmesh^3 all-reduce per evaluation);
      * short range: the ghost-padded bucket plane is sliced into
        x-slabs of cell columns; device d runs the Pallas cell-pair
        kernel over its nx = ncell/D slabs (the slab's +/-1 halo columns
        are part of the contiguous slice), then partial per-particle
        forces are ``psum``-reduced and re-sliced to the particle blocks.

    Positions are globally visible during the short-range pass (one
    ``all_gather`` of the (N, 3) block ring — 12 MB at N = 1M), so this
    scales *compute* with D; spatially-resident particle storage is the
    next tier (ppermute halo exchange of boundary buckets only).

    Inputs/outputs are particle-block-sharded like make_ring_acc_fn:
    acc_fn(pos, mass, a) -> g with g = -grad phi / a conventions of
    nbody.integrate.run_cosmological.  ncell is derived from r_cut and
    rounded DOWN to a multiple of the axis size.
    """
    import numpy as np

    from nbody.forces.p3m import build_padded_plane, run_cell_plane
    from nbody.forces.pm import gradient_kernel, spline_longrange_filter
    from nbody.mesh.cells import cell_capacity
    from nbody.core import units as u

    D = mesh.shape[axis_name]
    cell = box / nmesh
    if r_s is None:
        r_s = 1.25 * cell
    if r_cut is None:
        r_cut = 4.5 * r_s
    ncell = int(box / float(r_cut))
    ncell -= ncell % D  # slab decomposition needs D | ncell
    if ncell < max(3, D):
        raise ValueError(
            f"box/r_cut = {box / r_cut:.1f} cannot host {D} x-slabs"
        )
    nxl = ncell // D  # real x-slabs per device
    M = ncell + 2
    base = 1.5 * cosmo.Omega_m * cosmo.H0**2
    G = u.COSMO.G
    eps2 = float(eps) ** 2

    def local(pos_l, mass_l, a):
        dtype = pos_l.dtype
        n_loc = pos_l.shape[0]
        d = jax.lax.axis_index(axis_name)

        # ---- far field: sharded PM with the split filter --------------
        grid = cic_deposit(pos_l, box, nmesh, weights=mass_l)
        grid = jax.lax.psum(grid, axis_name)
        total_mass = jax.lax.psum(jnp.sum(mass_l), axis_name)
        delta_k = jnp.fft.rfftn(grid) / (total_mass / nmesh**3)
        if deconvolve_p:
            W = cic_window(nmesh, box, p=deconvolve_p, dtype=dtype)
            delta_k = delta_k / jnp.maximum(W, 1e-8)
        kx, ky, kz = kvecs(nmesh, box, rfft=True, dtype=dtype)
        k2 = kx**2 + ky**2 + kz**2
        amp = base / a
        if split == "spline":
            F = spline_longrange_filter(nmesh, box, float(r_cut), dtype)
        else:
            inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
            F = inv_k2 * jnp.exp(-k2 * float(r_s) ** 2)
        phi_k = -amp * delta_k * F
        gx, gy, gz = gradient_kernel(nmesh, box, grad_order, dtype)
        shape = (nmesh,) * 3
        from nbody.mesh.cic import cic_gather_vec

        grids = jnp.stack(
            [jnp.fft.irfftn(-1j * gj * phi_k, s=shape) for gj in (gx, gy, gz)]
        )
        acc_long = cic_gather_vec(grids, pos_l, box)

        # ---- short range: slab-decomposed cell kernel -----------------
        pos_g = jax.lax.all_gather(pos_l, axis_name).reshape(-1, 3)
        mass_g = jax.lax.all_gather(mass_l, axis_name).reshape(-1)
        n = pos_g.shape[0]
        cap = capacity or cell_capacity(n, ncell)
        plane, _overflow, K, gidx = build_padded_plane(
            pos_g, mass_g, box, float(r_cut), ncell, cap
        )
        plane3 = plane.reshape(8, M, M * M * K)
        local_plane = jax.lax.dynamic_slice_in_dim(
            plane3, d * nxl, nxl + 2, axis=1
        ).reshape(8, (nxl + 2) * M * M * K)
        out = run_cell_plane(
            local_plane, nx=nxl, ncell=ncell, K=K, eps2=eps2,
            r_s=float(r_s), r_cut=float(r_cut), split=split,
        )
        # gather-back: a particle's slot lies in this device's slab iff
        # its padded x-layer falls in (d*nxl, d*nxl + nxl]; the psum over
        # devices then counts each particle exactly once
        rel = gidx - d * nxl * M * M * K
        in_slab = (rel >= M * M * K) & (rel < (nxl + 1) * M * M * K)
        rel = jnp.where(in_slab, rel, (nxl + 2) * M * M * K)
        acc_buckets = jnp.concatenate(
            [out[:3].reshape(3, -1).T, jnp.zeros((1, 3), jnp.float32)],
            axis=0,
        )
        acc_partial = acc_buckets[rel]
        acc_short_g = jax.lax.psum(acc_partial, axis_name)
        acc_short = jax.lax.dynamic_slice_in_dim(
            acc_short_g, d * n_loc, n_loc, axis=0
        ).astype(dtype) * (G / a)

        return acc_long + acc_short

    return _shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
