"""Exact periodic PP gravity via Ewald summation.

CONCEPT's PP solver computes the exact *periodic* force (Ewald-corrected
direct summation), while the round-1 PP tier here used the nearest image
only — a systematic at box-scale separations in the PP leg of the
PP/PM/P3M study (reference `PPPMP3M/pppmp3mplotter.py`).  This module
closes that gap the TPU way, with no Ewald-table interpolation gathers:

  * real-space part: the erfc-split short-range pair force
    C(r) = erfc(r/2r_s) + (r/r_s)/sqrt(pi) exp(-r^2/4r_s^2), summed over
    minimum images by the dense Pallas tile kernel
    (:func:`nbody.forces.p3m.p3m_short_acc`) with r_s = box/16 — at
    r = box/2 the tail is < 1e-6, so one image suffices;
  * k-space part: the Gaussian-filtered long-range force evaluated
    EXACTLY per particle from the structure factor,

      F(x_i) = -(4 pi G / V) sum_k (k/k^2) e^{-k^2 r_s^2}
               [sin(k.x_i) C_k - cos(k.x_i) S_k],
      C_k = sum_j m_j cos(k.x_j),  S_k = sum_j m_j sin(k.x_j),

    a pure matmul/trig pipeline of shape (N, K) x (K, 3) that rides the
    MXU; modes stream in chunks through a ``lax.scan`` so the (N, K)
    phase matrix never materialises.  No mesh, hence no aliasing error —
    unlike PM, this is exact to the truncation e^{-(pi n_max/8)^2}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _half_space_modes(n_max: int) -> np.ndarray:
    """Integer mode vectors n with |n| <= n_max, one of each +/-k pair
    (k-space sum contributions are even under k -> -k, so the half space
    counts double)."""
    r = np.arange(-n_max, n_max + 1)
    n = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    n2 = (n**2).sum(axis=1)
    half = (
        (n[:, 2] > 0)
        | ((n[:, 2] == 0) & (n[:, 1] > 0))
        | ((n[:, 2] == 0) & (n[:, 1] == 0) & (n[:, 0] > 0))
    )
    keep = half & (n2 > 0) & (n2 <= n_max**2)
    return n[keep]


@functools.partial(
    jax.jit,
    static_argnames=("box", "G", "r_s", "n_max", "chunk"),
)
def ewald_kspace_acc(
    pos,
    mass,
    box: float,
    G: float = 1.0,
    r_s: float | None = None,
    n_max: int = 10,
    chunk: int = 512,
):
    """The k-space (long-range) half of the Ewald force."""
    if r_s is None:
        r_s = box / 16.0
    dtype = pos.dtype
    mass = mass.astype(dtype)
    n = _half_space_modes(n_max)
    K = n.shape[0]
    pad = -(-K // chunk) * chunk
    kv = np.zeros((pad, 3))
    kv[:K] = n * (2.0 * np.pi / box)
    k2 = (kv**2).sum(axis=1)
    w = np.zeros(pad)
    w[:K] = np.exp(-k2[:K] * float(r_s) ** 2) / k2[:K]
    kvecs = jnp.asarray(kv.reshape(pad // chunk, chunk, 3), dtype)
    wk = jnp.asarray(w.reshape(pad // chunk, chunk), dtype)

    def body(acc, x):
        kc, wc = x
        phase = pos @ kc.T  # (N, chunk)
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        Ck = mass @ c  # (chunk,)
        Sk = mass @ s
        kw = kc * wc[:, None]  # (chunk, 3)
        acc = acc + s @ (kw * Ck[:, None]) - c @ (kw * Sk[:, None])
        return acc, None

    acc0 = jnp.zeros_like(pos)
    acc, _ = jax.lax.scan(body, acc0, (kvecs, wk))
    # x2 for the mirrored -k half space
    return acc * jnp.asarray(-2.0 * 4.0 * np.pi * G / box**3, dtype)


def ewald_pp_acc(
    pos,
    mass,
    box: float,
    eps: float = 0.0,
    G: float = 1.0,
    r_s: float | None = None,
    n_max: int = 10,
    softening: str = "plummer",
    interpret: bool | None = None,
):
    """Exact periodic direct-summation force (Ewald), Plummer-softened.

    Real-space erfc part over minimum images (dense Pallas kernel) plus
    the exact k-space structure-factor sum.  With the defaults
    (r_s = box/16, n_max = 10) both truncations are below 1e-5 relative.
    The softening applies to the short-range Newton term exactly as in
    the non-periodic solver.
    """
    from nbody.forces.p3m import p3m_short_acc

    mass = mass.astype(pos.dtype)
    if r_s is None:
        r_s = box / 16.0
    acc_sr = p3m_short_acc(
        pos, mass, box, float(eps), float(r_s), 0.4999 * box, G=G,
        interpret=interpret, split="gaussian", softening=softening,
    )
    acc_lr = ewald_kspace_acc(
        pos, mass, box, G=G, r_s=float(r_s), n_max=n_max
    )
    return acc_sr + acc_lr


def ewald_potential_energy(
    pos,
    mass,
    box: float,
    G: float = 1.0,
    r_s: float | None = None,
    n_max: int = 10,
):
    """Exact periodic potential energy W = 1/2 sum_i m_i phi(x_i) with
    lap(phi) = 4 pi G (rho - rho_mean) — the Ewald energy matching
    :func:`ewald_pp_acc` with eps = 0 (dense jnp; diagnostics/tests).

    Standard Ewald energy (alpha = 1/(2 r_s)), gravity signs:

      U = -G [ U_real + U_k + U_self + U_bg ],
      U_real = 1/2 sum_{i!=j} m_i m_j erfc(alpha r_ij)/r_ij   (min image)
      U_k    = (2 pi / V) sum_{k!=0} e^{-k^2/4a^2}/k^2 |S(k)|^2
      U_self = -(alpha/sqrt(pi)) sum m_i^2
      U_bg   = -(pi / (2 V alpha^2)) (sum m_i)^2

    Used to certify the Layzer-Irvine machinery: integrating with the
    (force-consistent) Ewald PP force, the LI residual drops to pure
    time-stepping error, isolating the PM energy-functional floor
    (round-1 VERDICT item #5).
    """
    from jax.scipy.special import erfc

    if r_s is None:
        r_s = box / 16.0
    dtype = pos.dtype
    mass = mass.astype(dtype)
    alpha = 1.0 / (2.0 * float(r_s))
    n = pos.shape[0]
    d = pos[None, :, :] - pos[:, None, :]
    d = d - box * jnp.round(d / box)
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-300))
    off = ~jnp.eye(n, dtype=bool)
    U_real = 0.5 * jnp.sum(
        jnp.where(off, mass[:, None] * mass[None, :] * erfc(alpha * r) / r, 0.0)
    )

    modes = _half_space_modes(n_max)
    kv = jnp.asarray(modes * (2.0 * np.pi / box), dtype)
    k2 = jnp.sum(kv**2, axis=1)
    w = jnp.exp(-k2 * float(r_s) ** 2) / k2
    phase = pos @ kv.T  # (N, K)
    Ck = mass @ jnp.cos(phase)
    Sk = mass @ jnp.sin(phase)
    # x2: half space counts both +k and -k (|S(k)|^2 even)
    U_k = (2.0 * np.pi / box**3) * 2.0 * jnp.sum(w * (Ck**2 + Sk**2))

    U_self = -(alpha / np.sqrt(np.pi)) * jnp.sum(mass**2)
    U_bg = -(np.pi / (2.0 * box**3 * alpha**2)) * jnp.sum(mass) ** 2
    return -G * (U_real + U_k + U_self + U_bg)
