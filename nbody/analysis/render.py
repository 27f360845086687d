"""Density-projection rendering of particle states.

Closes the BASELINE.json north-star output path ("trajectory
snapshot/render output computed on-device"): the projection is a CIC
deposit onto a 2D grid done with jnp on device; only the final image
crosses to the host.  Works from live ParticleStates or CONCEPT snapshot
files.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("res", "axis"))
def density_projection(pos, box: float, res: int = 512, axis: int = 2,
                       weights=None):
    """(res, res) surface-density image: CIC deposit of the particles
    projected along ``axis`` (on device)."""
    dims = [d for d in range(3) if d != axis]
    xy = jnp.mod(pos[:, dims], box) * (res / box)
    i0 = jnp.floor(xy).astype(jnp.int32)
    f = xy - i0
    n = pos.shape[0]
    w0 = jnp.ones((n,), pos.dtype) if weights is None else weights
    img = jnp.zeros((res * res,), pos.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            w = (
                (f[:, 0] if dx else 1 - f[:, 0])
                * (f[:, 1] if dy else 1 - f[:, 1])
                * w0
            )
            ix = jnp.mod(i0[:, 0] + dx, res)
            iy = jnp.mod(i0[:, 1] + dy, res)
            img = img.at[ix * res + iy].add(w)
    return img.reshape(res, res)


def save_density_image(pos, box: float, path: str, res: int = 512,
                       axis: int = 2, cmap: str = "inferno"):
    """Render a log-scaled surface-density PNG from particle positions."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(density_projection(jnp.asarray(pos), box, res=res, axis=axis))
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(
        np.log10(img + 1e-2).T, origin="lower", cmap=cmap,
        extent=[0, box, 0, box],
    )
    ax.set(xlabel="Mpc", ylabel="Mpc")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return img


def render_snapshot(snapshot_path: str, out_path: str, res: int = 512,
                    axis: int = 2):
    """CONCEPT HDF5 snapshot -> density PNG."""
    from nbody.io.snapshot import read_snapshot

    state, meta = read_snapshot(snapshot_path)
    return save_density_image(state.pos, meta.boxsize, out_path, res=res,
                              axis=axis)
