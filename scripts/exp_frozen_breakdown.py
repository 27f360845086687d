"""Breakdown of the frozen-column short eval at bench scale: plane
assembly (gather + masks + pad) vs kernel vs readback — sizes the win
of a frozen-plan masked interior tick for the rung tier."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.abs(leaf.ravel()[:2]))


def timed(fn, *args, reps=3, label=""):
    _sync(fn(*args))
    ts = []
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for _ in range(reps):
        a0 = args[0]
        if jnp.issubdtype(a0.dtype, jnp.floating):
            pert = a0 + jnp.asarray(rng.uniform(1e-6, 1e-4), a0.dtype)
        else:
            pert = a0
        t0 = time.perf_counter()
        out = fn(pert, *args[1:])
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def main():
    from nbody.forces.p3m import p3m_short_params, supercell_ncell
    from nbody.forces.p3m_columns import (
        _plane_from_buf, _rows_to_buf, _run_column_kernel, _slot_sources,
        column_window, freeze_column_plan, ghost_slots,
        p3m_short_columns_frozen,
    )

    n = 1 << 20
    box, nmesh = 500.0, 128
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    r_s, r_cut, _, _ = p3m_short_params(box, nmesh, n)
    ncell = supercell_ncell(box, nmesh, r_cut)
    mean_col = n / ncell**2
    CK = -(-int(mean_col + 6.0 * mean_col**0.5 + 8) // 128) * 128
    W = column_window(box, r_cut, CK)
    gz = ghost_slots(CK, (r_cut / box) * CK)
    stride = CK + 2 * gz
    Wc = min(-(-W // 128) * 128, stride)
    skin = 0.05 * r_cut
    print(f"ncell={ncell} CK={CK} gz={gz} stride={stride} W={Wc}",
          flush=True)

    plan = freeze_column_plan(pos, mass, box, float(r_cut), ncell, CK, W,
                              skin=skin)
    _sync(plan.pos0)

    @jax.jit
    def assemble(p):
        posw = jnp.mod(p, box).astype(jnp.float32)
        d = posw - plan.pos0
        d = d - box * jnp.round(d * (1.0 / box))
        rows = jnp.concatenate(
            [plan.pos0 + d, mass[:, None]], axis=1
        )[plan.src_g]
        _, src_ok, is_front, is_interior, is_back = _slot_sources(
            plan.starts, plan.counts, CK, gz, stride
        )
        buf, _ = _rows_to_buf(rows, src_ok, is_front, is_interior,
                              is_back, box, r_cut, 1.0001 * r_cut)
        return _plane_from_buf(buf, box, ncell, stride)

    t_asm = timed(assemble, pos, label="frozen plane assembly (gather+pad)")

    plane = assemble(pos)
    kern = jax.jit(lambda pl: _run_column_kernel(
        pl, plan.ws, plan.nch, ncell=ncell, stride=stride, W=Wc,
        maxch=CK // 256, gz=gz, chunk=256, eps=eps, r_s=r_s, r_cut=r_cut,
        split="spline", softening="spline", interpret=False))
    t_k = timed(kern, plane, label="column kernel (full, frozen windows)")

    out = kern(plane)
    P2 = (ncell + 2) ** 2

    def gath(o):
        accb = jnp.concatenate(
            [o[:3].reshape(3, P2 * stride).T,
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        return accb[plan.gidx]

    t_g = timed(jax.jit(gath), out, label="readback gather (N rows)")

    full = jax.jit(lambda p: p3m_short_columns_frozen(
        pos=p, mass=mass, plan=plan, box=box, eps=float(eps),
        r_s=float(r_s), r_cut=float(r_cut), ncell=ncell,
        col_capacity=CK, window=W, split="spline", softening="spline"))
    t_f = timed(full, pos, label="p3m_short_columns_frozen (total)")
    print(f"accounted {1e3*(t_asm+t_k+t_g):.0f} ms of {1e3*t_f:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
