"""Micro-benchmarks of the MXU kernel's stages on the real chip.

All inputs are single VMEM-resident blocks (index maps return 0) and the
grid is iterated many times, so each variant measures pure compute
throughput of one stage of the Gram kernel, not HBM or dispatch.
Run: timeout 900 python -u scripts/exp_mxu_micro.py > /tmp/mxu_micro.txt
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI, TJ = 512, 1024
NI, NJ = 128, 128  # visits; pairs = NI*NJ*TI*TJ = 8.6e9
PAIRS = NI * NJ * TI * TJ


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out.ravel()[:2])
    ts = []
    rng = np.random.default_rng(0)
    for _ in range(reps):
        args2 = tuple(a + jnp.float32(rng.uniform(1e-6, 1e-4)) for a in args)
        t0 = time.perf_counter()
        out = fn(*args2)
        np.asarray(out.ravel()[:2])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, dt):
    print(f"{name:34s} {dt:.4f} s  {PAIRS/dt:.3e} pairs/s  "
          f"{dt/PAIRS*1e12:.3f} ps/pair", flush=True)


def run_variant(name, kernel, in_specs, arrays):
    f = pl.pallas_call(
        kernel,
        grid=(NI, NJ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, TI), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, TI), jnp.float32),
    )
    jf = jax.jit(lambda *a: f(*a))
    try:
        dt = timed(jf, *arrays)
        report(name, dt)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    print("backend:", jax.default_backend(), "pairs/call:", PAIRS, flush=True)
    rng = np.random.default_rng(1)
    big = jnp.asarray(rng.uniform(1.0, 2.0, (TJ, TI)), jnp.float32)
    asub = jnp.asarray(rng.uniform(-1, 1, (TJ, 8)), jnp.float32)
    bi = jnp.asarray(rng.uniform(0.1, 1, (8, TI)), jnp.float32)
    lane = jnp.asarray(rng.uniform(-1, 1, (8, TJ)), jnp.float32)

    spec_big = pl.BlockSpec((TJ, TI), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    spec_asub = pl.BlockSpec((TJ, 8), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_bi = pl.BlockSpec((8, TI), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_lane = pl.BlockSpec((8, TJ), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)

    def acc_out(out_ref, upd):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = upd

        @pl.when(j > 0)
        def _():
            out_ref[:] = out_ref[:] + upd

    # V1: rsqrt chain + rowsum of a VMEM-resident big matrix
    def v1(big_ref, out_ref):
        r2 = big_ref[:, :]
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
        upd = jnp.broadcast_to(jnp.sum(w, axis=0, keepdims=True), (8, TI))
        acc_out(out_ref, upd)

    run_variant("V1 rsqrt chain + rowsum", v1, [spec_big], (big,))

    # V1b: single elementwise op + rowsum (VPU floor)
    def v1b(big_ref, out_ref):
        w = big_ref[:, :] * 2.0
        upd = jnp.broadcast_to(jnp.sum(w, axis=0, keepdims=True), (8, TI))
        acc_out(out_ref, upd)

    run_variant("V1b 1 mul + rowsum", v1b, [spec_big], (big,))

    # V2: K=8 Gram matmul + rowsum
    def v2(asub_ref, bi_ref, out_ref, *, prec):
        r2 = jax.lax.dot_general(
            asub_ref[:, :], bi_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        upd = jnp.broadcast_to(jnp.sum(r2, axis=0, keepdims=True), (8, TI))
        acc_out(out_ref, upd)

    P = jax.lax.Precision
    for prec in (P.DEFAULT, P.HIGHEST):
        run_variant(f"V2 gram K=8 {prec}", functools.partial(v2, prec=prec),
                    [spec_asub, spec_bi], (asub, bi))

    # V3: big-K accumulation matmul only
    def v3(lane_ref, big_ref, out_ref, *, prec):
        upd = jax.lax.dot_general(
            lane_ref[:, :], big_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc_out(out_ref, upd)

    for prec in (P.DEFAULT, P.HIGHEST):
        run_variant(f"V3 accum K=TJ {prec}",
                    functools.partial(v3, prec=prec),
                    [spec_lane, spec_big], (lane, big))

    # V4: full pipeline gram -> rsqrt chain -> accum
    def v4(asub_ref, lane_ref, bi_ref, out_ref, *, gprec, aprec):
        r2 = jax.lax.dot_general(
            asub_ref[:, :], bi_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=gprec,
        )
        inv = jax.lax.rsqrt(jnp.abs(r2) + 0.01)
        w = (inv * inv) * inv
        upd = jax.lax.dot_general(
            lane_ref[:, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=aprec,
        )
        acc_out(out_ref, upd)

    for gp, ap in ((P.DEFAULT, P.DEFAULT), (P.HIGHEST, P.DEFAULT),
                   (P.HIGHEST, P.HIGHEST)):
        run_variant(f"V4 full g={gp} a={ap}",
                    functools.partial(v4, gprec=gp, aprec=ap),
                    [spec_asub, spec_lane, spec_bi], (asub, lane, bi))

    # V5: old-kernel body (exact dx, all-VPU) for the same tiles
    packed_i = jnp.asarray(rng.uniform(0, 1, (4, TI)), jnp.float32)
    packed_j = jnp.asarray(rng.uniform(0, 1, (4, TJ)), jnp.float32)
    spec_pi = pl.BlockSpec((4, TI), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_pj = pl.BlockSpec((4, TJ), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    def v5(pi_ref, pj_ref, out_ref):
        xi = pi_ref[0, :][:, None]
        yi = pi_ref[1, :][:, None]
        zi = pi_ref[2, :][:, None]
        xj = pj_ref[0, :][None, :]
        yj = pj_ref[1, :][None, :]
        zj = pj_ref[2, :][None, :]
        mj = pj_ref[3, :][None, :]
        dx = xj - xi
        dy = yj - yi
        dz = zj - zi
        r2 = dx * dx + dy * dy + dz * dz + 0.01
        inv_r = jax.lax.rsqrt(r2)
        mw = mj * inv_r
        w = mw * inv_r * inv_r
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        az = jnp.sum(w * dz, axis=1)
        pot = jnp.sum(mw, axis=1)
        upd = jnp.broadcast_to(
            jnp.stack([ax, ay, az, pot])[:, None, :].reshape(4, TI)[0:1],
            (8, TI),
        )
        acc_out(out_ref, upd)

    run_variant("V5 old VPU body (ti lanes)", v5, [spec_pi, spec_pj],
                (packed_i, packed_j))


if __name__ == "__main__":
    main()
