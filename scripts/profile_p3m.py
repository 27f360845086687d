"""Per-stage wall-time breakdown of the production P3M force at bench
scale (N = 2^20, 128^3 mesh) on the real chip — what to optimize next.

Stages: CIC deposit, FFT forward, k-space solve + 3 inverse FFTs,
CIC vector gather, cell-plane build (bucketing + gathers), cell kernel,
scatter-back.  Timing per verify SKILL: fresh perturbations, host
readback sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    # complex readback is UNIMPLEMENTED over the relay -> abs() first
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.abs(leaf.ravel()[:2]))


def timed(fn, *args, reps=3, label=""):
    _sync(fn(*args))
    ts = []
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    for _ in range(reps):
        # perturb the first positional arg if it's a float array
        a0 = args[0]
        if jnp.issubdtype(a0.dtype, jnp.complexfloating):
            pert = a0 * (1.0 + rng.uniform(1e-6, 1e-4))
        elif jnp.issubdtype(a0.dtype, jnp.floating):
            pert = a0 + jnp.asarray(rng.uniform(1e-6, 1e-4), a0.dtype)
        else:
            pert = a0
        t0 = time.perf_counter()
        out = fn(pert, *args[1:])
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:40s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts)


def steps_mode(n_steps: int = 4, subcycles: int = 4, fused: bool = True):
    """Full-KDK steps/sec at N = 2^20 (VERDICT round-2 item 8): times the
    production subcycled split-Hamiltonian stepper — the dispatch-bound
    regime the effective-rate headline can't see.  Prints ONE JSON line
    {"steps_per_s": ...} so the verify drive can regression-guard it.

    ``fused`` mirrors the driver: boundary ticks evaluate short + long
    from one supercell call (`build_cosmo_force_both`); pass
    ``--unfused`` for the separate-halves baseline."""
    import json

    from nbody.core.cosmology import Cosmology
    from nbody.core.types import ParticleState
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import (
        build_cosmo_force_both, build_cosmo_force_frozen,
        build_cosmo_force_split,
    )
    from nbody.integrate.cosmo_stepping import (
        log_a_steps, run_cosmological_subcycled,
    )

    n = 1 << 20
    box = 500.0
    cfg = SimulationConfig(
        n_side=round(n ** (1 / 3)), box=box, solver="p3m", pm_grid=128,
        softening_kernel="spline", subcycles=subcycles,
    )
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    state = ParticleState(
        pos=pos, vel=jnp.zeros_like(pos),
        mass=jnp.ones((n,), jnp.float32),  # timing only; value is inert
        time=jnp.float32(0.5),
    )
    cosmo = Cosmology()
    long_fn, short_fn = build_cosmo_force_split(cfg)
    both_fn = build_cosmo_force_both(cfg) if fused else None
    frozen_fns = build_cosmo_force_frozen(cfg) if fused else None
    frozen_both = None
    if fused and frozen_fns is not None:
        from nbody.driver.simulate import build_cosmo_force_frozen_both

        fb = build_cosmo_force_frozen_both(cfg)
        frozen_both = fb[1] if fb is not None else None
    a_grid = log_a_steps(0.5, 0.52, n_steps)

    def run(st):
        out = run_cosmological_subcycled(
            st, cosmo, a_grid, long_fn, short_fn, box,
            n_sub=subcycles, acc_both_fn=both_fn, frozen_fns=frozen_fns,
            frozen_both_fn=frozen_both,
        )
        return out

    _sync(run(state)[0].pos)  # compile + warm
    ts = []
    for _ in range(2):
        st = state.replace(
            pos=jnp.mod(pos + jnp.asarray(
                rng.uniform(1e-4, 1e-2), jnp.float32), box)
        )
        t0 = time.perf_counter()
        out = run(st)
        _sync(out[0].pos)
        ts.append(time.perf_counter() - t0)
    sps = n_steps / min(ts)
    print(json.dumps({
        "metric": (
            f"full subcycled KDK steps/s, N={n}, {subcycles}x"
            + (" (fused tick + frozen plans)" if fused else "")
        ),
        "steps_per_s": round(sps, 3),
        "s_per_step": round(min(ts) / n_steps, 3),
    }), flush=True)


def rungs_mode(n_steps: int = 4, n_rungs: int = 3, frac_hot: float = 0.05,
               fused: bool = True, frozen: bool = True,
               clustered: bool = False, ablate: str = ""):
    """Per-particle-rung KDK steps/sec at N = 2^20 (VERDICT round-3 item
    1): times the rung tier — the one that wins the parity wall — at
    bench scale.  ``frac_hot`` sets the synthetic velocity tail so
    ~that fraction of particles land above rung 0 (CONCEPT-like
    populations: run log "Rung population: matter: 31147, 1157, 464").
    ``clustered=True`` places the hot tail in ~64 spatial blobs — the
    physically representative geometry (deep-rung particles are halo
    particles), where the masked tick's active-chunk skipping engages.
    Prints ONE JSON line {"steps_per_s": ...}."""
    import json

    from nbody.core.cosmology import Cosmology
    from nbody.core.types import ParticleState
    from nbody.driver.config import SimulationConfig
    from nbody.driver.simulate import (
        build_cosmo_force_both, build_cosmo_force_frozen,
        build_cosmo_force_rungs,
    )
    from nbody.integrate.cosmo_stepping import (
        log_a_steps, run_cosmological_rungs,
    )

    n = 1 << 20
    box = 500.0
    nmesh = 128
    cfg = SimulationConfig(
        n_side=round(n ** (1 / 3)), box=box, solver="p3m", pm_grid=nmesh,
        softening_kernel="spline", rungs=n_rungs,
    )
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    # velocity tail placing ~frac_hot of particles above rung 0: the
    # displacement demand is dla_i = eta cell a^2 H / |p|, rung >= 1
    # wants dla_i < dla_step
    cosmo = Cosmology()
    a0, a1 = 0.5, 0.52
    a_grid = log_a_steps(a0, a1, n_steps)
    dla_step = float(np.log(a_grid[1]) - np.log(a_grid[0]))
    H = cosmo.H0 * float(np.sqrt(cosmo.Omega_m / a0**3 + cosmo.Omega_L))
    cell = box / nmesh
    p_thr = cfg.step_eta_disp * cell * a0**2 * H / dla_step
    speeds = np.abs(rng.lognormal(mean=0.0, sigma=1.0, size=n))
    if frac_hot > 0:
        speeds *= p_thr / np.quantile(speeds, 1.0 - frac_hot)
    else:
        # every particle on rung 0: interior masked ticks skip via
        # lax.cond — isolates boundary tick + integrator overhead
        speeds *= 0.01 * p_thr / speeds.max()
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    vel = jnp.asarray(speeds[:, None] * dirs, jnp.float32)
    if clustered:
        hot = speeds > p_thr
        nh = int(hot.sum())
        centers = rng.uniform(0, box, (64, 3))
        blob = centers[rng.integers(0, 64, nh)] + rng.normal(
            0, 0.01 * box, (nh, 3)
        )
        pos_np = np.array(pos)
        pos_np[hot] = blob % box
        pos = jnp.asarray(pos_np, jnp.float32)
    state = ParticleState(
        pos=pos, vel=vel, mass=jnp.ones((n,), jnp.float32),
        time=jnp.float32(a0),
    )
    rung_fns = build_cosmo_force_rungs(cfg)
    both_fn = build_cosmo_force_both(cfg) if fused else None
    kw = {}
    if frozen:
        from nbody.driver.simulate import build_cosmo_force_frozen_both

        fbf = build_cosmo_force_frozen_both(cfg)
        if ablate and fbf is not None:
            # measurement-only stubs to decompose the IN-SCAN step
            # budget (isolated-jit walls overlap inside the scan):
            #   nodrift  — drift check pinned True (no mid-step
            #              refreeze, physics stale but load identical)
            #   notick   — interior masked ticks return zero force
            #              (everything but the masked kernel+assembly)
            #   nodrift+notick etc. compose with '+'
            freeze_fn, both_fz, drift_ok, masked_fz = fbf[:4]
            rest = fbf[4:]
            parts = set(ablate.split("+"))
            if "nodrift" in parts:
                drift_ok = lambda pos, plan: jnp.bool_(True)  # noqa: E731
            if "notick" in parts:
                masked_fz = (  # noqa: E731
                    lambda pos, mass_, act, a_, plan: (
                        jnp.zeros_like(pos), jnp.int32(0),
                    )
                )
            fbf = (freeze_fn, both_fz, drift_ok, masked_fz) + rest
        kw["frozen_both_fns"] = fbf

    if "--compact" in sys.argv and kw.get("frozen_both_fns") is not None:
        # compact active-row kicks — measured SLOWER at bench scale
        # (2.26 -> 2.10 steps/s: XLA scatter-add + nonzero beat the
        # full-N gather they replace); kept as an explicit experiment
        kw["active_capacity"] = -(-max(n // 8, 2048) // 128) * 128

    def run(st):
        return run_cosmological_rungs(
            st, cosmo, a_grid, rung_fns[0], rung_fns[1], rung_fns[2],
            box, n_rungs, cell,
            eta_disp=cfg.step_eta_disp, eta_acc=cfg.step_eta_acc,
            eps=cfg.eps, acc_both_fn=both_fn, **kw,
        )

    out = run(state)
    _sync(out[0].pos)  # compile + warm
    hists = np.asarray(out[-1])
    ts = []
    for _ in range(2):
        st = state.replace(
            pos=jnp.mod(pos + jnp.asarray(
                rng.uniform(1e-4, 1e-2), jnp.float32), box)
        )
        t0 = time.perf_counter()
        out = run(st)
        _sync(out[0].pos)
        ts.append(time.perf_counter() - t0)
    sps = n_steps / min(ts)
    print(json.dumps({
        "metric": (
            f"rung-tier KDK steps/s, N={n}, {n_rungs} rungs"
            + (" (fused boundary tick)" if fused else "")
            + (" (frozen plans)" if frozen else "")
            + (" (clustered hot tail)" if clustered else "")
            + (f" (ABLATED: {ablate})" if ablate else "")
        ),
        "steps_per_s": round(sps, 3),
        "s_per_step": round(min(ts) / n_steps, 3),
        "rung_hist_step0": [int(x) for x in hists[0]],
    }), flush=True)


def main():
    from nbody.forces.p3m import (
        build_padded_plane, p3m_acc, p3m_short_params, run_cell_plane,
    )
    from nbody.mesh.cic import cic_deposit, cic_gather_vec

    n = 1 << 20
    box, nmesh = 500.0, 128
    eps = 0.03 * box / round(n ** (1 / 3))
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    r_s, r_cut, ncell, capacity = p3m_short_params(box, nmesh, n)
    print(f"N={n} mesh={nmesh} ncell={ncell} capacity={capacity}", flush=True)

    t_total = timed(
        jax.jit(lambda p: p3m_acc(p, mass, box, nmesh, eps=eps,
                                  shortrange="cells", split="spline")),
        pos, label="TOTAL p3m_acc")

    dep = jax.jit(lambda p: cic_deposit(p, box, nmesh, weights=mass))
    t_dep = timed(dep, pos, label="cic_deposit (scatter-add)")

    grid = dep(pos)
    fft = jax.jit(lambda g: jnp.fft.rfftn(g))
    t_fft = timed(fft, grid, label="rfftn 128^3")

    gk = fft(grid)
    ifft3 = jax.jit(lambda k: jnp.stack(
        [jnp.fft.irfftn(k * 1.1, s=(nmesh,) * 3) for _ in range(3)]))
    t_ifft = timed(ifft3, gk, label="3x irfftn 128^3")

    grids = ifft3(gk)
    gat = jax.jit(lambda g, p: cic_gather_vec(g, p, box))
    t_gat = timed(lambda p: gat(grids, p), pos, label="cic_gather_vec")

    build = jax.jit(lambda p: build_padded_plane(p, mass, box, r_cut,
                                                 ncell, capacity))
    t_build = timed(build, pos, label="build_padded_plane")

    plane, ov, _K, gidx = build(pos)
    K = -(-capacity // 128) * 128  # static (jitted build traces its K)
    kern = jax.jit(lambda pl_: run_cell_plane(
        pl_, nx=ncell, ncell=ncell, K=K, eps2=eps * eps, r_s=r_s,
        r_cut=r_cut, split="spline"))
    t_kern = timed(kern, plane, label=f"cell kernel (K={K})")

    # gather-back cost
    out = kern(plane)
    M = ncell + 2

    def gath(o):
        accb = jnp.concatenate(
            [o[:3].reshape(3, M**3 * K).T, jnp.zeros((1, 3), jnp.float32)],
            axis=0,
        )
        return accb[gidx]

    t_scat = timed(jax.jit(gath), out, label="gather-back")

    # VPU floor estimate for the kernel: pairs = ncell^3 * K * 3K * 9
    pairs = ncell**3 * K * 3 * K * 9
    # ~1.55e11 pairs/s is the dense-kernel speed of light on this chip
    print(f"\nkernel evaluated pairs: {pairs:.3e} "
          f"-> {pairs / t_kern:.3e} pair-evals/s "
          f"(dense floor 1.55e11: {pairs / t_kern / 1.55e11 * 100:.0f}%)",
          flush=True)
    acct = t_dep + t_fft + t_ifft + t_gat + t_build + t_kern + t_scat
    print(f"accounted {acct*1e3:.0f} ms of {t_total*1e3:.0f} ms "
          f"(rest: k-solve, add)", flush=True)


if __name__ == "__main__":
    if "--rungs" in sys.argv:
        ab = [a.split("=", 1)[1] for a in sys.argv
              if a.startswith("--ablate=")]
        rungs_mode(
            fused="--unfused" not in sys.argv,
            frozen="--no-frozen" not in sys.argv,
            clustered="--clustered" in sys.argv,
            frac_hot=0.0 if "--cold" in sys.argv else 0.05,
            ablate=ab[0] if ab else "",
        )
    elif "--steps" in sys.argv:
        steps_mode(fused="--unfused" not in sys.argv)
    else:
        main()
