"""Profiling: step timing, interaction throughput, XLA traces.

The reference's tracing is ad-hoc `time.time()` deltas and a hard-coded
runtime table (SURVEY.md §5.1; `Cosmo NN5.py:477-479`,
`pppmp3mplotter.py:18-58`) and it has **no throughput counter at all** —
the north-star metric (pairwise interactions/sec/chip) is new here.

Utilities:
  - StepTimer: wall-clock per-step timing with device sync, reporting
    steps/s and (for pairwise solvers) interactions/s.
  - benchmark_fn: robust timing of a jitted function with per-iteration
    input perturbation (relay/jit caches must not short-circuit reps).
  - trace: context manager around jax.profiler for TensorBoard-style
    XLA traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


def pairwise_interactions(n: int, steps: int = 1, kicks_per_step: int = 2) -> int:
    """Pairwise force evaluations executed by `steps` KDK steps of an
    all-pairs solver (KDK evaluates the force twice per step, but the
    closing kick's force is reused as the next opening kick -> ~1 eval
    per step in a scan, plus one priming eval)."""
    return n * n * (steps * (kicks_per_step - 1) + 1)


@dataclasses.dataclass
class StepReport:
    steps: int
    wall_s: float
    steps_per_s: float
    interactions_per_s: float | None = None

    def __str__(self) -> str:
        s = f"{self.steps} steps in {self.wall_s:.3f} s ({self.steps_per_s:.2f} steps/s"
        if self.interactions_per_s is not None:
            s += f", {self.interactions_per_s:.3e} interactions/s"
        return s + ")"


class StepTimer:
    """Accumulates per-chunk step timings with device synchronisation.

    Usage::

        timer = StepTimer(n_particles=len(state.pos))
        with timer.measure(steps=100):
            state = run(state, dt, 100, acc_fn)
            jax.block_until_ready(state.pos)
        print(timer.report())
    """

    def __init__(self, n_particles: int | None = None):
        self.n = n_particles
        self.steps = 0
        self.wall_s = 0.0

    @contextlib.contextmanager
    def measure(self, steps: int):
        t0 = time.perf_counter()
        yield
        self.wall_s += time.perf_counter() - t0
        self.steps += steps

    def report(self) -> StepReport:
        sps = self.steps / self.wall_s if self.wall_s > 0 else float("nan")
        ips = None
        if self.n is not None and self.wall_s > 0:
            ips = pairwise_interactions(self.n, self.steps) / self.wall_s
        return StepReport(
            steps=self.steps, wall_s=self.wall_s, steps_per_s=sps,
            interactions_per_s=ips,
        )


def sync(out):
    """Force completion of a computation by reading a few elements back to
    the host.  ``jax.block_until_ready`` is NOT sufficient under relayed /
    proxied TPU backends (it returns after dispatch, not execution); a
    host readback of any output slice is a true execution barrier."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:2])
    return out


def benchmark_fn(fn, *args, reps: int = 3, perturb_arg: int = 0, warmup: bool = True):
    """Median wall time of ``fn(*args)`` with the ``perturb_arg``-th array
    argument nudged per rep (defeats dispatch caches — identical dispatches
    are served from cache by the TPU relay) and a true execution barrier
    (host readback via :func:`sync`, not just block_until_ready)."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng()
    if warmup:
        sync(fn(*args))
    times = []
    for _ in range(reps):
        a = list(args)
        a[perturb_arg] = a[perturb_arg] + jnp.asarray(
            rng.uniform(1e-6, 1e-4), a[perturb_arg].dtype
        )
        t0 = time.perf_counter()
        sync(fn(*a))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
