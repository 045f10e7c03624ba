"""Profiling helpers for TPU runs.

The reference has no systematic tracing (SURVEY §5); here:
- `trace(path)` context manager around `jax.profiler` for perfetto traces,
- `chained_timer` for remote runtimes where `block_until_ready` may ack
  before device completion: chains N executions serially on-device via a
  data dependency and syncs on one scalar fetch.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_timer(
    fn: Callable,
    *args,
    n_chain: int = 8,
    repeats: int = 3,
    const_args=(),
    return_samples: bool = False,
):
    """Median per-call latency of `fn(*args) -> pytree`, measured by chaining
    n_chain serial executions inside one jitted fori_loop.

    With `return_samples=True` returns `(median, samples)` where `samples`
    are the rtt-corrected per-call latencies of each repeat — the spread
    feeds BENCH error bars (cross-session timer drift on this runtime is
    ~±10%; per-repeat std distinguishes real deltas from noise).

    EVERY floating-point array argument is perturbed by a carry-dependent
    epsilon each iteration.  Perturbing only one input (the original design)
    silently let XLA hoist every computation not depending on it OUT of the
    chain loop — for this model that amortized the whole mono-volume branch
    (cnet, hourglass, classifiers, LSQ) across the chain and under-reported
    the forward latency by ~20% (caught by a device trace: profiled base
    26.4 ms vs chained-fit 13.5 ms).

    `const_args` (e.g. model variables) are passed to fn AHEAD of `args` as
    real jit arguments, un-perturbed: closing over large pytrees embeds them
    as HLO constants, which bloats (or outright rejects — HTTP 413 on the
    remote runtime at 334M params) the compile payload.
    """
    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.utils.jit import tpu_jit

    def perturb(a, eps):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.inexact):
            return a + eps.astype(a.dtype)
        return a

    @tpu_jit
    def chained(c, *a):
        def body(_, acc):
            eps = acc * jnp.float32(1e-12)
            out = fn(*c, *jax.tree.map(lambda x: perturb(x, eps), a))
            return acc + sum(
                jnp.mean(l.astype(jnp.float32))
                for l in jax.tree.leaves(out)
                if hasattr(l, "astype")
            )

        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    triv = jax.jit(lambda x: x + 1)
    float(triv(jnp.float32(0)))
    float(chained(const_args, *args))  # compile + warm

    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(const_args, *args))
        times.append(time.perf_counter() - t0)
    samples = [max(t - rtt, 0.0) / n_chain for t in times]
    median = max(float(np.median(times)) - rtt, 0.0) / n_chain
    if return_samples:
        return median, samples
    return median
