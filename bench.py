"""Headline benchmark: stereo-forward latency at 512x512, iters=32, bf16.

Baseline (reference paper Table 7, sterereere.md:1366-1370, 1xA100):
  512x512 stereo branch: 0.21 s (mono DAv2 +0.03 s; total 0.24 s).

Methodology note: on this TPU runtime `block_until_ready` can acknowledge
before device completion and D2H is slow, so we chain N forwards serially
on-device inside ONE jitted fori_loop (each iteration's input is perturbed by
the previous output, forcing true sequential execution) and sync on a single
scalar fetch.  Per-forward latency = (total - RTT) / N.

Prints ONE JSON line:
  {"metric": "stereo_512_latency", "value": <s>, "unit": "s",
   "vs_baseline": <baseline/ours, >1 means faster than the A100 reference>}
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import stereoanywhere_tpu  # noqa: F401 — XLA dtype flags (no-op if jax preloaded; tpu_jit carries them per-compile)

    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.utils.jit import tpu_jit

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    h = w = 512
    iters = 32
    n_chain = 8
    cfg = StereoAnywhereConfig(compute_dtype="bfloat16")
    model = StereoAnywhere(cfg)

    rng = np.random.default_rng(0)
    args = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    # jit the init: eager init is thousands of tiny dispatches — pathological
    # through a remote TPU runtime.
    init_fn = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))
    variables = init_fn(jax.random.PRNGKey(0), *_tiny())
    # Mixed precision: bf16 params/stats drive the graph in bf16 on the MXU
    # (f32 accumulation); sensitive reductions are pinned to f32 in-model.
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )

    def one(v, im2, im3, m2, m3):
        return model.apply(v, im2, im3, m2, m3, iters=iters, test_mode=True)["disparity"]

    @tpu_jit
    def chained(v, im2, im3, m2, m3):
        def body(_, acc):
            # data dependency on previous output -> strictly serial execution.
            # EVERY input is perturbed: perturbing only im2 lets XLA hoist
            # the whole mono-volume branch (cnet/hourglass/classifiers/LSQ,
            # which depend only on m2/m3) out of the chain loop and amortize
            # it — under-reporting the single-forward latency by ~20%
            # (verified with a device trace).
            eps = acc * 1e-12
            d = one(v, im2 + eps, im3 + eps, m2 + eps, m3 + eps)
            return jnp.mean(d)

        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0))

    @tpu_jit
    def single(v, im2, im3, m2, m3):
        return jnp.mean(one(v, im2, im3, m2, m3))

    # compile + warmup + correctness sanity
    val = float(single(variables, *args))
    assert np.isfinite(val), "non-finite disparity"
    float(chained(variables, *args))

    # RTT of a trivial fetch
    triv = jax.jit(lambda x: x + 1)
    float(triv(jnp.float32(0)))  # compile
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, *args))
        times.append(time.perf_counter() - t0)
    total = float(np.median(times))
    latency = max(total - rtt, 1e-9) / n_chain

    baseline = 0.21  # A100 stereo-branch 512x512 (sterereere.md:1366-1370)
    print(
        json.dumps(
            {
                "metric": "stereo_512_latency",
                "value": round(latency, 4),
                "unit": "s",
                "vs_baseline": round(baseline / latency, 2),
            }
        )
    )


def _tiny():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    return tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 96, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )


if __name__ == "__main__":
    main()
