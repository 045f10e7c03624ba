"""Headline benchmark: end-to-end stereo-forward latency at 512x512, iters=32.

Baseline (reference paper Table 7, sterereere.md:1366-1370, 1xA100):
  512x512 stereo branch alone: 0.21 s; mono (DAv2 ViT-L): 0.03 s; total 0.24 s.

Prints ONE JSON line:
  {"metric": "stereo_512_latency", "value": <s>, "unit": "s",
   "vs_baseline": <baseline/ours, >1 means faster than A100>}
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    h = w = 512
    iters = 32
    cfg = StereoAnywhereConfig(compute_dtype="bfloat16")
    model = StereoAnywhere(cfg)

    rng = np.random.default_rng(0)
    args = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    variables = model.init(jax.random.PRNGKey(0), *_tiny(), iters=1, test_mode=True)

    @jax.jit
    def fwd(v, im2, im3, m2, m3):
        return model.apply(v, im2, im3, m2, m3, iters=iters, test_mode=True)["disparity"]

    # compile + warmup
    fwd(variables, *args).block_until_ready()

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(variables, *args)
    out.block_until_ready()
    latency = (time.perf_counter() - t0) / n

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
