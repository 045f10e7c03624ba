"""Full-model latency vs iteration count on the real chip: fits
t(iters) = a + b*iters to attribute loop vs non-loop cost.

Usage: python tools/profile_model.py [--size 512] [--iters 4 36]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, nargs="+", default=[4, 36])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lookup", default="auto")
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()}")
    h = w = args.size
    cfg = StereoAnywhereConfig(compute_dtype=args.dtype, lookup_impl=args.lookup, scan_unroll=args.unroll)
    model = StereoAnywhere(cfg)
    rng = np.random.default_rng(0)
    xs = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    tiny = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 96, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    init_fn = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))
    variables = init_fn(jax.random.PRNGKey(0), *tiny)
    if args.dtype == "bfloat16":
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
        )

    times = {}
    for it in args.iters:
        def fwd(im2, im3, m2, m3, _it=it):
            return model.apply(variables, im2, im3, m2, m3, iters=_it, test_mode=True)[
                "disparity"
            ]

        t = chained_timer(fwd, *xs, n_chain=12, repeats=3)
        times[it] = t
        print(f"iters={it:3d}: {t*1e3:7.2f} ms")

    its = sorted(times)
    if len(its) >= 2:
        b = (times[its[-1]] - times[its[0]]) / (its[-1] - its[0])
        a = times[its[0]] - b * its[0]
        print(f"fit: base {a*1e3:.2f} ms + {b*1e3:.3f} ms/iter -> 32 iters = {(a+32*b)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
