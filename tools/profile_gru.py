"""Per-stage latency breakdown of one GRU refinement iteration on the real
TPU chip (512x512 input -> 128x128 at 1/4 resolution), bf16.

Motivation (ARCHITECTURE.md "Measured performance budget"): the 32-iteration
loop costs ~2 ms/iter while conv FLOPs at MXU rate account for ~0.3 ms and
the corr lookups ~0.1 ms.  This script attributes the remaining time by
timing each stage of models/update.py:RefinementStep in isolation with the
chained-execution timer (utils/profiling.py).

Usage: python tools/profile_gru.py [--size 512]
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
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from flax import linen as nn

    from stereoanywhere_tpu.models.update import (
        ConvGRU,
        MotionEncoder,
        RefinementStep,
        UpdateHead,
    )
    from stereoanywhere_tpu.models.layers import Conv
    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h4 = w4 = args.size // 4
    b = 1
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=cdt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    # --- stage inputs at shipped-config shapes
    net = (arr(b, h4, w4, 128), arr(b, h4 // 2, w4 // 2, 128), arr(b, h4 // 4, w4 // 4, 128))
    inp = tuple(
        tuple(arr(*n.shape) for _ in range(3)) for n in net
    )  # (cz, cr, cq) per scale
    motion = arr(b, h4, w4, 128)
    flow2 = arr(b, h4, w4, 2)
    corr = arr(b, h4, w4, 36)
    coords = jnp.abs(arr(b, h4, w4, dtype=jnp.float32)) * 8
    levels = tuple(arr(b, h4, w4, w4 // (2**i)) for i in range(4))

    results = {}

    def timeit(name, module, *xs, method=None):
        variables = jax.jit(lambda k: module.init(k, *xs))(jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, variables
        )

        def fn(*a):
            out = module.apply(variables, *a)
            leaves = jax.tree.leaves(out)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)

        t = chained_timer(fn, *xs, n_chain=128)
        results[name] = t
        print(f"{name:40s} {t*1e3:8.3f} ms")
        return t

    # full step body (lookup + grus + heads), as scanned in the model
    step = RefinementStep(compute_dtype=args.dtype, emit_outputs=False, compute_mask=False)
    coords0 = jnp.zeros((b, h4, w4, 1), jnp.float32)
    coords1 = coords[..., None]
    carry = (net, coords1)
    consts = (levels, levels, inp, coords0)
    variables = jax.jit(lambda k: step.init(k, carry, consts))(jax.random.PRNGKey(0))
    variables = jax.tree.map(lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, variables)

    def full_fn(carry, consts):
        (nets, c1), _ = step.apply(variables, carry, consts)
        return sum(jnp.mean(n.astype(jnp.float32)) for n in nets) + jnp.mean(c1)

    t_full = chained_timer(full_fn, carry, consts, n_chain=64)
    results["full RefinementStep"] = t_full
    print(f"{'full RefinementStep':40s} {t_full*1e3:8.3f} ms")

    # individual stages
    timeit("gru08 (hx 384ch @1/4)", ConvGRU(128), net[0], *inp[0], motion, net[0])
    timeit("gru16 (@1/8)", ConvGRU(128), net[1], *inp[1], net[1], net[1])
    timeit("gru32 (@1/16)", ConvGRU(128), net[2], *inp[2], net[2])
    timeit("motion encoder", MotionEncoder(), flow2, corr, corr)
    timeit("flow_head (128->256->2)", UpdateHead(256, 2), net[0])

    class MaskHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            m = jax.nn.relu(Conv(256, 3, 1, 1, name="mask_0")(x))
            return 0.25 * Conv(16 * 9, 1, 1, 0, name="mask_2")(m)

    timeit("mask head (128->256->144)", MaskHead(), net[0])

    # lookups
    def lk(coords, levels):
        pyr = CorrPyramid(levels, 4)
        return jnp.mean(lookup_corr_pyramid(pyr, coords).astype(jnp.float32))

    t = chained_timer(lk, coords, levels, n_chain=128)
    results["corr lookup (1 volume)"] = t
    print(f"{'corr lookup (1 volume)':40s} {t*1e3:8.3f} ms")

    # calibration: one big conv at the same spatial size
    class OneConv(nn.Module):
        cin: int = 384
        cout: int = 256

        @nn.compact
        def __call__(self, x):
            return Conv(self.cout, 3, 1, 1)(x)

    timeit("bare conv 384->256 @1/4", OneConv(), arr(b, h4, w4, 384))
    timeit("bare conv 384->256 @1/8", OneConv(), arr(b, h4 // 2, w4 // 2, 384))

    known = sum(v for k, v in results.items() if k not in ("full RefinementStep",) and "bare" not in k)
    print(f"\nsum of stages: {known*1e3:.3f} ms vs full step {t_full*1e3:.3f} ms")
    print("(gap = scan carry traffic + interp/pool cross-talk + fusion differences)")


if __name__ == "__main__":
    main()
