"""Sub-stage latency breakdown of the 3-D hourglass at the shipped config
(volume (B, W/4, H/4, W/4, 8), mono-depth feature pyramids).

Usage: python tools/profile_hourglass.py [--size 512]
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

    from stereoanywhere_tpu.models.hourglass import DoubleFeatureAtt, Hourglass, _SplitConcatConv1
    from stereoanywhere_tpu.models.layers import BasicConv
    from stereoanywhere_tpu.ops.interp import resize_trilinear_align_corners
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()}")
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    s4 = args.size // 4
    b = 1
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=cdt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    def tmod(name, module, *xs, n_chain=8, **apply_kw):
        variables = jax.jit(lambda k: module.init(k, *xs, **apply_kw))(jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, variables
        )

        def fn(*a):
            out = module.apply(variables, *a, **apply_kw)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in jax.tree.leaves(out) if hasattr(l, "astype"))

        t = chained_timer(fn, *xs, n_chain=n_chain)
        print(f"{name:46s} {t*1e3:8.3f} ms")

    def tfn(name, fn, *xs, n_chain=8):
        def wrapped(*a):
            out = fn(*a)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in jax.tree.leaves(out) if hasattr(l, "astype"))

        t = chained_timer(wrapped, *xs, n_chain=n_chain)
        print(f"{name:46s} {t*1e3:8.3f} ms")

    vol = arr(b, s4, s4, s4, 8)
    fmde = [arr(b, s4 // (2 ** i), s4 // (2 ** i), 1) for i in range(4)]

    tmod("FULL hourglass (8->8)", Hourglass(8, 8), vol, fmde, fmde)

    # down path pieces
    tmod("down0: conv s2 8->16 @full vol", BasicConv(16, is_3d=True, stride=2), vol)
    half = arr(b, s4 // 2, s4 // 2, s4 // 2, 16)
    tmod("down0: conv s1 16->16 @1/2 vol", BasicConv(16, is_3d=True), half)
    tmod("att @1/2 (16ch)", DoubleFeatureAtt(16), half, fmde[1], fmde[1])
    quarter = arr(b, s4 // 4, s4 // 4, s4 // 4, 32)
    tmod("down1: conv s2 16->32 @1/2 vol", BasicConv(32, is_3d=True, stride=2), half)
    tmod("att @1/4 (32ch)", DoubleFeatureAtt(32), quarter, fmde[2], fmde[2])

    # agg path pieces (channels per shipped config)
    agg1 = arr(b, s4 // 2, s4 // 2, s4 // 2, 32)
    tmod("agg1: conv k1 32->16 @1/2 vol", BasicConv(16, is_3d=True, kernel_size=1, padding=0), agg1)
    tmod("agg1: conv k3 16->16 @1/2 vol x2", BasicConv(16, is_3d=True), half)

    # final level
    tfn("final: trilinear up 1/2->full (16ch)",
        lambda x: resize_trilinear_align_corners(x, (s4, s4, s4)), half)
    up = arr(b, s4, s4, s4, 16)
    tmod("final_agg_0: split 1x1x1 (8+16->8)", _SplitConcatConv1(8), vol, up)
    tmod("final_agg_1/2: conv k3 8->8 @full", BasicConv(8, is_3d=True), vol)
    tmod("final att @full (8ch)", DoubleFeatureAtt(8), vol, fmde[0], fmde[0])


if __name__ == "__main__":
    main()
