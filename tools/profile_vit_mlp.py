"""Standalone correctness + perf check for the fused ViT MLP kernel.

Compares ops/pallas/vit_mlp against the XLA path (LN -> Dense -> gelu ->
Dense) at the DAv2 ViT-L shape and times both.

Usage: python tools/profile_vit_mlp.py [--bt 256] [--quarters 4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1370)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--bt", type=int, default=256)
    ap.add_argument("--quarters", type=int, default=4)
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.ops.pallas.vit_mlp import vit_mlp
    from stereoanywhere_tpu.utils.profiling import chained_timer

    b, t, d, hidden = args.b, args.t, args.d, args.hidden
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal(d).astype(np.float32)).astype(jnp.bfloat16)
    be = jnp.asarray(rng.standard_normal(d).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((d, hidden)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray((rng.standard_normal((hidden, d)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(d).astype(np.float32)).astype(jnp.bfloat16)

    def xla_ref(x, g, be, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        h = (xc * jax.lax.rsqrt(var + 1e-6) * g.astype(jnp.float32) + be.astype(jnp.float32)).astype(x.dtype)
        a = jax.nn.gelu(h @ w1 + b1.astype(x.dtype), approximate=False)
        return a @ w2 + b2.astype(x.dtype)

    def pallas_fn(x, g, be, w1, b1, w2, b2):
        return vit_mlp(x, g, be, w1, b1, w2, b2, block_t=args.bt, n_splits=args.quarters)

    ref = np.asarray(jax.jit(xla_ref)(x, g, be, w1, b1, w2, b2), dtype=np.float32)
    got = np.asarray(jax.jit(pallas_fn)(x, g, be, w1, b1, w2, b2), dtype=np.float32)
    err = np.abs(ref - got).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    print(f"max abs err vs XLA: {err:.5f}  (rel {rel:.5f})")
    assert rel < 2e-2, "kernel mismatch"

    for name, fn in [("pallas", pallas_fn), ("xla", xla_ref)]:
        ms = chained_timer(fn, x, g, be, w1, b1, w2, b2, n_chain=24, repeats=3) * 1e3
        print(f"{name:>8}: {ms:.4f} ms/layer-mlp  ({ms*24:.2f} ms /24 layers)")


if __name__ == "__main__":
    main()
