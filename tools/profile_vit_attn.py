"""Standalone correctness + perf check for the ViT attention kernel.

Compares ops/pallas/vit_attention against the XLA reference at the real
DAv2 ViT-L shape (B=2, T=1370, H=16, hd=64) and times both plus the stock
flash-attention path it replaces (incl. its pad/transpose overheads).

Usage: python tools/profile_vit_attn.py [--t 1370] [--bq 512]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1370)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--bq", type=int, default=512)
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.ops.pallas.vit_attention import vit_attention
    from stereoanywhere_tpu.utils.profiling import chained_timer

    b, t, h, hd = args.b, args.t, args.heads, args.hd
    d = h * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def xla_ref(qkv):
        q, k, v = (
            qkv[..., i * d : (i + 1) * d].reshape(b, t, h, hd) for i in range(3)
        )
        o = jax.nn.dot_product_attention(q, k, v)
        return o.reshape(b, t, d)

    def pallas_fn(qkv):
        return vit_attention(qkv, h, block_q=args.bq)

    def stock_flash(qkv):
        # the round-2 path: pad to 512-multiple + (B,H,T,hd) transposes
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        q, k, v = (
            qkv[..., i * d : (i + 1) * d].reshape(b, t, h, hd) for i in range(3)
        )
        tp = -(-t // 512) * 512
        pad = ((0, 0), (0, tp - t), (0, 0), (0, 0))
        qt, kt, vt = (jnp.pad(y, pad).transpose(0, 2, 1, 3) for y in (q, k, v))
        seg = jnp.broadcast_to(
            (jnp.arange(tp) >= t).astype(jnp.int32)[None], (b, tp)
        )
        bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1)
        o = flash_attention(
            qt, kt, vt,
            segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=1.0 / math.sqrt(hd),
            block_sizes=bs,
        )
        return o.transpose(0, 2, 1, 3)[:, :t].reshape(b, t, d)

    ref = np.asarray(jax.jit(xla_ref)(qkv), dtype=np.float32)
    got = np.asarray(jax.jit(pallas_fn)(qkv), dtype=np.float32)
    err = np.abs(ref - got).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    print(f"max abs err vs XLA: {err:.5f}  (rel {rel:.5f})")
    assert rel < 2e-2, "kernel mismatch"

    for name, fn in [("pallas", pallas_fn), ("xla", xla_ref), ("flash+pad", stock_flash)]:
        try:
            ms = chained_timer(fn, qkv, n_chain=24, repeats=3) * 1e3
            print(f"{name:>10}: {ms:.4f} ms/layer-attention  ({ms*24:.2f} ms /24 layers)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:>10}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
