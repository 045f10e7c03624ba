"""Correctness + perf for the fused ConvGRU kernels vs the XLA path.

Usage: python tools/profile_gru_fused.py [--h 256] [--w 256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--ch", type=int, default=128)
    ap.add_argument("--cx", type=int, default=256)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from stereoanywhere_tpu.ops.pallas.gru_fused import gru_fused
    from stereoanywhere_tpu.utils.profiling import chained_timer

    b, h, w, ch, cx = 1, args.h, args.w, args.ch, args.cx
    rng = np.random.default_rng(0)
    dt = jnp.float32 if args.interpret else jnp.bfloat16

    def arr(*shape, scale=1.0):
        return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32)).astype(dt)

    hid = arr(b, h, w, ch)
    x = arr(b, h, w, cx)
    cz, cr, cq = arr(b, h, w, ch), arr(b, h, w, ch), arr(b, h, w, ch)
    wzr = arr(3, 3, ch + cx, 2 * ch, scale=0.05)
    bzr = arr(2 * ch)
    wq = arr(3, 3, ch + cx, ch, scale=0.05)
    bq = arr(ch)

    def xla_ref(hid, x, cz, cr, cq, wzr, bzr, wq, bq):
        hx = jnp.concatenate([hid, x], axis=-1)

        def conv(inp, kern, bias):
            y = jax.lax.conv_general_dilated(
                inp, kern.astype(inp.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(y.dtype)

        zr = conv(hx, wzr, bzr)
        z = jax.nn.sigmoid(zr[..., :ch] + cz)
        r = jax.nn.sigmoid(zr[..., ch:] + cr)
        q = jnp.tanh(conv(jnp.concatenate([r * hid, x], axis=-1), wq, bq) + cq)
        return (1 - z) * hid + z * q

    def fused(hid, x, cz, cr, cq, wzr, bzr, wq, bq):
        return gru_fused(hid, x, cz, cr, cq, wzr, bzr, wq, bq, interpret=args.interpret)

    ref = np.asarray(jax.jit(xla_ref)(hid, x, cz, cr, cq, wzr, bzr, wq, bq), np.float32)
    got = np.asarray(jax.jit(fused)(hid, x, cz, cr, cq, wzr, bzr, wq, bq), np.float32)
    err = np.abs(ref - got).max()
    print(f"max abs err vs XLA: {err:.6f} (|h'|max {np.abs(ref).max():.3f})")
    assert err < (1e-5 if args.interpret else 5e-2), "mismatch"  # bf16: 1-2 ULP rounding-order noise
    if args.interpret:
        print("interpret-mode OK")
        return

    for name, fn in [("fused", fused), ("xla", xla_ref)]:
        ms = chained_timer(fn, hid, x, cz, cr, cq, wzr, bzr, wq, bq, n_chain=16, repeats=3) * 1e3
        print(f"{name:>6}: {ms:.4f} ms/gru-step")


if __name__ == "__main__":
    main()
