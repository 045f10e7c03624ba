"""Pallas TPU fused Dense-side kernels for the DAv2 ViT transformer layer.

Round-4 step toward the fully-fused transformer layer (ARCHITECTURE.md mono
budget): the attention and MLP kernels already own their layouts; what
remained in XLA between them was LN1, the QKV/proj matmuls, LayerScale and
the residual adds — each a separate HBM round-trip over (B*T, D) at ViT-L
518² (B=2, T=1370, D=1024):

  ln_dense:             qkv = LN(x; g, b) @ Wqkv + bqkv     (one kernel)
  dense_scale_residual: x'  = x + gamma ⊙ (o @ Wp + bp)     (one kernel)

Fusing LN into the QKV matmul removes the standalone LN pass (read+write
5.6 MB) and keeps the LN-stat reduce off the matmul's critical path (the
measured XLA drag: Dense stack at ~140 TF/s vs 197 peak with elementwise
fused into operands).  Fusing proj+LayerScale+residual removes the separate
add/scale pass.  Weight residency: Wqkv 6.3 MB, Wp 2 MB bf16 — both fit
VMEM beside the token blocks, loaded once (constant index map).

Forward-only like the attention/MLP kernels (the VFM is frozen; reference
train.py:262-266 runs it under no_grad).  CPU keeps the XLA module path
(golden tests compare against torch there).  Exactness: interpret-mode
test vs the XLA chain in tests/test_pallas_kernel.py.

Reference counterparts: dinov2_layers/attention.py:72-76 (qkv/proj),
dinov2_layers/block.py (pre-norm + LayerScale residual).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_dense_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (BT_blk, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = (h * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)).astype(
        w_ref.dtype
    )
    y = jax.lax.dot_general(
        h, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def ln_dense(
    x: jax.Array,
    ln_gamma: jax.Array,
    ln_beta: jax.Array,
    w: jax.Array,
    b: jax.Array,
    block_t: int = 256,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """LN(x) @ w + b on (B, T, D) tokens -> (B, T, F)."""
    btot, t, d = x.shape
    f = w.shape[1]
    xf = x.reshape(1, btot * t, d)
    nt = pl.cdiv(btot * t, block_t)
    out = pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((1, btot * t, f), x.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, block_t, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_t, f), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * btot * t * d * f,
            bytes_accessed=xf.size * 2 + w.size * 2 + btot * t * f * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, ln_gamma.reshape(1, d), ln_beta.reshape(1, d), w, b.reshape(1, f))
    return out.reshape(btot, t, f)


def _dense_sr_kernel(o_ref, x_ref, w_ref, bias_ref, g_ref, out_ref):
    o = o_ref[0]  # (BT_blk, D) attention output, bf16
    y = jax.lax.dot_general(
        o, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[0].astype(jnp.float32)
    out_ref[0] = (
        x_ref[0].astype(jnp.float32) + g_ref[0].astype(jnp.float32) * y
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def dense_scale_residual(
    x: jax.Array,
    o: jax.Array,
    w: jax.Array,
    b: jax.Array,
    gamma: jax.Array,
    block_t: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """x + gamma * (o @ w + b) on (B, T, D) tokens."""
    btot, t, d = x.shape
    xf = x.reshape(1, btot * t, d)
    of = o.reshape(1, btot * t, d)
    nt = pl.cdiv(btot * t, block_t)
    out = pl.pallas_call(
        _dense_sr_kernel,
        out_shape=jax.ShapeDtypeStruct((1, btot * t, d), x.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, block_t, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_t, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * btot * t * d * d,
            bytes_accessed=xf.size * 2 * 3 + w.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(of, xf, w, b.reshape(1, d), gamma.reshape(1, d))
    return out.reshape(btot, t, d)
