"""Pallas TPU fused transformer-MLP for the DAv2 ViT.

Computes  partials[q] = gelu(LN(x) @ W1[:, q] + b1[q]) @ W2[q, :]
in one kernel (grid = hidden-splits x token-blocks); the caller sums the
split partials and applies bias2/LayerScale/residual (XLA fuses that).

Hidden-split count trades HBM partial traffic (n_splits x (BT, D) f32
written + re-read by the sum) against per-step VMEM weight residency
(W1+W2 slabs, 16.8/n_splits MB bf16).  Measured at ViT-L 518² (v5e,
chained timer): quarters 0.302 ms/layer, HALVES 0.2545 (8.4 MB of weight
slabs still fit beside the token/intermediate blocks), vs 0.242 pure-MXU
floor — halves are the default.

Why fused (device traces, v5e, ViT-L 518², T=1370, bf16):
- XLA runs the transformer Dense stack at ~140 TF/s against a 197 bf16
  peak; the drag is the LN/gelu/bias elementwise fused into matmul
  operands (the LN-stat reduce chains run at ~83 TF/s in-fusion).  Here
  LN and gelu run on the VPU *inside* the kernel between two clean MXU
  dots.
- the (B*T, 4096) gelu intermediate never exists in HBM; only the
  n_splits f32 split partials do (two halves ≈ 22 MB/layer — the price of
  keeping every weight block resident exactly once; VMEM cannot hold the
  full 16.8 MB of W1+W2 double-buffered, but 8.4 MB half-slabs fit).

LN is recomputed per split (redundant, VPU-cheap) to avoid holding a
full LN'd copy in scratch.  gelu is the exact erf form, matching
reference dinov2_layers/mlp.py's nn.GELU.

Forward-only like the attention kernel (the VFM is frozen; reference
train.py:262-266).  CPU keeps the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (BT, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = (h * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)).astype(
        w1_ref.dtype
    )
    a = (
        jax.lax.dot_general(
            h, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + b1_ref[0].astype(jnp.float32)
    )  # (BT, HQ)
    # erf-form gelu matching jax.nn.gelu(approximate=False); Pallas TPU has
    # no erf lowering, so use Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7,
    # far below bf16 resolution)
    z = a * (2.0 ** -0.5)
    az = jnp.abs(z)
    tt = 1.0 / (1.0 + 0.3275911 * az)
    poly = tt * (
        0.254829592
        + tt * (-0.284496736 + tt * (1.421413741 + tt * (-1.453152027 + tt * 1.061405429)))
    )
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    a = a * 0.5 * (1.0 + erf)
    o_ref[0] = jax.lax.dot_general(
        a.astype(w2_ref.dtype),
        w2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block_t", "n_splits", "interpret"))
def vit_mlp(
    x: jax.Array,
    ln_gamma: jax.Array,
    ln_beta: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    block_t: int = 256,
    n_splits: int = 2,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """gelu(LN(x) @ w1 + b1) @ w2 + b2 on (B, T, D) tokens."""
    btot, t, d = x.shape
    hidden = w1.shape[1]
    hq = hidden // n_splits
    assert hidden % n_splits == 0
    xf = x.reshape(1, btot * t, d)
    nt = pl.cdiv(btot * t, block_t)

    grid = (n_splits, nt)
    partials = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_splits, btot * t, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, d), lambda q, i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda q, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda q, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hq), lambda q, i: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hq), lambda q, i: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((hq, d), lambda q, i: (q, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_t, d), lambda q, i: (q, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * btot * t * d * hidden,
            bytes_accessed=(w1.size + w2.size) * 2 + xf.size * 2 * n_splits,
            transcendentals=btot * t * hidden,
        ),
        interpret=interpret,
    )(
        xf,
        ln_gamma.reshape(1, d),
        ln_beta.reshape(1, d),
        w1,
        b1.reshape(1, hidden),
        w2,
    )
    out = jnp.sum(partials, axis=0) + b2.astype(jnp.float32)
    return out.reshape(btot, t, d).astype(x.dtype)
