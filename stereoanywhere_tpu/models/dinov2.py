"""DINOv2 vision transformer (the Depth-Anything-V2 backbone), Flax/NHWC.

Reimplements the capabilities of reference models/depth_anything_v2/dinov2.py
(DinoVisionTransformer, :44-336) TPU-first:

- attention via the Pallas TPU flash-attention kernel (3.5x XLA's
  materialized-softmax path at ViT-L/518^2; replaces the reference's optional
  xformers memory_efficient_attention, reference dinov2_layers/attention.py:65-82),
- static-shape pos-embed bicubic interpolation traced per input size,
- blocks iterated in Python (24 layers; XLA pipelines them) — the weights
  differ per layer so scan-over-layers would need stacked params; the
  converter keeps per-layer names instead.

Shipped config (reference dinov2.py:405-422): patch 14, img_size 518,
init_values=1.0 (LayerScale ON), no registers, interpolate_offset=0.1.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
}


def _cubic_kernel(t: jax.Array, a: float = -0.75) -> jax.Array:
    """Cubic convolution kernel (torch bicubic uses a=-0.75)."""
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2) * at3 - (a + 3) * at2 + 1
    w2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _bicubic_resize_axis(x: jax.Array, axis: int, out_size: int, scale: float) -> jax.Array:
    """Bicubic resample along one axis with an EXPLICIT scale factor.

    src = (dst + 0.5) / scale - 0.5 — torch `F.interpolate(scale_factor=...,
    align_corners=False, recompute_scale_factor=False)` semantics, needed to
    reproduce the DINOv2 pos-embed `interpolate_offset=0.1` quirk
    (reference dinov2.py:194-205).  Border replicated (torch clamps taps).
    """
    in_size = x.shape[axis]
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) / scale - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    t = src - i0.astype(jnp.float32)

    out = None
    for k in range(-1, 3):
        idx = jnp.clip(i0 + k, 0, in_size - 1)
        wk = _cubic_kernel(t - k)
        shape = [1] * x.ndim
        shape[axis] = out_size
        tap = jnp.take(x, idx, axis=axis) * wk.reshape(shape).astype(x.dtype)
        out = tap if out is None else out + tap
    return out


def interpolate_pos_embed(
    pos_embed: jax.Array, patch_h: int, patch_w: int, interpolate_offset: float = 0.1
) -> jax.Array:
    """(1, 1+N, D) -> (1, 1+patch_h*patch_w, D) with the reference's bicubic
    scale-factor interpolation (reference dinov2.py:179-210)."""
    n = pos_embed.shape[1] - 1
    side = int(math.sqrt(n))
    if patch_h * patch_w == n and patch_h == patch_w:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    grid = pos_embed[:, 1:].reshape(1, side, side, -1).astype(jnp.float32)
    sh = (patch_h + interpolate_offset) / side
    sw = (patch_w + interpolate_offset) / side
    grid = _bicubic_resize_axis(grid, 1, patch_h, sh)
    grid = _bicubic_resize_axis(grid, 2, patch_w, sw)
    grid = grid.reshape(1, patch_h * patch_w, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, grid], axis=1)


class Attention(nn.Module):
    """Standard MHSA (reference dinov2_layers/attention.py).

    TPU: the custom Pallas kernel (ops/pallas/vit_attention.py) consumes the
    fused QKV matmul's natural (B, T, 3D) output and emits (B, T, D) directly
    — no pad-to-block-multiple, no (B,H,T,hd) transposes.  Measured (v5e,
    ViT-L 518², T=1370): 0.17 ms/layer vs 0.35 for the stock flash kernel
    plus ~0.27 of relayouts it needed.  CPU keeps the XLA path (golden tests
    compare against torch there).
    """

    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, name="qkv")(x)
        if jax.default_backend() == "tpu" and hd in (64, 128):
            from stereoanywhere_tpu.ops.pallas.vit_attention import vit_attention

            o = vit_attention(qkv, self.num_heads)
        else:
            q, k, v = jnp.split(qkv.reshape(b, t, 3, self.num_heads, hd), 3, axis=2)
            q, k, v = (y[:, :, 0] for y in (q, k, v))  # (B,T,H,hd)
            o = jax.nn.dot_product_attention(q, k, v).reshape(b, t, d)
        return nn.Dense(d, name="proj")(o)


class _DenseParams(nn.Module):
    """Dense parameters with nn.Dense's exact names/init (kernel
    lecun_normal, bias zeros), applied by the caller."""

    features: int

    @nn.compact
    def __call__(self, d_in: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (d_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _MlpParams(nn.Module):
    """fc1/fc2 parameter tree identical to the applied Mlp module's."""

    hidden: int

    @nn.compact
    def __call__(self, d: int):
        w1, b1 = _DenseParams(self.hidden, name="fc1")(d)
        w2, b2 = _DenseParams(d, name="fc2")(self.hidden)
        return w1, b1, w2, b2


class _LayerNormParams(nn.Module):
    """LayerNorm parameters with nn.LayerNorm's names (scale ones, bias
    zeros), applied by the caller."""

    @nn.compact
    def __call__(self, d: int):
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return scale, bias


class SwiGLUFFN(nn.Module):
    """Fused SwiGLU FFN used by ViT-giant2 (reference dinov2_layers
    SwiGLUFFNFused): hidden = align8(dim*4 * 2/3), out = w3(silu(x1) * x2)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        hidden = (int(d * 4) * 2 // 3 + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(d, name="w3")(jax.nn.silu(x1) * x2)


class LayerScale(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        return x * gamma


class _GammaParams(nn.Module):
    """LayerScale's parameter (ones init, same name/path), applied by the
    caller (inside a fused kernel)."""

    @nn.compact
    def __call__(self, d: int):
        return self.param("gamma", nn.initializers.ones, (d,))


class _AttnParams(nn.Module):
    """qkv/proj Dense parameters with Attention's exact tree (attn/qkv/...,
    attn/proj/...), applied by the caller via the fused Pallas kernels."""

    @nn.compact
    def __call__(self, d: int):
        wq, bq = _DenseParams(3 * d, name="qkv")(d)
        wp, bp = _DenseParams(d, name="proj")(d)
        return wq, bq, wp, bp


class Block(nn.Module):
    """Pre-norm transformer block with LayerScale (reference dinov2_layers/block.py)."""

    num_heads: int
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"  # "mlp" | "swiglufused" (vitg)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        hd = d // self.num_heads
        if jax.default_backend() == "tpu" and d % 128 == 0 and hd in (64, 128):
            # Fused Dense-side kernels (ops/pallas/vit_dense.py): LN1+QKV in
            # one program, proj+LayerScale+residual in another — the whole
            # attention sub-block runs as three Pallas kernels with zero
            # XLA passes between them.  Parameter tree identical to the
            # module path below (norm1/attn/ls1).
            from stereoanywhere_tpu.ops.pallas.vit_attention import vit_attention
            from stereoanywhere_tpu.ops.pallas.vit_dense import (
                dense_scale_residual,
                ln_dense,
            )

            g1, bn1 = _LayerNormParams(name="norm1")(d)
            wq, bq, wp, bp = _AttnParams(name="attn")(d)
            gls1 = _GammaParams(name="ls1")(d)
            qkv = ln_dense(x, g1, bn1, wq, bq)
            o = vit_attention(qkv, self.num_heads)
            x = dense_scale_residual(x, o, wp, bp, gls1)
        else:
            h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            x = x + LayerScale(name="ls1")(Attention(self.num_heads, name="attn")(h))
        if self.ffn_layer == "swiglufused":
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            ffn = SwiGLUFFN(name="mlp")(h)
            return x + LayerScale(name="ls2")(ffn)

        # LN2 + fc1 + gelu + fc2 — parameters declared with the standard
        # module tree (norm2/mlp.fc1/mlp.fc2), applied either by the fused
        # Pallas kernel (TPU: 0.28 vs 0.41 ms/layer for the XLA chain; the
        # (B*T, 4*D) gelu intermediate never touches HBM and the LN/gelu
        # elementwise stops stalling the matmul fusions) or by the
        # equivalent inline math (CPU golden path).
        g, bln = _LayerNormParams(name="norm2")(d)
        w1, b1, w2, b2 = _MlpParams(int(d * self.mlp_ratio), name="mlp")(d)
        if jax.default_backend() == "tpu" and d % 128 == 0:
            import os

            from stereoanywhere_tpu.ops.pallas.vit_mlp import vit_mlp

            # SA_MLP_BLOCK_T: in-model block-size sweep knob (profiling)
            bt = int(os.environ.get("SA_MLP_BLOCK_T", "256"))
            ffn = vit_mlp(x, g, bln, w1, b1, w2, b2, block_t=bt)
        else:
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            xc = xf - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            h = (
                xc * jax.lax.rsqrt(var + 1e-6) * g.astype(jnp.float32)
                + bln.astype(jnp.float32)
            ).astype(x.dtype)
            a = jax.nn.gelu(h @ w1 + b1, approximate=False)
            ffn = a @ w2 + b2
        return x + LayerScale(name="ls2")(ffn)


class _PatchEmbedParams(nn.Module):
    """Patch-embed conv parameters with nn.Conv's exact layout and default
    init (kernel (p,p,Cin,D) lecun_normal, bias zeros), applied by the caller
    as a space-to-depth matmul."""

    features: int
    patch: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.patch, self.patch, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class DinoVisionTransformer(nn.Module):
    """Returns intermediate layers for the DPT head.

    Input NHWC (B,H,W,3), H,W multiples of 14.
    """

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    pos_embed_size: int = 37  # 518/14
    interpolate_offset: float = 0.1
    ffn_layer: str = "mlp"  # "swiglufused" for vitg (reference dinov2.py:417)

    @nn.compact
    def __call__(self, x: jax.Array, take_layers: Sequence[int]):
        b, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size

        # patch embed: conv k=p s=p (reference dinov2_layers/patch_embed.py).
        # Non-overlapping stride-14 conv == exact space-to-depth + matmul;
        # XLA's direct lowering of the 3-channel 14x14 conv ran at 0.7 TF/s
        # (250x off roofline, device trace).  Param layout/init identical to
        # nn.Conv (kernel (p,p,3,D) lecun_normal + bias) for the converter.
        p = self.patch_size
        pe = _PatchEmbedParams(self.embed_dim, p, name="patch_embed_proj")
        kernel, bias = pe(x.shape[-1])
        xp = (
            x.reshape(b, ph, p, pw, p, x.shape[-1])
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, ph * pw, p * p * x.shape[-1])
        )
        km = kernel.reshape(p * p * x.shape[-1], self.embed_dim)
        x = (
            jnp.einsum(
                "btf,fd->btd", xp, km.astype(xp.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            + bias.astype(x.dtype)
        )

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, self.embed_dim)
        )
        n_pos = self.pos_embed_size ** 2 + 1
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_pos, self.embed_dim)
        )

        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + interpolate_pos_embed(pos_embed, ph, pw, self.interpolate_offset).astype(x.dtype)

        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        outputs = []
        for i in range(self.depth):
            x = Block(self.num_heads, ffn_layer=self.ffn_layer, name=f"blocks_{i}")(x)
            if i in take_layers:
                outputs.append(x)

        # norm applied to every taken layer (reference dinov2.py:311-312)
        outputs = [final_norm(o) for o in outputs]
        # (patch tokens, cls token) pairs (reference dinov2.py:314-326)
        return [(o[:, 1:], o[:, 0]) for o in outputs]
