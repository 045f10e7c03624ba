"""Depth-Anything-V2: DINOv2 backbone + DPT refinement head, Flax/NHWC.

Reimplements reference models/depth_anything_v2/dpt.py (DPTHead :38-152,
DepthAnythingV2 :155-238).  The VFM is frozen at all times in the stereo
pipeline (reference train.py:262-266 runs it under no_grad).

DPT interpolations use align_corners=True bilinear (FeatureFusionBlock,
reference util/blocks.py:144) except the final feature upsample which is
align_corners=False (reference dpt.py:148) — matched via jax.image.resize.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.config import MonoConfig
from stereoanywhere_tpu.models.dinov2 import VIT_CONFIGS, DinoVisionTransformer
from stereoanywhere_tpu.models.layers import (
    Conv,
    ConvTransposeTorch,
    ParamConv,
    conv_small_cout_packed,
)
from stereoanywhere_tpu.ops.interp import (
    conv3x3_of_resize_halfpix,
    resize_bilinear_align_corners,
    resize_bilinear_halfpix,
)

INTERMEDIATE_LAYER_IDX = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
    "vitg": (9, 19, 29, 39),
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv + skip (reference util/blocks.py:29-80)."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = jax.nn.relu(x)
        out = Conv(self.features, 3, 1, 1, name="conv1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.features, 3, 1, 1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """DPT refinenet block (reference util/blocks.py:83-148)."""

    features: int

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear_align_corners(x, size)
        return Conv(self.features, 1, 1, 0, name="out_conv")(x)


def _output_convs(out, k20, b20, k22, b22, packed: bool, pack: int = 4):
    """The DPT head's final relu(1x1(relu(3x3(x)))) (reference dpt.py:60-66).

    packed=True runs both convs column-packed (layers.conv_small_cout_packed;
    the 1x1 consumes the packed layout via block-diagonal weights) — exact
    same sums, 128-lane wide; the plain path keeps CPU/golden simplicity.
    """
    b, _, wfull, _ = out.shape
    if not packed:
        y = jax.lax.conv_general_dilated(
            out, k20.astype(out.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b20.astype(out.dtype)
        y = jax.nn.relu(y)
        z = jnp.einsum("bhwc,co->bhwo", y, k22[0, 0].astype(y.dtype)) + b22.astype(
            y.dtype
        )
        return jax.nn.relu(z)
    co = k20.shape[-1]
    y = jax.nn.relu(conv_small_cout_packed(out, k20, b20, pack=pack))
    w22 = k22[0, 0, :, 0]  # (co,)
    wbd = jnp.zeros((pack * co, pack), y.dtype)
    for s in range(pack):
        wbd = wbd.at[s * co : (s + 1) * co, s].set(w22.astype(y.dtype))
    zp = y @ wbd + b22.astype(y.dtype)  # (B, H, wq, pack)
    z = zp.reshape(b, zp.shape[1], zp.shape[2] * pack)[:, :, :wfull, None]
    return jax.nn.relu(z)


class DPTHead(nn.Module):
    """Reference dpt.py:38-152."""

    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, layer_feats, patch_h: int, patch_w: int):
        # layer_feats: 4 x (tokens (B,N,D), cls) from shallowest to deepest
        outs = []
        for i, (tokens, _cls) in enumerate(layer_feats):
            b, n, d = tokens.shape
            # the 1x1 projects conv == a Dense over tokens; applied BEFORE
            # the (37, 37) spatial reshape it runs as one well-shaped
            # (B*N, D) matmul instead of a conv on a non-lane-aligned
            # 37-wide plane (measured 0.286 -> ~0.03 ms each on v5e).
            # Identical math and identical conv-shaped parameters.
            kp, bp = ParamConv(self.out_channels[i], 1, name=f"projects_{i}")(d)
            x = (
                jnp.einsum(
                    "bnd,do->bno", tokens, kp[0, 0].astype(tokens.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(tokens.dtype)
                + bp.astype(tokens.dtype)
            ).reshape(b, patch_h, patch_w, self.out_channels[i])
            if i == 0:
                x = ConvTransposeTorch(self.out_channels[0], 4, 4, name="resize_layers_0")(x)
            elif i == 1:
                x = ConvTransposeTorch(self.out_channels[1], 2, 2, name="resize_layers_1")(x)
            elif i == 3:
                x = Conv(self.out_channels[3], 3, 2, 1, name="resize_layers_3")(x)
            outs.append(x)

        l1, l2, l3, l4 = outs
        f = self.features
        l1 = Conv(f, 3, 1, 1, use_bias=False, name="scratch_layer1_rn")(l1)
        l2 = Conv(f, 3, 1, 1, use_bias=False, name="scratch_layer2_rn")(l2)
        l3 = Conv(f, 3, 1, 1, use_bias=False, name="scratch_layer3_rn")(l3)
        l4 = Conv(f, 3, 1, 1, use_bias=False, name="scratch_layer4_rn")(l4)

        p4 = FeatureFusionBlock(f, name="scratch_refinenet4")(l4, size=l3.shape[1:3])
        p3 = FeatureFusionBlock(f, name="scratch_refinenet3")(p4, l3, size=l2.shape[1:3])
        p2 = FeatureFusionBlock(f, name="scratch_refinenet2")(p3, l2, size=l1.shape[1:3])
        p1 = FeatureFusionBlock(f, name="scratch_refinenet1")(p2, l1)

        out = Conv(f // 2, 3, 1, 1, name="scratch_output_conv1")(p1)
        k20, b20 = ParamConv(32, 3, name="scratch_output_conv2_0")(out.shape[-1])
        k22, b22 = ParamConv(1, 1, name="scratch_output_conv2_2")(32)
        if jax.default_backend() != "cpu":
            # Fused conv3x3-of-resize (ops/interp.conv3x3_of_resize_halfpix):
            # the align_corners=False upsample (reference dpt.py:148) and the
            # first output conv (reference dpt.py:60-66, 3x3 128->32) are
            # both linear, and commuting the channel reduction BEFORE the
            # H-upsample matmul is 40 GFLOP instead of 106 — it also removes
            # the column-packed conv and the 0.45 ms input relayout XLA
            # emitted for it (device trace r4).  Exact same sums.
            y = jax.nn.relu(
                conv3x3_of_resize_halfpix(
                    out, (patch_h * 14, patch_w * 14), k20, b20
                )
            )
            z = jnp.einsum("bhwc,co->bhwo", y, k22[0, 0].astype(y.dtype)) + b22.astype(
                y.dtype
            )
            return jax.nn.relu(z)
        # CPU/golden path: sequential resize (constant interp-matrix matmuls
        # — same values as jax.image.resize 'bilinear') then plain convs.
        out = resize_bilinear_halfpix(out, (patch_h * 14, patch_w * 14))
        return _output_convs(out, k20, b20, k22, b22, packed=False)


class DepthAnythingV2(nn.Module):
    """Full mono branch: NHWC image (ImageNet-normalized, multiple-of-14)
    -> relative inverse depth (B,H,W,1)."""

    cfg: MonoConfig = MonoConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        vit_cfg = VIT_CONFIGS[self.cfg.encoder]
        patch_h, patch_w = x.shape[1] // 14, x.shape[2] // 14
        feats = DinoVisionTransformer(
            embed_dim=vit_cfg["embed_dim"],
            depth=vit_cfg["depth"],
            num_heads=vit_cfg["num_heads"],
            ffn_layer="swiglufused" if self.cfg.encoder == "vitg" else "mlp",
            name="pretrained",
        )(x, INTERMEDIATE_LAYER_IDX[self.cfg.encoder])
        return DPTHead(
            self.cfg.features, tuple(self.cfg.out_channels), name="depth_head"
        )(feats, patch_h, patch_w)


def imagenet_normalize(image01: jax.Array) -> jax.Array:
    """[0,1] NHWC -> ImageNet-normalized (reference dpt.py:233-236)."""
    mean = jnp.asarray(IMAGENET_MEAN, image01.dtype)
    std = jnp.asarray(IMAGENET_STD, image01.dtype)
    return (image01 - mean) / std


def dav2_input_size(h: int, w: int, input_size_width: int = 518, input_size_height: int = 518) -> tuple[int, int]:
    """Static-shape resize target: keep-aspect 'lower_bound' multiple-of-14
    (reference dpt.py:197-229 + util/transform.py:51-107).

    If h > w the target W/H are swapped first (reference dpt.py:201-204).
    Returns (final_h, final_w).
    """
    import numpy as np

    if h > w:
        input_size_width, input_size_height = input_size_height, input_size_width

    scale_h = input_size_height / h
    scale_w = input_size_width / w
    # lower_bound keep-aspect: use the larger scale for both
    if scale_w > scale_h:
        scale_h = scale_w
    else:
        scale_w = scale_h

    def constrain(x, min_val):
        y = int(np.round(x / 14) * 14)
        if y < min_val:
            y = int(np.ceil(x / 14) * 14)
        return y

    return constrain(scale_h * h, input_size_height), constrain(scale_w * w, input_size_width)


def infer_mono_depth(model: DepthAnythingV2, variables, image01: jax.Array, input_size_width: int = 518, input_size_height: int = 518) -> jax.Array:
    """End-to-end `infer_image` parity (reference dpt.py:188-238): bicubic
    (a=-0.75, half-pixel, non-antialiased — exact torch F.interpolate
    semantics via constant interp-matrix matmuls) resize to the lower-bound
    multiple-of-14 size, ImageNet-normalize, run, bilinear-resize back to
    the input resolution (same matrix form)."""
    b, h, w, _ = image01.shape
    fh, fw = dav2_input_size(h, w, input_size_width, input_size_height)
    from stereoanywhere_tpu.ops.interp import (
        resize_bicubic_halfpix,
        resize_bilinear_halfpix,
    )

    x = resize_bicubic_halfpix(image01, (fh, fw))
    x = imagenet_normalize(x)
    depth = model.apply(variables, x)
    return resize_bilinear_halfpix(depth, (h, w))
