"""Alternate lightweight feature extractors (MobileNet backbones + FPN-style
Conv2x decoder).

Reference: `Feature` (timm mobilenetv2_100 backbone, submodule.py:161-196),
`FeatureV4` (timm mobilenetv4_conv_small backbone, submodule.py:224-293),
`Conv2x` (submodule.py:55-94) and `FeatureAtt` (submodule.py:96-111).  These
are experimental extractors unused by the shipped model (the instantiation is
commented out at reference stereoanywhere.py:56,123), ported for capability
parity.  `FeatureV3` is NOT ported: its constructor is broken upstream
(`super(FeatureV4, ...)` inside `FeatureV3.__init__`, submodule.py:200) so it
cannot be instantiated at all — SURVEY.md §7.3 "reference bugs to NOT
replicate".

The reference loads ImageNet-pretrained timm weights; there is no weight
conversion path here (timm checkpoints are out of scope), so the backbones
are faithful re-implementations of the published architectures:

- MobileNetV2 (Sandler et al. 2018): inverted residual bottlenecks
  (1x1 expand + BN + ReLU6, 3x3 depthwise + BN + ReLU6, 1x1 project + BN,
  identity skip at stride 1 / equal channels), width 1.0 -> per-stage
  (t, c, n, s) = (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1)
  (6,160,3,2); the reference groups these stages exactly as its
  `blocks[0:1],[1:2],[2:3],[3:5],[5:6]` split (submodule.py:166-176).
- MobileNetV4-Conv-S (Qin et al. 2024): conv stem /2 -> two fused
  conv stages (/4 out 32, /8 out 64) -> universal-inverted-bottleneck
  stages (/16 out 96, /32 out 128); the reference keeps only the first
  block of the /32 stage (submodule.py:252 `model.blocks[3][0:1]`).

Layouts are NHWC throughout; BatchNorm uses stored running statistics by
default like every other norm in this codebase (see layers.py docstring).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.models.layers import BasicConv, BatchNorm, Conv


def _relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


class ConvBnAct(nn.Module):
    """conv -> BN -> act (timm 'cn' block / MNv2 stem)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    act: str = "relu6"

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel_size // 2
        x = Conv(self.features, self.kernel_size, self.stride, p, use_bias=False, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        if self.act == "relu6":
            return _relu6(x)
        if self.act == "relu":
            return jax.nn.relu(x)
        return x


def _depthwise(x, features: int, kernel_size: int, stride: int, name: str):
    p = kernel_size // 2
    return Conv(
        features, kernel_size, stride, p, use_bias=False, groups=features, name=name
    )(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual bottleneck."""

    features: int
    stride: int = 1
    expand: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        h = x
        if self.expand != 1:
            h = Conv(cin * self.expand, 1, 1, 0, use_bias=False, name="pw_exp")(h)
            h = BatchNorm(name="bn_exp")(h, use_running_average=not train)
            h = _relu6(h)
        h = _depthwise(h, h.shape[-1], 3, self.stride, "dw")
        h = BatchNorm(name="bn_dw")(h, use_running_average=not train)
        h = _relu6(h)
        h = Conv(self.features, 1, 1, 0, use_bias=False, name="pw_proj")(h)
        h = BatchNorm(name="bn_proj")(h, use_running_average=not train)
        if self.stride == 1 and cin == self.features:
            h = h + x
        return h


class UniversalInvertedResidual(nn.Module):
    """MobileNetV4 universal inverted bottleneck (UIB).

    dw_start (no act) -> 1x1 expand + BN + act -> dw_mid + BN + act ->
    1x1 project + BN.  kernel 0 disables the corresponding depthwise; when a
    mid depthwise exists it carries the stride, otherwise the start one does.
    """

    features: int
    dw_start: int = 0
    dw_mid: int = 3
    stride: int = 1
    expand: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        h = x
        start_stride = self.stride if self.dw_mid == 0 else 1
        if self.dw_start:
            h = _depthwise(h, cin, self.dw_start, start_stride, "dw_start")
            h = BatchNorm(name="bn_start")(h, use_running_average=not train)
        mid = int(round(cin * self.expand))
        h = Conv(mid, 1, 1, 0, use_bias=False, name="pw_exp")(h)
        h = BatchNorm(name="bn_exp")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        if self.dw_mid:
            h = _depthwise(h, mid, self.dw_mid, self.stride, "dw_mid")
            h = BatchNorm(name="bn_mid")(h, use_running_average=not train)
            h = jax.nn.relu(h)
        h = Conv(self.features, 1, 1, 0, use_bias=False, name="pw_proj")(h)
        h = BatchNorm(name="bn_proj")(h, use_running_average=not train)
        if self.stride == 1 and cin == self.features:
            h = h + x
        return h


class Conv2x(nn.Module):
    """Upsample (deconv k4 s2) or downsample (conv k3 s2), merge with a skip,
    then refine (reference submodule.py:55-94).

    concat=True doubles channels through conv2 (keep_concat), matching the
    reference's default used by the extractors.
    """

    features: int
    deconv: bool = False
    concat: bool = True

    @nn.compact
    def __call__(self, x, rem):
        if self.deconv:
            x = BasicConv(self.features, deconv=True, kernel_size=4, stride=2, padding=1, name="conv1")(x)
        else:
            x = BasicConv(self.features, kernel_size=3, stride=2, padding=1, name="conv1")(x)
        if x.shape[1:3] != rem.shape[1:3]:
            x = jax.image.resize(
                x, (x.shape[0],) + rem.shape[1:3] + (x.shape[-1],), method="nearest"
            )
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            x = BasicConv(self.features * 2, kernel_size=3, stride=1, padding=1, name="conv2")(x)
        else:
            x = x + rem
            x = BasicConv(self.features, kernel_size=3, stride=1, padding=1, name="conv2")(x)
        return x


class FeatureAtt(nn.Module):
    """Single-feature sigmoid gating of a cost volume (reference
    submodule.py:96-111).  cv (B, D, H, W, C); feat (B, H, W, Cf); the
    attention broadcasts over the D (disparity) axis."""

    cv_features: int

    @nn.compact
    def __call__(self, cv, feat):
        att = BasicConv(feat.shape[-1] // 2, kernel_size=1, stride=1, padding=0, name="feat_att_0")(feat)
        att = Conv(self.cv_features, 1, 1, 0, name="feat_att_1")(att)
        return jax.nn.sigmoid(att)[:, None] * cv


class MobileNetV2Backbone(nn.Module):
    """MobileNetV2-1.0 features trunk, grouped like the reference's
    `Feature.block0..4` split (submodule.py:166-176)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(32, 3, 2, name="conv_stem")(x, train)  # /2 (ref: conv_stem+bn1, no act)
        # stage (t,c,n,s) table; grouped per the reference split
        x2 = InvertedResidual(16, 1, 1, name="block0_0")(x, train)  # /2, 16
        x4 = x2
        for j, s in enumerate([2, 1]):
            x4 = InvertedResidual(24, s, 6, name=f"block1_{j}")(x4, train)  # /4, 24
        x8 = x4
        for j, s in enumerate([2, 1, 1]):
            x8 = InvertedResidual(32, s, 6, name=f"block2_{j}")(x8, train)  # /8, 32
        x16 = x8
        for j, s in enumerate([2, 1, 1, 1]):
            x16 = InvertedResidual(64, s, 6, name=f"block3_{j}")(x16, train)
        for j, s in enumerate([1, 1, 1]):
            x16 = InvertedResidual(96, s, 6, name=f"block3_{4 + j}")(x16, train)  # /16, 96
        x32 = x16
        for j, s in enumerate([2, 1, 1]):
            x32 = InvertedResidual(160, s, 6, name=f"block4_{j}")(x32, train)  # /32, 160
        return x2, x4, x8, x16, x32


class Feature(nn.Module):
    """MobileNetV2 trunk + Conv2x FPN decoder returning [x4, x8, x16, x32]
    with channels [48, 64, 192, 160] (reference submodule.py:161-196)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, x4, x8, x16, x32 = MobileNetV2Backbone(name="backbone")(x, train)
        x16 = Conv2x(96, deconv=True, name="deconv32_16")(x32, x16)
        x8 = Conv2x(32, deconv=True, name="deconv16_8")(x16, x8)
        x4 = Conv2x(24, deconv=True, name="deconv8_4")(x8, x4)
        x4 = BasicConv(48, kernel_size=3, stride=1, padding=1, name="conv4")(x4)
        return [x4, x8, x16, x32]


class MobileNetV4SmallBackbone(nn.Module):
    """MobileNetV4-Conv-S trunk through the first /32 block, matching the
    reference's `blocks[0:1],[1:2],[2:3],[3][0:1]` split (submodule.py:249-252)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x2 = ConvBnAct(32, 3, 2, act="relu", name="conv_stem")(x, train)  # /2, 32
        # fused stage /4: 3x3 s2 conv + 1x1 conv
        x4 = ConvBnAct(32, 3, 2, act="relu", name="block0_0")(x2, train)
        x4 = ConvBnAct(32, 1, 1, act="relu", name="block0_1")(x4, train)  # /4, 32
        # fused stage /8: 3x3 s2 (exp 96) + 1x1 -> 64
        x8 = ConvBnAct(96, 3, 2, act="relu", name="block1_0")(x4, train)
        x8 = ConvBnAct(64, 1, 1, act="relu", name="block1_1")(x8, train)  # /8, 64
        # UIB stage /16 -> 96
        x16 = UniversalInvertedResidual(96, 5, 5, 2, 3.0, name="block2_0")(x8, train)
        for j in range(4):
            x16 = UniversalInvertedResidual(96, 0, 3, 1, 2.0, name=f"block2_{1 + j}")(x16, train)
        x16 = UniversalInvertedResidual(96, 3, 0, 1, 4.0, name="block2_5")(x16, train)  # /16, 96
        # first /32 UIB block only (reference keeps blocks[3][0:1])
        x32 = UniversalInvertedResidual(128, 3, 3, 2, 6.0, name="block3_0")(x16, train)  # /32, 128
        return x2, x4, x8, x16, x32


class FeatureV4(nn.Module):
    """MobileNetV4-Conv-S trunk + Conv2x decoder with configurable output
    stride (reference submodule.py:224-293).

    n_downsample selects the finest returned scale: 3 -> [x8,x16,x32],
    2 -> [x4,...], 1 -> [x2,...], 0 -> prepends a bilinear x1.
    Channel lists match the reference comments (submodule.py:278-291).
    """

    img_channels: int = 3
    n_downsample: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.n_downsample in (0, 1, 2, 3)
        x = Conv(3, 1, 1, 0, name="mapping_conv")(x)
        x2, x4, x8, x16, x32 = MobileNetV4SmallBackbone(name="backbone")(x, train)
        x16 = Conv2x(96, deconv=True, name="deconv32_16")(x32, x16)
        x8 = Conv2x(64, deconv=True, name="deconv16_8")(x16, x8)
        if self.n_downsample == 3:
            x8 = BasicConv(128, kernel_size=3, stride=1, padding=1, name="final_conv")(x8)
            return [x8, x16, x32]
        x4 = Conv2x(32, deconv=True, name="deconv8_4")(x8, x4)
        if self.n_downsample == 2:
            x4 = BasicConv(64, kernel_size=3, stride=1, padding=1, name="final_conv")(x4)
            return [x4, x8, x16, x32]
        x2 = Conv2x(32, deconv=True, name="deconv4_2")(x4, x2)
        x2 = BasicConv(64, kernel_size=3, stride=1, padding=1, name="final_conv")(x2)
        if self.n_downsample == 1:
            return [x2, x4, x8, x16, x32]
        x1 = jax.image.resize(
            x2, (x2.shape[0], x2.shape[1] * 2, x2.shape[2] * 2, x2.shape[-1]), "bilinear"
        )
        return [x1, x2, x4, x8, x16, x32]
