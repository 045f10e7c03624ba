"""3-D hourglass cost-volume aggregation with dual feature attention.

Reference hourglass.py:13-91 + submodule.py:113-140 (DoubleFeatureAtt).

Volume layout: NDHWC (B, W3, H, W2, C) — the reference permutes its
(B,C,H,W2,W3) volume to spatial order (W3, H, W2) before the 3-D convs
(reference hourglass.py:63) and permutes back after; we keep that spatial
order natively with channels last (TPU conv3d layout).

Feature maps ("fmde": mono-depth pyramids) are NHWC (B, H', W', C').
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.models.layers import BasicConv, Conv
from stereoanywhere_tpu.ops.interp import resize_trilinear_align_corners


class DoubleFeatureAtt(nn.Module):
    """Sigmoid gating of the volume by left x right feature attention
    (reference submodule.py:113-140).

    cv (B, W3, H, W2, C); feat_left (B,H,W2',Cf); feat_right (B,H,W3',Cf).
    left attention broadcasts over W3, right attention over W2; the outer
    product is trilinearly resized to the volume size before gating.
    """

    cv_features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, cv, feat_left, feat_right, folded_w: int | None = None):
        mid = max(32, feat_left.shape[-1] // 2)
        att_l = BasicConv(
            mid, norm="instance", act="lrelu",
            kernel_size=self.kernel_size, stride=self.stride, padding=self.padding,
            name="feat_att_left_0",
        )(feat_left)
        att_l = Conv(self.cv_features, 1, 1, 0, name="feat_att_left_1")(att_l)
        att_r = BasicConv(
            mid, norm="instance", act="lrelu",
            kernel_size=self.kernel_size, stride=self.stride, padding=self.padding,
            name="feat_att_right_0",
        )(feat_right)
        att_r = Conv(self.cv_features, 1, 1, 0, name="feat_att_right_1")(att_r)

        if folded_w is not None and cv.ndim == 5:
            # cv is the carried block layout (B, nb, W3, H, (W2/nb)*C).  The
            # right gate is independent of W2, so it is built once at BLOCK
            # width and broadcast over the nb axis inside the product fusion
            # — the full-width (B, W3, H, W2*C) right factor of the folded
            # path is never materialized.
            from stereoanywhere_tpu.ops.folded import (
                lane_broadcast_c,
                resize_folded,
                to_blocks,
            )

            c = self.cv_features
            nb = cv.shape[1]
            wb = folded_w // nb
            gl = jax.nn.sigmoid(att_l)  # (B, Ha, Wl, C)
            gr = jax.nn.sigmoid(att_r).transpose(0, 2, 1, 3)  # (B, Dr, Ha, C)
            b, ha, wl, _ = gl.shape
            same = (
                gr.shape[1] == cv.shape[2] and ha == cv.shape[3] and wl == folded_w
            )
            if same:
                l_b = to_blocks(gl.reshape(b, 1, ha, wl * c), nb)  # (B,nb,1,H,wb*C)
                r_b = lane_broadcast_c(gr, wb)[:, None]  # (B,1,W3,H,wb*C)
                return cv * l_b * r_b
            # att at a different scale (non-shipped att_stride>1 configs):
            # correct-but-slower folded gate + resize + re-block
            gate = gl.reshape(b, ha, wl * c)[:, None] * lane_broadcast_c(gr, wl)
            gate = resize_folded(
                gate, (cv.shape[2], cv.shape[3], folded_w), w=wl, c=c
            )
            return to_blocks(gate, nb) * cv

        if folded_w is not None:
            # cv is lane-folded (B, W3, H, W2*C); same gating math without a
            # lane-padded 5-D intermediate (ops/folded.py).
            from stereoanywhere_tpu.ops.folded import lane_broadcast_c, resize_folded

            c = self.cv_features
            gl = jax.nn.sigmoid(att_l)  # (B, Ha, Wl, C)
            gr = jax.nn.sigmoid(att_r).transpose(0, 2, 1, 3)  # (B, Dr, Ha, C)
            b, ha, wl, _ = gl.shape
            same = (
                gr.shape[1] == cv.shape[1] and ha == cv.shape[2] and wl == folded_w
            )
            if same:
                l_f = gl.reshape(b, ha, wl * c)[:, None]  # (B,1,H,W2*C)
                r_f = lane_broadcast_c(gr, wl)  # (B,W3,H,W2*C)
                return cv * l_f * r_f
            gate = gl.reshape(b, ha, wl * c)[:, None] * lane_broadcast_c(gr, wl)
            gate = resize_folded(
                gate, (cv.shape[1], cv.shape[2], folded_w), w=wl, c=c
            )
            return gate * cv

        # left: (B,H,W2,C) -> (B, 1, H, W2, C); right: (B,H,W3,C) -> (B, W3, H, 1, C)
        gate = jax.nn.sigmoid(att_l)[:, None, :, :, :] * jax.nn.sigmoid(att_r).transpose(0, 2, 1, 3)[:, :, :, None, :]
        gate = resize_trilinear_align_corners(gate, cv.shape[1:4])
        return gate * cv


class _Kernel3d(nn.Module):
    """Bare 1x1x1 conv3d kernel under the BasicConv-compatible path
    (<parent>/conv/kernel)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        from stereoanywhere_tpu.models.layers import kaiming_normal_fan_out

        return self.param(
            "kernel", kaiming_normal_fan_out(), (1, 1, 1, in_features, self.features)
        )


class _SplitConcatConv1(nn.Module):
    """BasicConv(k=1, instance-norm, lrelu) over a conceptual concat [a, b],
    computed as conv(a, k[:ca]) + conv(b, k[ca:]) WITHOUT materializing the
    concat — at 1024x1024 the full-resolution concat is 6.3 GB and is the
    difference between fitting in HBM or not.  Parameter layout identical to
    BasicConv (conv/kernel of shape (1,1,1, ca+cb, cout)), so checkpoints
    convert unchanged.  Bitwise-equal math up to f32 accumulation order.
    """

    features: int

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        from stereoanywhere_tpu.models.layers import instance_norm

        ca, cb = a.shape[-1], b.shape[-1]
        kernel = _Kernel3d(self.features, name="conv")(ca + cb)

        def conv(x, k):
            # 1x1x1 conv == channel matmul; einsum avoids XLA's conv3d layout
            # padding (measured 16x HBM expansion with 8-channel minor dims)
            return jnp.einsum(
                "bdhwc,co->bdhwo", x, k[0, 0, 0].astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)

        y = conv(a, kernel[..., :ca, :]) + conv(b, kernel[..., ca:, :])
        y = instance_norm(y)
        return jax.nn.leaky_relu(y, negative_slope=0.01)


class _SplitConv1Folded(nn.Module):
    """BasicConv(k=1, instance-norm, lrelu) over a conceptual channel concat
    [a, b] of two LANE-FOLDED volumes (ops/folded.py), computed as
    conv(a, k[:ca]) + conv(b, k[ca:]): the interleaved folded concat is never
    materialized.  Parameter layout identical to BasicConv / _SplitConcatConv1
    (conv/kernel (1,1,1, ca+cb, cout)).
    """

    features: int

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array, w: int, ca: int, cb: int) -> jax.Array:
        from stereoanywhere_tpu.ops.folded import conv1x1x1_folded, instance_norm_folded

        kernel = _Kernel3d(self.features, name="conv")(ca + cb)
        y = conv1x1x1_folded(a, kernel[..., :ca, :], w=w) + conv1x1x1_folded(
            b, kernel[..., ca:, :], w=w
        )
        y = instance_norm_folded(y, self.features)
        return jax.nn.leaky_relu(y, negative_slope=0.01)


class _SplitConv1Blocked(nn.Module):
    """BasicConv(k=1, instance-norm, lrelu) over a conceptual channel concat
    [a, b] of two carried-block-layout volumes — the blocked twin of
    _SplitConv1Folded.  Parameter layout identical (conv/kernel
    (1,1,1, ca+cb, cout))."""

    features: int

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array, w: int, ca: int, cb: int) -> jax.Array:
        from stereoanywhere_tpu.ops.folded import conv1x1x1_blocked, instance_norm_blocked

        kernel = _Kernel3d(self.features, name="conv")(ca + cb)
        y = conv1x1x1_blocked(a, kernel[..., :ca, :], w=w) + conv1x1x1_blocked(
            b, kernel[..., ca:, :], w=w
        )
        y = instance_norm_blocked(y, self.features)
        return jax.nn.leaky_relu(y, negative_slope=0.01)


class Hourglass(nn.Module):
    """3-level 3-D encoder-decoder over the masked cost volume
    (reference hourglass.py:13-91).

    in_features=8 (depth-bin channels), out_features=8 in the shipped config.
    feature pyramids have 4 scales (1/4..1/32 of the image), channels
    `feature_channels` (all 1 for the shipped mono-depth pyramids).
    """

    in_features: int = 8
    out_features: int = 8
    feature_channels: Sequence[int] = (1, 1, 1, 1)
    att_kernel_size: int = 3
    att_stride: int = 1
    att_padding: int = 1
    folded: bool = False  # x is lane-folded (B, W3, H, W2*C) in and out
    blocked: bool = False  # x is carried-block (B, nb, W3, H, (W2/nb)*C) in and out

    @nn.compact
    def __call__(self, x, features_left, features_right):
        if self.blocked:
            return self._forward_blocked(x, features_left, features_right)
        if self.folded:
            return self._forward_folded(x, features_left, features_right)
        ns = len(self.feature_channels)  # number_of_scales = 4
        cin = self.in_features
        original = x

        att_kw = dict(
            kernel_size=self.att_kernel_size, stride=self.att_stride, padding=self.att_padding
        )

        # Downsample path: channels 8 -> 16 -> 32 -> 48 (reference hourglass.py:22-31)
        down = []
        for i in range(ns - 1):
            cout = cin * (2 * (i + 1))
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=2, name=f"down_layers_{i}_0")(x)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"down_layers_{i}_1")(x)
            x = DoubleFeatureAtt(cout, name=f"feature_atts_{i}", **att_kw)(
                x, features_left[i + 1], features_right[i + 1]
            )
            down.append(x)

        # Upsample + aggregate (reference hourglass.py:34-44, 77-82).
        # QUIRK kept for weight parity: the reference interpolates the STORED
        # down feature `downsampled_features[ns-2-i]` at every level — not the
        # previous aggregation result — so agg level 0's output is discarded
        # (dead weights) and only the last agg level feeds the final stage.
        for i in range(ns - 2):
            cout = cin * (2 * (ns - i - 2))
            skip = down[ns - 3 - i]
            x_up = resize_trilinear_align_corners(down[ns - 2 - i], skip.shape[1:4])
            x = jnp.concatenate([x_up, skip], axis=-1)
            x = BasicConv(cout, is_3d=True, kernel_size=1, padding=0, stride=1, name=f"agg_layers_{i}_0")(x)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"agg_layers_{i}_1")(x)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"agg_layers_{i}_2")(x)
            x = DoubleFeatureAtt(cout, name=f"feature_atts_up_{i}", **att_kw)(
                x, features_left[ns - 2 - i], features_right[ns - 2 - i]
            )

        # Final aggregation at full volume resolution (reference hourglass.py:46-50, 84-89).
        # The concat [original, x_up] is 6.3 GB at 1024x1024; the split conv
        # computes the same 1x1x1 BasicConv without materializing it.
        x_up = resize_trilinear_align_corners(x, original.shape[1:4])
        x = _SplitConcatConv1(cin, name="final_agg_0")(original, x_up)
        x = BasicConv(cin, is_3d=True, kernel_size=3, padding=1, stride=1, name="final_agg_1")(x)
        x = BasicConv(self.out_features, is_3d=True, kernel_size=3, padding=1, stride=1, name="final_agg_2")(x)
        x = DoubleFeatureAtt(self.out_features, name="final_feature_atts_up", **att_kw)(
            x, features_left[0], features_right[0]
        )
        return x

    def _forward_blocked(self, x, features_left, features_right):
        """Same network on the carried block layout (B, nb, W3, H, (W2/nb)*C)
        — identical parameters and multiply-adds to the folded path, but the
        block axis lives across the whole hourglass, so each banded conv pays
        only a halo exchange instead of the window stack / output
        transpose+reshape passes (ops/folded.py 'Block-batch carried
        layout')."""
        from stereoanywhere_tpu.ops.folded import resize_blocked

        ns = len(self.feature_channels)
        cin = self.in_features
        nb = x.shape[1]
        w0 = x.shape[-1] * nb // cin
        original = x

        att_kw = dict(
            kernel_size=self.att_kernel_size, stride=self.att_stride, padding=self.att_padding
        )

        down = []  # (tensor, w, c) per level
        cur_w, cur_c = w0, cin
        for i in range(ns - 1):
            cout = cin * (2 * (i + 1))
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=2, name=f"down_layers_{i}_0")(x, folded_w=cur_w, folded_nb=nb)
            cur_w //= 2
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"down_layers_{i}_1")(x, folded_w=cur_w, folded_nb=nb)
            x = DoubleFeatureAtt(cout, name=f"feature_atts_{i}", **att_kw)(
                x, features_left[i + 1], features_right[i + 1], folded_w=cur_w
            )
            cur_c = cout
            down.append((x, cur_w, cur_c))

        # Upsample + aggregate, stored-feature quirk preserved (see above).
        for i in range(ns - 2):
            cout = cin * (2 * (ns - i - 2))
            skip, w_s, c_s = down[ns - 3 - i]
            src, w_u, c_u = down[ns - 2 - i]
            x_up = resize_blocked(
                src, (skip.shape[2], skip.shape[3], w_s), w=w_u, c=c_u
            )
            x = _SplitConv1Blocked(cout, name=f"agg_layers_{i}_0")(x_up, skip, w_s, c_u, c_s)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"agg_layers_{i}_1")(x, folded_w=w_s, folded_nb=nb)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"agg_layers_{i}_2")(x, folded_w=w_s, folded_nb=nb)
            x = DoubleFeatureAtt(cout, name=f"feature_atts_up_{i}", **att_kw)(
                x, features_left[ns - 2 - i], features_right[ns - 2 - i], folded_w=w_s
            )
            last_w, last_c = w_s, cout

        x_up = resize_blocked(
            x, (original.shape[2], original.shape[3], w0), w=last_w, c=last_c
        )
        x = _SplitConv1Blocked(cin, name="final_agg_0")(original, x_up, w0, cin, last_c)
        x = BasicConv(cin, is_3d=True, kernel_size=3, padding=1, stride=1, name="final_agg_1")(x, folded_w=w0, folded_nb=nb)
        x = BasicConv(self.out_features, is_3d=True, kernel_size=3, padding=1, stride=1, name="final_agg_2")(x, folded_w=w0, folded_nb=nb)
        x = DoubleFeatureAtt(self.out_features, name="final_feature_atts_up", **att_kw)(
            x, features_left[0], features_right[0], folded_w=w0
        )
        return x

    def _forward_folded(self, x, features_left, features_right):
        """Same network on a lane-folded volume (B, W3, H, W2*C) — identical
        parameters and multiply-adds, zero lane-padding waste (ops/folded.py;
        the unfolded layout pads C=8 tensors 16x, 4.3 GB per full-resolution
        tensor at 1024x1024)."""
        from stereoanywhere_tpu.ops.folded import resize_folded

        ns = len(self.feature_channels)
        cin = self.in_features
        w0 = x.shape[-1] // cin
        original = x

        att_kw = dict(
            kernel_size=self.att_kernel_size, stride=self.att_stride, padding=self.att_padding
        )

        down = []  # (tensor, w, c) per level
        cur_w, cur_c = w0, cin
        for i in range(ns - 1):
            cout = cin * (2 * (i + 1))
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=2, name=f"down_layers_{i}_0")(x, folded_w=cur_w)
            cur_w //= 2
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"down_layers_{i}_1")(x, folded_w=cur_w)
            x = DoubleFeatureAtt(cout, name=f"feature_atts_{i}", **att_kw)(
                x, features_left[i + 1], features_right[i + 1], folded_w=cur_w
            )
            cur_c = cout
            down.append((x, cur_w, cur_c))

        # Upsample + aggregate, stored-feature quirk preserved (see above).
        for i in range(ns - 2):
            cout = cin * (2 * (ns - i - 2))
            skip, w_s, c_s = down[ns - 3 - i]
            src, w_u, c_u = down[ns - 2 - i]
            x_up = resize_folded(
                src, (skip.shape[1], skip.shape[2], w_s), w=w_u, c=c_u
            )
            x = _SplitConv1Folded(cout, name=f"agg_layers_{i}_0")(x_up, skip, w_s, c_u, c_s)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"agg_layers_{i}_1")(x, folded_w=w_s)
            x = BasicConv(cout, is_3d=True, kernel_size=3, padding=1, stride=1, name=f"agg_layers_{i}_2")(x, folded_w=w_s)
            x = DoubleFeatureAtt(cout, name=f"feature_atts_up_{i}", **att_kw)(
                x, features_left[ns - 2 - i], features_right[ns - 2 - i], folded_w=w_s
            )
            last_w, last_c = w_s, cout

        x_up = resize_folded(
            x, (original.shape[1], original.shape[2], w0), w=last_w, c=last_c
        )
        x = _SplitConv1Folded(cin, name="final_agg_0")(original, x_up, w0, cin, last_c)
        x = BasicConv(cin, is_3d=True, kernel_size=3, padding=1, stride=1, name="final_agg_1")(x, folded_w=w0)
        x = BasicConv(self.out_features, is_3d=True, kernel_size=3, padding=1, stride=1, name="final_agg_2")(x, folded_w=w0)
        x = DoubleFeatureAtt(self.out_features, name="final_feature_atts_up", **att_kw)(
            x, features_left[0], features_right[0], folded_w=w0
        )
        return x
