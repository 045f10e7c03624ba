"""Feature / context encoders (reference extractor.py).

- FeatureEncoder  == BasicEncoder   (reference extractor.py:122-197): instance
  norm, stride-4 trunk, 256-ch output; left+right run as one doubled batch.
- ContextEncoder  == MultiBasicEncoder (reference extractor.py:199-300): batch
  norm, outputs at 1/4, 1/8, 1/16 with two heads per scale (GRU hidden+input).

NHWC throughout.  Module/param naming mirrors torch attribute paths for the
weight converter (torch `layer2.0.conv1` -> flax `layer2_0/conv1`).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.models.layers import (
    BatchNorm,
    Conv,
    ParamConv,
    instance_norm,
    paired_conv_apply,
)


class ResidualBlock(nn.Module):
    """Two 3x3 convs + skip (reference extractor.py:6-60).

    `paired=True` expects both stereo views folded into the channel dim
    (B,H,W,2C) and applies every conv block-diagonally with the SAME
    parameters (see layers.paired_conv_apply) — exact semantics, better MXU
    lane utilization for the 64-channel full-resolution layers.  Only valid
    with instance/none norm (per-channel stats are view-separable; batch-norm
    stats would pool the views when unfolded, so pairing would change them).
    """

    features: int
    norm: str = "instance"  # 'instance' | 'batch' | 'none'
    stride: int = 1
    paired: bool = False
    # unfold_paired: input is the PAIRED layout (B,H,W,2C) but this block's
    # first convs emit the views as separate batch entries (2B,H,W,F) — the
    # paired->batch switch happens INSIDE conv1/downsample_0 via Cin-zero-
    # extended kernels instead of a lane-slice concat.  The slice at lane 64
    # of a 128-lane tile was a measured 4 ms relayout at 1024² (device trace
    # r4); the two extra kernel halves are zeros (exact same sums), and each
    # conv reads the full-lane paired input at full MXU utilization.
    unfold_paired: bool = False

    def _norm(self, name: str):
        if self.norm == "batch":
            return BatchNorm(name=name)
        if self.norm == "instance":
            return lambda x, **_: instance_norm(x)
        return lambda x, **_: x

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(use_running_average=not train) if self.norm == "batch" else {}

        if self.unfold_paired:
            assert self.norm != "batch", "unfold_paired requires non-batch norm"
            in_features = x.shape[-1] // 2
            assert self.stride != 1 or in_features != self.features, (
                "unfold_paired expects a downsample shortcut (it carries the "
                "second unfold conv)"
            )

            def unfold_conv(inp, kernel, bias, stride, pad):
                z = jnp.zeros_like(kernel)
                if pad:
                    # pad ONCE, shared by both view convs: with in-conv
                    # padding XLA materialized a separate 0.82 ms pad op
                    # per conv on the full-res input (device trace r4)
                    inp = jnp.pad(inp, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                ys = []
                for kk in (
                    jnp.concatenate([kernel, z], axis=2),
                    jnp.concatenate([z, kernel], axis=2),
                ):
                    y = jax.lax.conv_general_dilated(
                        inp,
                        kk.astype(inp.dtype),
                        (stride, stride),
                        ((0, 0), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    ys.append(y + bias.astype(y.dtype))
                return jnp.concatenate(ys, axis=0)

            k1, b1 = ParamConv(self.features, 3, name="conv1")(in_features)
            y = unfold_conv(x, k1, b1, self.stride, 1)
            y = jax.nn.relu(self._norm("norm1")(y, **kw))
            y = Conv(self.features, 3, 1, 1, name="conv2")(y)
            y = jax.nn.relu(self._norm("norm2")(y, **kw))
            kd, bd = ParamConv(self.features, 1, name="downsample_0")(in_features)
            sc = unfold_conv(x, kd, bd, self.stride, 0)
            sc = self._norm("norm3")(sc, **kw)
            return jax.nn.relu(sc + y)

        if self.paired:
            assert self.norm != "batch", "paired ResidualBlock requires non-batch norm"
            in_features = x.shape[-1] // 2
            k1, b1 = ParamConv(self.features, 3, name="conv1")(in_features)
            y = paired_conv_apply(x, k1, b1, self.stride, 1)
            y = self._norm("norm1")(y, **kw)
            y = jax.nn.relu(y)
            k2, b2 = ParamConv(self.features, 3, name="conv2")(self.features)
            y = paired_conv_apply(y, k2, b2, 1, 1)
            y = self._norm("norm2")(y, **kw)
            y = jax.nn.relu(y)
            if self.stride != 1 or in_features != self.features:
                kd, bd = ParamConv(self.features, 1, name="downsample_0")(in_features)
                x = paired_conv_apply(x, kd, bd, self.stride, 0)
                x = self._norm("norm3")(x, **kw)
            return jax.nn.relu(x + y)

        in_features = x.shape[-1]
        y = Conv(self.features, 3, self.stride, 1, name="conv1")(x)
        y = self._norm("norm1")(y, **kw)
        y = jax.nn.relu(y)
        y = Conv(self.features, 3, 1, 1, name="conv2")(y)
        y = self._norm("norm2")(y, **kw)
        y = jax.nn.relu(y)

        if self.stride != 1 or in_features != self.features:
            x = Conv(self.features, 1, self.stride, 0, name="downsample_0")(x)
            x = self._norm("norm3")(x, **kw)
        return jax.nn.relu(x + y)


class FeatureEncoder(nn.Module):
    """Stereo feature CNN (fnet), instance norm, output 256ch at 1/4 res.

    With n_downsample=2 (shipped): conv1 stride 1, layer2/layer3 stride 2
    (reference extractor.py:140-146).
    """

    output_dim: int = 256
    norm: str = "instance"
    downsample: int = 2
    # Fold the two views (stacked on batch) into the channel dim and run the
    # 64-channel full-resolution layers block-diagonally: exact same math
    # (see paired_conv_apply), 2x better MXU lane utilization (64 lanes of a
    # 128-lane tile would otherwise idle; measured 1.21 -> 0.83 ms per conv
    # at 512x512).  The views UNFOLD back to the batch dim before layer2: at
    # 96/128/256 channels the lanes are already >= 75% full unpaired, so the
    # block-diagonal zeros would only waste FLOPs there (measured layer2_0
    # paired 2.64 ms vs ~1.4 ms unpaired).  Requires an even batch (always
    # true: callers concat [L, R]) and non-batch norm.
    paired: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d = self.downsample
        paired = self.paired and self.norm != "batch" and x.shape[0] % 2 == 0
        if paired:
            b = x.shape[0] // 2
            x = jnp.concatenate([x[:b], x[b:]], axis=-1)  # (B,H,W,2*3)
            k1, b1 = ParamConv(64, 7, name="conv1")(x.shape[-1] // 2)
            x = paired_conv_apply(x, k1, b1, 1 + (d > 2), 3)
        else:
            x = Conv(64, 7, 1 + (d > 2), 3, name="conv1")(x)
        x = instance_norm(x) if self.norm == "instance" else x
        x = jax.nn.relu(x)

        x = ResidualBlock(64, self.norm, 1, paired=paired, name="layer1_0")(x, train)
        x = ResidualBlock(64, self.norm, 1, paired=paired, name="layer1_1")(x, train)
        # the views unfold back onto the batch axis INSIDE layer2_0's convs
        # (ResidualBlock.unfold_paired): the explicit lane-slice concat that
        # used to sit here was a 4 ms relayout at 1024².
        x = ResidualBlock(
            96, self.norm, 1 + (d > 1), unfold_paired=paired, name="layer2_0"
        )(x, train)
        x = ResidualBlock(96, self.norm, 1, name="layer2_1")(x, train)
        x = ResidualBlock(128, self.norm, 1 + (d > 0), name="layer3_0")(x, train)
        x = ResidualBlock(128, self.norm, 1, name="layer3_1")(x, train)
        return Conv(self.output_dim, 1, 1, 0, name="conv2")(x)


class ContextEncoder(nn.Module):
    """Context CNN (cnet) with batch norm and 3 scales x 2 heads.

    Fed the left mono depth replicated to 3 channels, NOT the RGB image
    (reference stereoanywhere.py:116).  Returns
    ((net04, inp04), (net08, inp08), (net16, inp16)) raw head outputs at
    1/4, 1/8, 1/16 resolution (reference names them outputs08/16/32).

    API contract: a 1-CHANNEL input is always interpreted as "mono depth
    that the reference would replicate to 3 channels" — the conv1 kernel
    stays (7,7,3,64) and is Cin-summed so the math equals conv over the
    replicated input.  A caller with a genuine single-channel signal (not
    a to-be-replicated depth) must replicate/project to 3 channels itself
    before calling.
    """

    output_dims: Sequence[Sequence[int]] = ((128, 128, 128), (128, 128, 128))
    norm: str = "batch"
    downsample: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        d = self.downsample
        kw = dict(use_running_average=not train)

        if x.shape[-1] == 1:
            # The model feeds cnet the mono depth REPLICATED to 3 channels
            # (reference stereoanywhere.py:116).  conv over identical
            # channels == conv of the Cin-summed kernel over ONE channel —
            # exact, and 3x less contraction work on the full-res 7x7.
            # Params stay (7,7,3,64) for the converter.
            k1, b1 = ParamConv(64, 7, name="conv1")(3)
            s1 = 1 + (d > 2)
            x = jax.lax.conv_general_dilated(
                x,
                jnp.sum(k1, axis=2, keepdims=True).astype(x.dtype),
                (s1, s1),
                ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b1.astype(x.dtype)
        else:
            x = Conv(64, 7, 1 + (d > 2), 3, name="conv1")(x)
        x = BatchNorm(name="norm1")(x, **kw) if self.norm == "batch" else x
        x = jax.nn.relu(x)

        x = ResidualBlock(64, self.norm, 1, name="layer1_0")(x, train)
        x = ResidualBlock(64, self.norm, 1, name="layer1_1")(x, train)
        x = ResidualBlock(96, self.norm, 1 + (d > 1), name="layer2_0")(x, train)
        x = ResidualBlock(96, self.norm, 1, name="layer2_1")(x, train)
        x = ResidualBlock(128, self.norm, 1 + (d > 0), name="layer3_0")(x, train)
        x = ResidualBlock(128, self.norm, 1, name="layer3_1")(x, train)

        outs04 = []
        for i, dims in enumerate(self.output_dims):
            h = ResidualBlock(128, self.norm, 1, name=f"outputs08_{i}_0")(x, train)
            outs04.append(Conv(dims[2], 3, 1, 1, name=f"outputs08_{i}_1")(h))

        y = ResidualBlock(128, self.norm, 2, name="layer4_0")(x, train)
        y = ResidualBlock(128, self.norm, 1, name="layer4_1")(y, train)
        outs08 = []
        for i, dims in enumerate(self.output_dims):
            h = ResidualBlock(128, self.norm, 1, name=f"outputs16_{i}_0")(y, train)
            outs08.append(Conv(dims[1], 3, 1, 1, name=f"outputs16_{i}_1")(h))

        z = ResidualBlock(128, self.norm, 2, name="layer5_0")(y, train)
        z = ResidualBlock(128, self.norm, 1, name="layer5_1")(z, train)
        outs16 = [Conv(dims[0], 3, 1, 1, name=f"outputs32_{i}")(z) for i, dims in enumerate(self.output_dims)]

        return (tuple(outs04), tuple(outs08), tuple(outs16))
