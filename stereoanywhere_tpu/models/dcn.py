"""Modulated deformable convolution, gather-free TPU formulation.

The reference wraps torchvision's CUDA `deform_conv2d`
(reference dcn.py:6-69); it is available to BasicConv(dcn=True) but UNUSED by
the shipped model.  This implementation keeps the capability without native
code: per-tap bilinear sampling is expressed as two 1-D tent contractions
(the same trick as the correlation lookup), so it compiles to dense VPU/MXU
work instead of scatter/gather.

Cost is O(K^2 * (H + W)) tents per output pixel — fine for the 3x3 kernels
the reference uses, not meant for large deformable kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoanywhere_tpu.models.layers import Conv, kaiming_normal_fan_out


def _sample_bilinear_dense(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """img (B,H,W,C); ys/xs (B,H',W') absolute sample coords (zeros padding).
    Returns (B,H',W',C) via separable tent contractions."""
    bh, h, w, c = img.shape
    iy = jnp.arange(h, dtype=jnp.float32)
    ix = jnp.arange(w, dtype=jnp.float32)
    wy = jnp.maximum(1.0 - jnp.abs(ys[..., None] - iy), 0.0)  # (B,H',W',H)
    wx = jnp.maximum(1.0 - jnp.abs(xs[..., None] - ix), 0.0)  # (B,H',W',W)
    # contract H then W
    tmp = jnp.einsum("bhwy,byxc->bhwxc", wy, img)  # (B,H',W',W,C)
    return jnp.einsum("bhwx,bhwxc->bhwc", wx, tmp)


class DeformableConv2d(nn.Module):
    """3x3 modulated deformable conv (offsets + sigmoid modulation learned
    from the input, init 0 like the reference dcn.py:25-43)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, cin = x.shape
        k = self.kernel_size
        n_taps = k * k
        offs = nn.Conv(
            3 * n_taps,
            (k, k),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            kernel_init=nn.initializers.zeros,
            name="offset_modulator_conv",
        )(x)
        oy = offs[..., :n_taps]
        ox = offs[..., n_taps : 2 * n_taps]
        mod = 2.0 * jax.nn.sigmoid(offs[..., 2 * n_taps :])  # (B,H',W',KK)

        hp, wp = oy.shape[1], oy.shape[2]
        base_y = jnp.arange(hp, dtype=jnp.float32)[None, :, None] * self.stride
        base_x = jnp.arange(wp, dtype=jnp.float32)[None, None, :] * self.stride

        kernel = self.param(
            "kernel", kaiming_normal_fan_out(), (k, k, cin, self.features)
        )
        out = 0.0
        for t in range(n_taps):
            dy, dx = t // k - self.padding, t % k - self.padding
            ys = base_y + dy + oy[..., t]
            xs = base_x + dx + ox[..., t]
            sampled = _sample_bilinear_dense(x, ys, xs) * mod[..., t : t + 1]
            out = out + jnp.einsum(
                "bhwc,cf->bhwf", sampled, kernel[t // k, t % k]
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out
