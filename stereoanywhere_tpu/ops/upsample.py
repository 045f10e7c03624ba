"""Convex (learned) upsampling and plain flow upsampling.

Reference utils/utils.py:97-110 (convex_upflow) and :42-46 (upflow).
Channel-last layouts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.ops.interp import resize_bilinear_align_corners


def _neighborhood3x3(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H,W,9,C): 3x3 zero-padded neighborhoods.

    Tap order matches `F.unfold(kernel=3, padding=1)`: row-major over
    (dy,dx) in {-1,0,1}^2.
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    taps = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(taps, axis=3)


def convex_upsample(
    flow: jax.Array, mask: jax.Array, n_downsample: int = 2, use_scale_factor: bool = True
) -> jax.Array:
    """Convex-combination x(2^n) upsampling of a flow/disparity field.

    flow (B,H,W,D); mask (B,H,W,9*f*f) logits as emitted by the update block's
    mask head.  Matches reference convex_upflow (utils/utils.py:97-110): the
    mask is reshaped to (9, f, f), softmaxed over the 9 taps, applied to the
    (optionally f-scaled) 3x3 neighborhood of the coarse flow, and the f*f
    sub-pixels are interleaved into the full-res image.

    The torch channel order mask.view(N,1,9,f,f,H,W) means channel index =
    ((k*f + i)*f + j) for tap k and sub-pixel (i,j); we reshape accordingly.
    """
    b, h, w, d = flow.shape
    f = 2 ** n_downsample
    m = mask.reshape(b, h, w, 9, f, f)
    m = jax.nn.softmax(m, axis=3)

    src = flow * f if use_scale_factor else flow
    neigh = _neighborhood3x3(src)  # (B,H,W,9,D)

    # (B,H,W,f,f,D): convex combination per sub-pixel.
    up = jnp.einsum("bhwkij,bhwkd->bhwijd", m, neigh)
    # Interleave: out[y*f+i, x*f+j] = up[y, x, i, j]
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, d)
    return up


def upflow(flow: jax.Array, factor: int = 2, use_scale_factor: bool = True) -> jax.Array:
    """Bilinear x(2^factor) upsampling with align_corners=True, optionally
    scaling values (reference utils/utils.py:42-46)."""
    scale = 2 ** factor
    out = resize_bilinear_align_corners(flow, (flow.shape[1] * scale, flow.shape[2] * scale))
    return out * scale if use_scale_factor else out
