"""Geometry primitives: joint normalization, depth->normals, disparity warping, soft LRC.

Channel-last (NHWC). Reference semantics documented per function.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.ops.interp import sample_1d_linear


def joint_minmax_normalize(xs: list[jax.Array], eps: float = 1e-4) -> list[jax.Array]:
    """Joint per-sample min-max normalization over a list of NHWC tensors.

    Reference `normalize` (utils/utils.py:56-71): min/max are PER CHANNEL
    (max_pool2d over the full H,W window keeps the channel axis), per sample,
    jointly over the list, with stop_gradient on the statistics.
    """
    import functools

    mins = [jnp.min(x, axis=(1, 2), keepdims=True) for x in xs]
    maxs = [jnp.max(x, axis=(1, 2), keepdims=True) for x in xs]
    lo = jax.lax.stop_gradient(functools.reduce(jnp.minimum, mins))
    hi = jax.lax.stop_gradient(functools.reduce(jnp.maximum, maxs))
    return [(x - lo) / (hi - lo + eps) for x in xs]


def central_gradients(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central differences with replicate padding, NHWC with C=1.

    Matches kornia `spatial_gradient(mode='diff', order=1, normalized=False)`
    (used at reference utils/utils.py:73-77): gx[i,j] = x[i,j+1]-x[i,j-1],
    gy[i,j] = x[i+1,j]-x[i-1,j] (no 1/2 factor).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    gx = xp[:, 1:-1, 2:, :] - xp[:, 1:-1, :-2, :]
    gy = xp[:, 2:, 1:-1, :] - xp[:, :-2, 1:-1, :]
    return gx, gy


def estimate_normals(depth: jax.Array, normal_gain: float | jax.Array) -> jax.Array:
    """Depth (B,H,W,1) -> unit surface normals (B,H,W,3).

    Reference utils/utils.py:73-77: normals = normalize([-d/dx, -d/dy, 1]) of
    gain*depth.  NOTE: normals feed ONLY the left-right normal correlation
    (reference stereoanywhere.py:136), which is invariant to consistent sign
    flips of the gradient components, so the gradient sign convention cancels.
    """
    gx, gy = central_gradients(depth * normal_gain)
    ones = jnp.ones_like(gx)
    n = jnp.concatenate([-gx, -gy, ones], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def disp_warping(disp: jax.Array, img: jax.Array, right_disp: bool = False) -> jax.Array:
    """Warp `img` along x by `disp` (both NHWC, disp C=1).

    Reference utils/utils.py:172-187.  Parity quirk kept deliberately: the
    reference builds grid = 2*(x±d)/W - 1 and samples with align_corners=True,
    so the effective source coordinate is (x±d) * (W-1)/W (and y * (H-1)/H).
    Out-of-range samples are zero (grid_sample zeros padding).  Because y
    coords are scaled by (H-1)/H, sampling is genuinely bilinear in 2-D.
    """
    b, h, w, _ = img.shape
    xs = jnp.arange(w, dtype=disp.dtype)[None, None, :, None]
    src_x = (xs + disp) if right_disp else (xs - disp)
    src_x = src_x * ((w - 1) / w)

    # The y source coordinate i*(h-1)/h is DATA-INDEPENDENT: both bilinear
    # row taps are a constant permutation of the image rows — one-hot
    # matmuls on the MXU instead of per-pixel dynamic gathers (XLA lowers
    # take_along_axis to an element-at-a-time gather on TPU; measured 12 ms
    # of warp gathers in the 1024^2 base before this).  y0+1 <= h-1 always
    # (i*(h-1)/h < h-1), so every row tap is in range and the reference's
    # row_valid mask is identically 1.
    ys = jnp.arange(h, dtype=jnp.float32) * ((h - 1) / h)
    y0 = jnp.floor(ys)
    fy = (ys - y0).astype(img.dtype)[None, :, None, None]
    y0i = y0.astype(jnp.int32)
    p0 = (y0i[:, None] == jnp.arange(h)[None, :]).astype(img.dtype)  # (H,H)
    p1 = (jnp.minimum(y0i + 1, h - 1)[:, None] == jnp.arange(h)[None, :]).astype(
        img.dtype
    )
    img0 = jnp.einsum("ih,bhwc->biwc", p0, img)
    img1 = jnp.einsum("ih,bhwc->biwc", p1, img)

    def sample_rows(rows):
        vals = sample_1d_linear(
            jnp.moveaxis(rows, -1, 1),  # (B,C,H,W)
            jnp.broadcast_to(jnp.moveaxis(src_x, -1, 1), (b, rows.shape[-1], h, w)),
        )
        return jnp.moveaxis(vals, 1, -1)

    return sample_rows(img0) * (1.0 - fy) + sample_rows(img1) * fy


def softlrc(disp2: jax.Array, disp3: jax.Array, lrc_th: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Differentiable left-right consistency weights in (0,1).

    Reference utils/utils.py:189-198: warp the opposite view's disparity and
    score agreement with softplus(th - |d - d_warped|) / log(1+e^th).
    """
    div_const = math.log(1 + math.exp(lrc_th))
    warped_disp2 = disp_warping(jax.nn.relu(disp3), disp2, right_disp=True)
    warped_disp3 = disp_warping(jax.nn.relu(disp2), disp3, right_disp=False)
    s2 = jax.nn.softplus(-jnp.abs(disp2 - warped_disp3) + lrc_th) / div_const
    s3 = jax.nn.softplus(-jnp.abs(disp3 - warped_disp2) + lrc_th) / div_const
    return s2, s3
