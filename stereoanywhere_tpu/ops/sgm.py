"""Semi-global matching — the classical baseline (reference sgm_opencv,
utils.py:190-213, which shells out to OpenCV's StereoSGBM), reimplemented
natively in JAX: census-transform matching cost + 4-direction dynamic-
programming aggregation via `lax.scan` (the scans parallelize over the
non-scanned image axis, so each DP sweep is a vectorized recurrence).

Not on the model hot path; useful as a reference/fallback and for mono-free
sanity checks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def census_transform(gray: jax.Array, window: int = 5) -> jax.Array:
    """(B,H,W) grayscale -> (B,H,W) uint32 census bitstrings."""
    r = window // 2
    pad = jnp.pad(gray, ((0, 0), (r, r), (r, r)), mode="edge")
    h, w = gray.shape[1:]
    bits = []
    for dy in range(window):
        for dx in range(window):
            if dy == r and dx == r:
                continue
            bits.append(pad[:, dy : dy + h, dx : dx + w] < gray)
    out = jnp.zeros(gray.shape, jnp.uint32)
    for i, b in enumerate(bits):
        out = out | (b.astype(jnp.uint32) << i)
    return out


def _hamming(a: jax.Array, b: jax.Array) -> jax.Array:
    x = a ^ b
    # popcount via bit tricks (uint32)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24).astype(jnp.float32)


def matching_cost(left: jax.Array, right: jax.Array, max_disp: int) -> jax.Array:
    """(B,H,W) pair -> (B,H,W,D) census hamming cost volume."""
    cl = census_transform(left)
    cr = census_transform(right)
    costs = []
    for d in range(max_disp):
        shifted = jnp.pad(cr, ((0, 0), (0, 0), (d, 0)))[:, :, : cr.shape[2]]
        c = _hamming(cl, shifted)
        # out-of-range columns get a high constant cost
        invalid = jnp.arange(cl.shape[2]) < d
        costs.append(jnp.where(invalid[None, None, :], 24.0, c))
    return jnp.stack(costs, axis=-1)


def _dp_sweep(cost: jax.Array, p1: float, p2: float) -> jax.Array:
    """DP aggregation along axis 1 of (B,L,N,D): scan over L, vectorized over
    (B,N,D)."""

    def step(prev, cur):
        prev_min = jnp.min(prev, axis=-1, keepdims=True)
        cand = jnp.stack(
            [
                prev,
                jnp.roll(prev, 1, axis=-1).at[..., 0].set(jnp.inf) + p1,
                jnp.roll(prev, -1, axis=-1).at[..., -1].set(jnp.inf) + p1,
                jnp.broadcast_to(prev_min + p2, prev.shape),
            ],
            axis=0,
        )
        out = cur + jnp.min(cand, axis=0) - prev_min
        return out, out

    init = cost[:, 0]
    _, agg = lax.scan(step, init, jnp.moveaxis(cost[:, 1:], 1, 0))
    return jnp.concatenate([init[:, None], jnp.moveaxis(agg, 0, 1)], axis=1)


def sgm_disparity(
    left_gray: jax.Array,
    right_gray: jax.Array,
    max_disp: int = 64,
    p1: float = 2.0,
    p2: float = 32.0,
) -> jax.Array:
    """(B,H,W) grayscale in [0,1] -> (B,H,W) disparity via 4-path SGM."""
    cost = matching_cost(left_gray, right_gray, max_disp)  # (B,H,W,D)

    agg = _dp_sweep(jnp.swapaxes(cost, 1, 2), p1, p2)  # left->right along W
    total = jnp.swapaxes(agg, 1, 2)
    agg = _dp_sweep(jnp.swapaxes(cost[:, :, ::-1], 1, 2), p1, p2)
    total = total + jnp.swapaxes(agg, 1, 2)[:, :, ::-1]
    total = total + _dp_sweep(cost, p1, p2)  # top->bottom along H
    total = total + _dp_sweep(cost[:, ::-1], p1, p2)[:, ::-1]

    return jnp.argmin(total, axis=-1).astype(jnp.float32)
