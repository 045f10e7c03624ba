"""Scale/shift recovery: confidence-weighted least squares, fully batched.

The reference solves per-sample `torch.linalg.lstsq` in a Python loop with
boolean quantile masking (reference utils/utils.py:345-384) — host-sync-heavy
and unjittable.  Here the same weighted 2-unknown LSQ is solved in closed form
(2x2 normal equations) with the quantile trimming expressed as a soft {0,1}
weight, so everything stays on-device, static-shape, and batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_lsq(
    mde: jax.Array,
    disp: jax.Array,
    conf: jax.Array,
    min_quantile: float = 0.2,
    max_quantile: float = 0.9,
    extra_weight: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fit scale*|mde| + shift ~= |relu(disp)| weighted by conf.

    Inputs are NHWC-like with any channel count; statistics are per sample
    over all non-batch axes (the reference concatenates left+right along
    channels — reference stereoanywhere.py:191).  Returns (scale, shift) with
    shape (B,1,1,1).

    Matches reference utils/utils.py:345-384: disp=relu(disp); keep elements
    within [q20, q90] of disp; conf' = 0.9*conf + 0.1; minimize
    sum conf' * (scale*mde + shift - disp)^2.

    `extra_weight` (same shape, in {0,1}) optionally zero-weights pixels in
    the normal equations.  NOTE: the quantile trim thresholds are computed
    over the FULL tensor before extra_weight applies — callers that need
    excluded pixels out of the trim statistics too must mask `disp` first.
    """
    b = mde.shape[0]
    m = jnp.abs(mde.reshape(b, -1).astype(jnp.float32))
    d = jax.nn.relu(disp.reshape(b, -1).astype(jnp.float32))
    c = jnp.abs(conf.reshape(b, -1).astype(jnp.float32))

    lo = jnp.quantile(d, min_quantile, axis=1, keepdims=True)
    hi = jnp.quantile(d, max_quantile, axis=1, keepdims=True)
    keep = ((d >= lo) & (d <= hi)).astype(jnp.float32)
    if extra_weight is not None:
        keep = keep * extra_weight.reshape(b, -1).astype(jnp.float32)

    w = (c * 0.9 + 0.1) * keep  # squared weights of the reference's sqrt-weighted lstsq

    a00 = jnp.sum(w * m * m, axis=1)
    a01 = jnp.sum(w * m, axis=1)
    a11 = jnp.sum(w, axis=1)
    b0 = jnp.sum(w * m * d, axis=1)
    b1 = jnp.sum(w * d, axis=1)

    det = a00 * a11 - a01 * a01
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    scale = jnp.where(jnp.abs(det) > 1e-12, (a11 * b0 - a01 * b1) / safe, 0.0)
    shift = jnp.where(jnp.abs(det) > 1e-12, (a00 * b1 - a01 * b0) / safe, 0.0)
    return scale.reshape(b, 1, 1, 1).astype(mde.dtype), shift.reshape(b, 1, 1, 1).astype(mde.dtype)


def normalized_scale_and_shift(
    prediction: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    min_quantile: float = 0.2,
    max_quantile: float = 0.9,
) -> tuple[jax.Array, jax.Array]:
    """Unweighted closed-form variant (reference utils/utils.py:295-343).

    Note the reference computes the quantiles over the WHOLE batch tensor
    (torch.quantile without dim); we keep that quirk.
    """
    b = prediction.shape[0]
    p = prediction.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    m = mask.reshape(b, -1).astype(jnp.float32)

    if min_quantile > 0.0 or max_quantile < 1.0:
        lo = jnp.quantile(t, min_quantile)
        hi = jnp.quantile(t, max_quantile)
        m = m * ((t >= lo) & (t <= hi)).astype(jnp.float32)

    a00 = jnp.sum(m * p * p, axis=1)
    a01 = jnp.sum(m * p, axis=1)
    a11 = jnp.sum(m, axis=1)
    b0 = jnp.sum(m * p * t, axis=1)
    b1 = jnp.sum(m * t, axis=1)

    det = a00 * a11 - a01 * a01
    safe = jnp.where(det != 0, det, 1.0)
    scale = jnp.where(det != 0, (a11 * b0 - a01 * b1) / safe, 0.0)
    shift = jnp.where(det != 0, (-a01 * b0 + a00 * b1) / safe, 0.0)
    return scale.reshape(b, 1, 1, 1), shift.reshape(b, 1, 1, 1)
