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


def _masked_quantile(v: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """torch.quantile semantics (linear interpolation between order
    statistics) over the masked subset, per batch row.  v, mask: (B, N)."""
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    s = jnp.sort(jnp.where(mask, v, big), axis=1)
    n = jnp.sum(mask, axis=1).astype(jnp.float32)  # (B,)
    pos = q * (n - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = (pos - lo.astype(jnp.float32)).astype(v.dtype)
    vlo = jnp.take_along_axis(s, lo[:, None], axis=1)[:, 0]
    vhi = jnp.take_along_axis(s, hi[:, None], axis=1)[:, 0]
    # n == 0 would clamp the gather to index 0 and return the finfo.max
    # filler — a plausible-looking garbage value.  The torch reference
    # raises on the empty tensor; fail loudly with NaN instead.
    return jnp.where(n > 0, vlo * (1 - frac) + vhi * frac, jnp.nan)


def _masked_median_torch(v: jax.Array, mask: jax.Array) -> jax.Array:
    """torch.median semantics: the LOWER middle order statistic (not the
    mean of the two central elements for even counts)."""
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    s = jnp.sort(jnp.where(mask, v, big), axis=1)
    n = jnp.sum(mask, axis=1)
    idx = (n - 1) // 2
    med = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
    # empty mask: fail loudly (see _masked_quantile)
    return jnp.where(n > 0, med, jnp.nan)


def naive_scale_shift(
    mde: jax.Array,
    disp: jax.Array,
    conf: jax.Array,
    conf_th: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Quantile-anchored scale/shift (reference utils/utils.py:386-410):
    scale = (q90(disp) - median(disp)) / (q90(mde) - median(mde)) over the
    conf>th subset, shift = median(disp) - scale*median(mde).

    The reference's per-sample Python loop with boolean indexing becomes a
    batched masked sort — jittable, static shapes.  torch.quantile's linear
    rank interpolation and torch.median's lower-middle convention are both
    reproduced exactly.  Returns (scale, shift) shaped (B,1,1,1).
    """
    b = mde.shape[0]
    m = mde.reshape(b, -1).astype(jnp.float32)
    d = disp.reshape(b, -1).astype(jnp.float32)
    c = conf.reshape(b, -1).astype(jnp.float32)
    mask = c > conf_th

    m90 = _masked_quantile(m, mask, 0.9)
    mmed = _masked_median_torch(m, mask)
    d90 = _masked_quantile(d, mask, 0.9)
    dmed = _masked_median_torch(d, mask)

    scale = (d90 - dmed) / (m90 - mmed)
    shift = dmed - scale * mmed
    return (
        scale.reshape(b, 1, 1, 1).astype(mde.dtype),
        shift.reshape(b, 1, 1, 1).astype(mde.dtype),
    )
