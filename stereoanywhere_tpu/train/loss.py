"""Training loss stack (reference train.py:281-379), jittable.

All selections are expressed as masked means (static shapes); NaN guards
become `where` clauses.  Sign convention: model outputs and gt are both
POSITIVE disparity here (the reference compares negative flow to -gt,
train.py:298 — identical math).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.config import TrainConfig
from stereoanywhere_tpu.ops.geometry import estimate_normals, joint_minmax_normalize


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    denom = jnp.maximum(m.sum(), 1.0)
    return (x * m).sum() / denom


def correlation_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-pixel dot product of normal maps (reference utils/utils.py:285-293)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _normal_loss(disp: jax.Array, normals_ref: jax.Array, mask: jax.Array, normal_gain: float) -> jax.Array:
    n = estimate_normals(joint_minmax_normalize([disp])[0], disp.shape[2] / normal_gain)
    return masked_mean(1.0 - correlation_score(n, normals_ref), mask)


def stereoanywhere_loss(
    outputs: dict[str, Any],
    gt: jax.Array,
    validgt: jax.Array,
    gt_right: jax.Array,
    validgt_right: jax.Array,
    mono2: jax.Array,
    mono3: jax.Array,
    cfg: TrainConfig,
    max_disp: float = 256.0,
    normal_gain: float = 10.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Full loss: iterative L1 (gamma-weighted) + coarse L1 terms with border
    masks + optional coarse normal-correlation losses.

    outputs: dict from StereoAnywhere(train mode): 'disparities' (I,B,H,W,1),
    coarse_dispmono2/3, coarse_scaled_mde2/3 (B,H,W,1).
    gt/gt_right: positive disparity (B,H,W,1); validgt*: {0,1}.
    """
    logs = {}
    preds = outputs["disparities"]
    n_pred = preds.shape[0]
    mask = (validgt > 0) & (gt < max_disp)

    # iterative L1 with adjusted gamma (reference train.py:290-299)
    adj_gamma = cfg.gamma ** (15.0 / max(n_pred - 1, 1))
    weights = adj_gamma ** jnp.arange(n_pred - 1, -1, -1, dtype=jnp.float32)
    per_iter = jax.vmap(lambda p: masked_mean(jnp.abs(p - gt), mask))(preds)
    loss = jnp.sum(weights * per_iter)
    logs["loss/iterative"] = loss
    logs["epe/final"] = per_iter[-1]

    # border masks (reference train.py:319-321,349-350)
    w = gt.shape[2]
    xx = jnp.arange(w, dtype=gt.dtype)[None, None, :, None]
    left_border = (xx - gt >= 0) if cfg.use_border_mask else jnp.ones_like(gt, bool)
    right_border = (xx + gt_right < w) if cfg.use_border_mask else jnp.ones_like(gt, bool)
    mask_right = (validgt_right > 0) & (gt_right < max_disp)

    normals2 = estimate_normals(mono2, mono2.shape[2] / normal_gain)
    normals3 = estimate_normals(mono3, mono3.shape[2] / normal_gain)

    def coarse_terms(disp_list, gt_, mask_, border, normals_ref):
        total = 0.0
        # disp_list = [mono coarse, scaled mde]; index 1 ('the scaler') is
        # trained full-frame (reference train.py:325-330 i==2 case)
        d_mono, d_scaled = disp_list
        l_mono = masked_mean(jnp.abs(d_mono - gt_), mask_ & border)
        l_scaled = masked_mean(jnp.abs(d_scaled - gt_), mask_)
        total = l_mono + l_scaled
        if cfg.use_normal_loss_on_coarse:
            total = total + cfg.normal_loss_gain * _normal_loss(d_mono, normals_ref, mask_ & border, normal_gain)
        return total

    coarse_left = coarse_terms(
        [outputs["coarse_dispmono2"], outputs["coarse_scaled_mde2"]],
        gt, mask, left_border, normals2,
    )
    coarse_right = coarse_terms(
        [outputs["coarse_dispmono3"], outputs["coarse_scaled_mde3"]],
        gt_right, mask_right, right_border, normals3,
    )
    # Right-view terms only contribute when right gt exists at all.
    has_right = (validgt_right.sum() > 0).astype(loss.dtype)
    logs["loss/coarse_left"] = coarse_left
    logs["loss/coarse_right"] = coarse_right

    # coarse mono confidence BCE (reference train.py:340-347): target
    # softplus(th - err)/log(1+e^th), clipped to [0,1].
    th = 1.0
    div_const = math.log(1 + math.exp(th))

    def conf_bce(conf, disp, gt_, mask_):
        err = jnp.abs(disp - gt_)
        target = jax.lax.stop_gradient(jax.nn.softplus(th - err) / div_const)
        a = jnp.clip(conf, 1e-6, 1 - 1e-6)
        t = jnp.clip(target, 0.0, 1.0)
        bce = -(t * jnp.log(a) + (1 - t) * jnp.log(1 - a))
        return masked_mean(bce, mask_)

    conf_left = conf_bce(outputs["coarse_conf2"], outputs["coarse_dispmono2"], gt, mask)
    conf_right = conf_bce(outputs["coarse_conf3"], outputs["coarse_dispmono3"], gt_right, mask_right)
    logs["loss/conf"] = conf_left + conf_right

    total = loss + coarse_left + conf_left + has_right * (coarse_right + conf_right)
    total = jnp.where(jnp.isfinite(total), total, 0.0)
    logs["loss/total"] = total
    return total, logs
