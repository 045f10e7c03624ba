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
    max_disp: float | None = None,
    normal_gain: float = 10.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Full loss: iterative L1 (gamma-weighted), optional per-iteration normal
    and confidence terms, coarse L1 terms with border masks, optional coarse
    normal-correlation losses, coarse confidence BCE.

    outputs: dict from StereoAnywhere(train mode): 'disparities' (I,B,H,W,1),
    coarse_dispmono2/3, coarse_scaled_mde2/3 (B,H,W,1); optionally
    'confidences' (I,B,H,W,1) from the predict-confidence variant and
    coarse_dispstereo2/3 when stereo aggregation is on.
    gt/gt_right: positive disparity (B,H,W,1); validgt*: {0,1}.
    """
    logs = {}
    if max_disp is None:
        max_disp = cfg.max_disp
    preds = outputs["disparities"]
    n_pred = preds.shape[0]
    mask = (validgt > 0) & (gt < max_disp)
    th = cfg.lrc_th
    div_const = math.log(1 + math.exp(th))

    def conf_bce(conf, disp, gt_, mask_):
        # BCE vs softplus(th - |err|)/log(1+e^th) target (train.py:340-347)
        err = jnp.abs(disp - gt_)
        target = jax.lax.stop_gradient(jax.nn.softplus(th - err) / div_const)
        a = jnp.clip(conf, 1e-6, 1 - 1e-6)
        t = jnp.clip(target, 0.0, 1.0)
        bce = -(t * jnp.log(a) + (1 - t) * jnp.log(1 - a))
        return masked_mean(bce, mask_)

    # iterative L1 with adjusted gamma (reference train.py:290-299)
    adj_gamma = cfg.gamma ** (15.0 / max(n_pred - 1, 1))
    weights = adj_gamma ** jnp.arange(n_pred - 1, -1, -1, dtype=jnp.float32)
    per_iter = jax.vmap(lambda p: masked_mean(jnp.abs(p - gt), mask))(preds)
    loss = jnp.sum(weights * per_iter)
    logs["loss/iterative"] = loss
    logs["epe/final"] = per_iter[-1]

    normals2_full = None
    if cfg.use_normal_loss:
        # per-iteration normal-correlation loss x10 (reference train.py:302-306)
        normals2_full = estimate_normals(mono2, mono2.shape[2] / normal_gain)

        def iter_normal(p):
            return _normal_loss(p, normals2_full, mask, normal_gain)

        iter_normals = jax.vmap(iter_normal)(preds)
        norm_term = 10.0 * jnp.sum(weights * iter_normals)
        loss = loss + norm_term
        logs["loss/iter_normal"] = norm_term

    if outputs.get("confidences") is not None:
        # predict-confidence variant (reference train.py:308-316).  NOTE the
        # reference builds this target from pred_disps[i]-gt WITHOUT the sign
        # flip it applies to the L1 term (train.py:309 vs :298) — a latent
        # sign bug in the unused path; we use the consistent |pred - gt|.
        confs = outputs["confidences"]

        def iter_conf(args_):
            c, p = args_
            return conf_bce(c, p, gt, mask)

        iter_confs = jax.vmap(iter_conf)((confs, preds))
        conf_term = jnp.sum(weights * iter_confs)
        loss = loss + conf_term
        logs["loss/iter_conf"] = conf_term

    # border masks (reference train.py:319-321,349-350)
    w = gt.shape[2]
    xx = jnp.arange(w, dtype=gt.dtype)[None, None, :, None]
    left_border = (xx - gt >= 0) if cfg.use_border_mask else jnp.ones_like(gt, bool)
    right_border = (xx + gt_right < w) if cfg.use_border_mask else jnp.ones_like(gt, bool)
    mask_right = (validgt_right > 0) & (gt_right < max_disp)

    normals2 = estimate_normals(mono2, mono2.shape[2] / normal_gain)
    normals3 = estimate_normals(mono3, mono3.shape[2] / normal_gain)

    def coarse_terms(disp_list, gt_, mask_, border, normals_ref):
        # disp_list = [stereo|None, mono coarse, scaled mde] mirroring the
        # reference's disps0/disps1 triples; the scaler (index 2) is trained
        # full-frame (reference train.py:325-330 i==2 case), the others under
        # the border mask with optional normal-correlation loss.
        d_stereo, d_mono, d_scaled = disp_list
        total = masked_mean(jnp.abs(d_mono - gt_), mask_ & border)
        total = total + masked_mean(jnp.abs(d_scaled - gt_), mask_)
        if cfg.use_normal_loss_on_coarse:
            total = total + cfg.normal_loss_gain * _normal_loss(d_mono, normals_ref, mask_ & border, normal_gain)
        if d_stereo is not None:  # use_aggregate_stereo_vol variant
            total = total + masked_mean(jnp.abs(d_stereo - gt_), mask_ & border)
            if cfg.use_normal_loss_on_coarse:
                total = total + cfg.normal_loss_gain * _normal_loss(
                    d_stereo, normals_ref, mask_ & border, normal_gain
                )
        return total

    coarse_left = coarse_terms(
        [outputs.get("coarse_dispstereo2"), outputs["coarse_dispmono2"],
         outputs["coarse_scaled_mde2"]],
        gt, mask, left_border, normals2,
    )
    coarse_right = coarse_terms(
        [outputs.get("coarse_dispstereo3"), outputs["coarse_dispmono3"],
         outputs["coarse_scaled_mde3"]],
        gt_right, mask_right, right_border, normals3,
    )
    # Right-view terms only contribute when right gt exists at all.
    has_right = (validgt_right.sum() > 0).astype(loss.dtype)
    logs["loss/coarse_left"] = coarse_left
    logs["loss/coarse_right"] = coarse_right

    # coarse mono confidence BCE (reference train.py:340-347)
    conf_left = conf_bce(outputs["coarse_conf2"], outputs["coarse_dispmono2"], gt, mask)
    conf_right = conf_bce(outputs["coarse_conf3"], outputs["coarse_dispmono3"], gt_right, mask_right)
    logs["loss/conf"] = conf_left + conf_right

    total = loss + coarse_left + conf_left + has_right * (coarse_right + conf_right)
    total = jnp.where(jnp.isfinite(total), total, 0.0)
    logs["loss/total"] = total
    return total, logs
