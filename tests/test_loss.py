"""Oracle test for the composed training loss (reference train.py:281-379).

The oracle below re-derives every term with numpy boolean-index means (the
reference's `tensor[mask].mean()` idiom), independently of the jittable
masked-mean/where formulation in train/loss.py.  Sub-op parity
(estimate_normals, normalize) is covered by tests/test_ops_geometry.py; here
we verify the TERM STRUCTURE: gamma adjustment, border masks, full-frame
scaler term, normal-loss gains, confidence BCE targets, right-view gating.
"""
import math

import numpy as np

import jax.numpy as jnp

from stereoanywhere_tpu.config import TrainConfig
from stereoanywhere_tpu.ops.geometry import estimate_normals, joint_minmax_normalize
from stereoanywhere_tpu.train.loss import stereoanywhere_loss


def _normals(x, w_over_gain):
    return np.asarray(estimate_normals(jnp.asarray(x), w_over_gain))


def _normal_term(disp, normals_ref, sel):
    n = _normals(np.asarray(joint_minmax_normalize([jnp.asarray(disp)])[0]), disp.shape[2] / 10.0)
    corr = np.sum(n * normals_ref, axis=-1, keepdims=True)
    return (1.0 - corr)[sel].mean()


def _bce(conf, disp, gt, sel, th):
    err = np.abs(disp - gt)
    target = np.clip(np.log1p(np.exp(th - err)) / math.log(1 + math.exp(th)), 0, 1)
    a = np.clip(conf, 1e-6, 1 - 1e-6)
    bce = -(target * np.log(a) + (1 - target) * np.log(1 - a))
    return bce[sel].mean()


def test_loss_matches_numpy_oracle():
    rng = np.random.default_rng(5)
    cfg = TrainConfig()
    assert cfg.use_border_mask and cfg.use_normal_loss_on_coarse
    iters, b, h, w = 3, 2, 16, 24

    def field(lo, hi, c=1, n=b):
        return rng.uniform(lo, hi, (n, h, w, c)).astype(np.float32)

    outputs = {
        "disparities": rng.uniform(0, 20, (iters, b, h, w, 1)).astype(np.float32),
        "coarse_dispmono2": field(0, 20),
        "coarse_dispmono3": field(0, 20),
        "coarse_scaled_mde2": field(0, 20),
        "coarse_scaled_mde3": field(0, 20),
        "coarse_conf2": field(0.05, 0.95),
        "coarse_conf3": field(0.05, 0.95),
    }
    gt = field(0, 30)
    validgt = (rng.uniform(0, 1, (b, h, w, 1)) > 0.3).astype(np.float32)
    gt_right = field(0, 30)
    validgt_right = (rng.uniform(0, 1, (b, h, w, 1)) > 0.3).astype(np.float32)
    mono2 = field(0.05, 0.95)
    mono3 = field(0.05, 0.95)

    total, logs = stereoanywhere_loss(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        jnp.asarray(gt), jnp.asarray(validgt),
        jnp.asarray(gt_right), jnp.asarray(validgt_right),
        jnp.asarray(mono2), jnp.asarray(mono3), cfg,
    )
    total = float(total)

    # ---- numpy oracle ----------------------------------------------------
    mask = (validgt > 0) & (gt < cfg.max_disp)
    mask_r = (validgt_right > 0) & (gt_right < cfg.max_disp)
    xx = np.arange(w, dtype=np.float32)[None, None, :, None]
    border_l = xx - gt >= 0
    border_r = xx + gt_right < w

    adj = cfg.gamma ** (15.0 / (iters - 1))
    want = 0.0
    for i in range(iters):
        wgt = adj ** (iters - i - 1)
        want += wgt * np.abs(outputs["disparities"][i] - gt)[mask].mean()

    n2 = _normals(mono2, w / 10.0)
    n3 = _normals(mono3, w / 10.0)
    th = cfg.lrc_th

    # left coarse: mono (border), scaled (full frame), normal on mono, conf bce
    want += np.abs(outputs["coarse_dispmono2"] - gt)[mask & border_l].mean()
    want += np.abs(outputs["coarse_scaled_mde2"] - gt)[mask].mean()
    want += cfg.normal_loss_gain * _normal_term(outputs["coarse_dispmono2"], n2, mask & border_l)
    want += _bce(outputs["coarse_conf2"], outputs["coarse_dispmono2"], gt, mask, th)
    # right coarse (validgt_right nonzero -> gated in)
    want += np.abs(outputs["coarse_dispmono3"] - gt_right)[mask_r & border_r].mean()
    want += np.abs(outputs["coarse_scaled_mde3"] - gt_right)[mask_r].mean()
    want += cfg.normal_loss_gain * _normal_term(outputs["coarse_dispmono3"], n3, mask_r & border_r)
    want += _bce(outputs["coarse_conf3"], outputs["coarse_dispmono3"], gt_right, mask_r, th)

    np.testing.assert_allclose(total, want, rtol=2e-4)


def test_loss_right_view_gated_out():
    """validgt_right all-zero must drop every right-view term."""
    rng = np.random.default_rng(6)
    cfg = TrainConfig()
    iters, b, h, w = 2, 1, 8, 16

    def field(lo, hi):
        return rng.uniform(lo, hi, (b, h, w, 1)).astype(np.float32)

    outputs = {
        "disparities": rng.uniform(0, 10, (iters, b, h, w, 1)).astype(np.float32),
        "coarse_dispmono2": field(0, 10),
        "coarse_dispmono3": field(0, 10),
        "coarse_scaled_mde2": field(0, 10),
        "coarse_scaled_mde3": field(0, 10),
        "coarse_conf2": field(0.1, 0.9),
        "coarse_conf3": field(0.1, 0.9),
    }
    args = dict(
        gt=jnp.asarray(field(0, 10)),
        validgt=jnp.ones((b, h, w, 1), jnp.float32),
        mono2=jnp.asarray(field(0.05, 0.95)),
        mono3=jnp.asarray(field(0.05, 0.95)),
    )
    joutputs = {k: jnp.asarray(v) for k, v in outputs.items()}
    total_no_r, logs = stereoanywhere_loss(
        joutputs, args["gt"], args["validgt"],
        jnp.asarray(field(0, 10)), jnp.zeros((b, h, w, 1), jnp.float32),
        args["mono2"], args["mono3"], cfg,
    )
    expect = float(logs["loss/iterative"] + logs["loss/coarse_left"]) + float(
        stereoanywhere_loss(
            joutputs, args["gt"], args["validgt"],
            jnp.asarray(field(0, 10)), jnp.zeros((b, h, w, 1), jnp.float32),
            args["mono2"], args["mono3"], cfg,
        )[1]["loss/conf"]
    )
    # conf log includes the (gated-out) right bce; total must not
    assert float(total_no_r) < expect + 1e-6


def test_loss_variant_terms():
    """use_normal_loss (iterative), per-iteration confidences, and the
    coarse-stereo term must each add a finite positive contribution."""
    rng = np.random.default_rng(7)
    iters, b, h, w = 2, 1, 8, 16

    def field(lo, hi):
        return rng.uniform(lo, hi, (b, h, w, 1)).astype(np.float32)

    outputs = {
        "disparities": rng.uniform(0, 10, (iters, b, h, w, 1)).astype(np.float32),
        "confidences": rng.uniform(0.1, 0.9, (iters, b, h, w, 1)).astype(np.float32),
        "coarse_dispstereo2": field(0, 10),
        "coarse_dispstereo3": field(0, 10),
        "coarse_dispmono2": field(0, 10),
        "coarse_dispmono3": field(0, 10),
        "coarse_scaled_mde2": field(0, 10),
        "coarse_scaled_mde3": field(0, 10),
        "coarse_conf2": field(0.1, 0.9),
        "coarse_conf3": field(0.1, 0.9),
    }
    common = dict(
        gt=jnp.asarray(field(0, 10)),
        validgt=jnp.ones((b, h, w, 1), jnp.float32),
        gt_right=jnp.asarray(field(0, 10)),
        validgt_right=jnp.ones((b, h, w, 1), jnp.float32),
        mono2=jnp.asarray(field(0.05, 0.95)),
        mono3=jnp.asarray(field(0.05, 0.95)),
    )
    joutputs = {k: jnp.asarray(v) for k, v in outputs.items()}
    base_out = {k: v for k, v in joutputs.items()
                if k not in ("confidences", "coarse_dispstereo2", "coarse_dispstereo3")}

    cfg0 = TrainConfig()
    t_base, _ = stereoanywhere_loss(base_out, *common.values(), cfg0)
    t_var, logs = stereoanywhere_loss(joutputs, *common.values(), TrainConfig(use_normal_loss=True))
    assert float(t_var) > float(t_base)
    assert np.isfinite(float(logs["loss/iter_normal"]))
    assert np.isfinite(float(logs["loss/iter_conf"]))
