"""Auxiliary losses and classical utilities from the reference inventory.

Jax twins of reference losses.py:9-197 (SSIM/CSIM, smoothness, photometric,
self-supervised, triplet, sparsity — present in the reference but unused by
its train.py) plus SiLogLoss and affine-invariant MAE (losses.py:345-410) and
the RANSAC scale/shift recovery (reference utils.py:28-87).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# similarity


def _avg_pool3(x):
    from stereoanywhere_tpu.ops.interp import avg_pool2d

    return avg_pool2d(x, 3, 1, 1)


def ssim(x: jax.Array, y: jax.Array, c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jax.Array:
    """Window-3 SSIM distance (reference losses.py:9-34): (1 - SSIM)/2."""
    mu_x, mu_y = _avg_pool3(x), _avg_pool3(y)
    sig_x = _avg_pool3(x * x) - mu_x ** 2
    sig_y = _avg_pool3(y * y) - mu_y ** 2
    sig_xy = _avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sig_x + sig_y + c2)
    return jnp.clip((1 - n / d) / 2, 0, 1)


def csim(x: jax.Array, y: jax.Array, k1: float = 0.25, k2: float = 1.0) -> jax.Array:
    """Window-3 CSIM distance (reference losses.py:35-62): the contrast/
    structure dissimilarity K1*(mu_x-mu_y)^2 + K2*(sig_x+sig_y-2*sig_xy),
    mapped through the same (1-v)/2 clamp as SSIM."""
    mu_x, mu_y = _avg_pool3(x), _avg_pool3(y)
    sig_x = _avg_pool3(x * x) - mu_x ** 2
    sig_y = _avg_pool3(y * y) - mu_y ** 2
    sig_xy = _avg_pool3(x * y) - mu_x * mu_y
    v = k1 * (mu_x ** 2 + mu_y ** 2 - 2 * mu_x * mu_y) + k2 * (sig_x + sig_y - 2 * sig_xy)
    return jnp.clip((1 - v) / 2, 0, 1)


def photometric_loss(img, img_warped, alpha: float = 0.85):
    """alpha*SSIM + (1-alpha)*L1 (reference photometric losses region)."""
    return alpha * ssim(img, img_warped).mean() + (1 - alpha) * jnp.abs(img - img_warped).mean()


def smoothness_loss(disp, img):
    """Edge-aware first-order smoothness (reference losses.py:86-? family)."""
    dx_d = jnp.abs(disp[:, :, 1:] - disp[:, :, :-1])
    dy_d = jnp.abs(disp[:, 1:] - disp[:, :-1])
    dx_i = jnp.mean(jnp.abs(img[:, :, 1:] - img[:, :, :-1]), -1, keepdims=True)
    dy_i = jnp.mean(jnp.abs(img[:, 1:] - img[:, :-1]), -1, keepdims=True)
    return (dx_d * jnp.exp(-dx_i)).mean() + (dy_d * jnp.exp(-dy_i)).mean()


def self_supervised_loss(im_left, im_right, disp_left):
    """Warp right->left with the predicted disparity and score photometric
    consistency (reference self-supervised loss family)."""
    from stereoanywhere_tpu.ops.geometry import disp_warping

    warped = disp_warping(jax.nn.relu(disp_left), im_right, right_disp=False)
    return photometric_loss(im_left, warped)


def triplet_photometric_loss(im_left, im_right, disp_left, margin: float = 0.05):
    """Warped-right must beat unwarped-right by `margin` (triplet form)."""
    from stereoanywhere_tpu.ops.geometry import disp_warping

    warped = disp_warping(jax.nn.relu(disp_left), im_right, right_disp=False)
    pos = jnp.abs(im_left - warped).mean()
    neg = jnp.abs(im_left - im_right).mean()
    return jax.nn.relu(pos - neg + margin)


def sparsity_loss(conf):
    """Encourage confident (sparse-uncertainty) maps."""
    return (1.0 - conf).mean()


def total_variation_loss(img, weight: float = 1.0):
    """reference losses.py:193-197."""
    tv_h = jnp.sum((img[:, 1:] - img[:, :-1]) ** 2)
    tv_w = jnp.sum((img[:, :, 1:] - img[:, :, :-1]) ** 2)
    return weight * (tv_h + tv_w) / np.prod(img.shape)


# ---------------------------------------------------------------------------
# depth losses


def silog_loss(pred, target, valid, lambd: float = 0.5):
    """Scale-invariant log loss (reference SiLogLoss, losses.py:345-356)."""
    m = valid.astype(pred.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    diff = (jnp.log(jnp.maximum(target, 1e-6)) - jnp.log(jnp.maximum(pred, 1e-6))) * m
    mean = diff.sum() / n
    mean_sq = (diff ** 2).sum() / n
    return jnp.sqrt(jnp.maximum(mean_sq - lambd * mean ** 2, 0.0))


def affine_invariant_mae(pred, target, valid, eps: float = 1e-6):
    """Median/MAD-normalized MAE (reference AffineInvariantV2MAELoss,
    losses.py:386-410), with masked median via sorting."""
    m = valid > 0

    def norm(x):
        vals = jnp.where(m, x, jnp.nan)
        t = jnp.nanmedian(vals)
        s = jnp.nanmean(jnp.abs(vals - t))
        return (x - t) / jnp.maximum(s, eps)

    diff = jnp.abs(norm(pred) - norm(target))
    return jnp.where(m, diff, 0.0).sum() / jnp.maximum(m.sum(), 1)


# ---------------------------------------------------------------------------
# robust scale/shift (RANSAC)


def ransac_scale_shift(
    mde: np.ndarray,
    disp: np.ndarray,
    valid: np.ndarray,
    iters: int = 100,
    threshold: float = 2.0,
    seed: int = 0,
) -> tuple[float, float]:
    """RANSAC fit of disp ~= scale*mde + shift over valid pixels
    (reference utils.py:28-87).  Host-side numpy (not on the model path)."""
    rng = np.random.default_rng(seed)
    m = mde[valid > 0].ravel()
    d = disp[valid > 0].ravel()
    if m.size < 2:
        return 1.0, 0.0
    best_inliers = -1
    best = (1.0, 0.0)
    for _ in range(iters):
        i, j = rng.integers(0, m.size, 2)
        if abs(m[i] - m[j]) < 1e-9:
            continue
        s = (d[i] - d[j]) / (m[i] - m[j])
        t = d[i] - s * m[i]
        inl = np.abs(s * m + t - d) < threshold
        n = int(inl.sum())
        if n > best_inliers:
            best_inliers = n
            A = np.stack([m[inl], np.ones(n)], 1)
            sol, *_ = np.linalg.lstsq(A, d[inl], rcond=None)
            best = (float(sol[0]), float(sol[1]))
    return best
