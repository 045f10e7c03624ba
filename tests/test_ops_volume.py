"""Oracle tests for cost-volume ops against independent torch/numpy
implementations of the reference math (reference utils/utils.py, corr.py)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stereoanywhere_tpu.ops import (
    all_pairs_correlation,
    generate_masks,
    estimate_left_disparity,
    estimate_right_disparity,
    estimate_left_confidence,
    estimate_right_confidence,
    truncate_corr_volume,
    gauss_corr_volume,
    handcrafted_mirror_detector,
)
from stereoanywhere_tpu.ops.volume import apply_bin_masks


def torch_corr(fl, fr):
    # reference corr.py:117-132 (BCHW)
    d = fl.shape[1]
    corr = torch.einsum("aijk,aijh->ajkh", fl, fr)
    return corr / torch.sqrt(torch.tensor(float(d)))


def test_all_pairs_correlation(rng):
    fl = rng.standard_normal((2, 5, 7, 16)).astype(np.float32)
    fr = rng.standard_normal((2, 5, 9, 16)).astype(np.float32)
    ours = np.asarray(all_pairs_correlation(jnp.asarray(fl), jnp.asarray(fr)))
    ref = torch_corr(
        torch.from_numpy(fl).permute(0, 3, 1, 2), torch.from_numpy(fr).permute(0, 3, 1, 2)
    ).numpy()  # (B,H,W2,W3)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_generate_masks(rng):
    mde = rng.uniform(0, 1, (2, 6, 8, 1)).astype(np.float32)
    n = 8
    ours = np.asarray(generate_masks(jnp.asarray(mde), n))  # (B,H,W,N)
    # reference utils/utils.py:48-54
    ref = np.zeros((2, 6, 8, n), np.float32)
    for i in range(n):
        ref[..., i] = ((mde[..., 0] < (i + 1) / n) & (mde[..., 0] >= i / n)).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)
    # bins partition [0,1)
    np.testing.assert_array_equal(ours.sum(-1), np.ones((2, 6, 8), np.float32))


def test_apply_bin_masks(rng):
    vol = rng.standard_normal((1, 3, 5, 6)).astype(np.float32)
    lm = rng.uniform(0, 1, (1, 3, 5, 4)).astype(np.float32)
    rm = rng.uniform(0, 1, (1, 3, 6, 4)).astype(np.float32)
    ours = np.asarray(apply_bin_masks(jnp.asarray(vol), jnp.asarray(lm), jnp.asarray(rm)))
    ref = vol[..., None] * lm[:, :, :, None, :] * rm[:, :, None, :, :]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def torch_left_disparity(vol_bhwv):
    # reference utils/utils.py:112-131 on (B,1,H,W2,W3)
    v = torch.from_numpy(vol_bhwv)
    B, H, W2, W3 = v.shape
    disp_values = torch.arange(0, W3, dtype=v.dtype).view(1, 1, 1, -1)
    prob = F.softmax(v, dim=3)
    prob = torch.sum(prob * disp_values, 3)
    xs = torch.arange(0, W2, dtype=v.dtype).view(1, 1, -1)
    return (xs - prob).numpy()


def torch_right_disparity(vol_bhwv):
    v = torch.from_numpy(vol_bhwv)
    B, H, W2, W3 = v.shape
    disp_values = torch.arange(0, W2, dtype=v.dtype).view(1, 1, -1, 1)
    prob = F.softmax(v, dim=2)
    prob = torch.sum(prob * disp_values, 2)
    xs = torch.arange(0, W3, dtype=v.dtype).view(1, 1, -1)
    return (prob - xs).numpy()


def test_soft_argmax_disparities(rng):
    vol = rng.standard_normal((2, 4, 7, 7)).astype(np.float32) * 3
    ours_l = np.asarray(estimate_left_disparity(jnp.asarray(vol)))[..., 0]
    ours_r = np.asarray(estimate_right_disparity(jnp.asarray(vol)))[..., 0]
    np.testing.assert_allclose(ours_l, torch_left_disparity(vol), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours_r, torch_right_disparity(vol), rtol=1e-5, atol=1e-5)


def test_soft_argmax_peak_recovery():
    # A sharply peaked volume at disparity d must regress ~d.
    w = 32
    d_true = 5.0
    xs = np.arange(w, dtype=np.float32)
    vol = np.zeros((1, 2, w, w), np.float32)
    for x2 in range(w):
        vol[0, :, x2] = 50 * np.exp(-0.5 * (xs - (x2 - d_true)) ** 2)
    disp = np.asarray(estimate_left_disparity(jnp.asarray(vol)))[0, 0, :, 0]
    # Interior pixels (peak not clipped by the volume edge)
    np.testing.assert_allclose(disp[8 : w - 2], d_true, atol=0.05)


def test_entropy_confidence(rng):
    vol = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    v = torch.from_numpy(vol)
    prob = F.softmax(v, dim=3)
    ent = -torch.sum(prob * torch.log2(prob + 1e-6), dim=3) / np.log2(vol.shape[3])
    ref_l = (1 - ent).numpy()
    ours_l = np.asarray(estimate_left_confidence(jnp.asarray(vol)))[..., 0]
    np.testing.assert_allclose(ours_l, ref_l, rtol=1e-3, atol=1e-4)

    prob = F.softmax(v, dim=2)
    ent = -torch.sum(prob * torch.log2(prob + 1e-6), dim=2) / np.log2(vol.shape[2])
    ref_r = (1 - ent).numpy()
    ours_r = np.asarray(estimate_right_confidence(jnp.asarray(vol)))[..., 0]
    np.testing.assert_allclose(ours_r, ref_r, rtol=1e-3, atol=1e-4)


def test_truncate_corr_volume(rng):
    # reference utils/utils.py:216-238
    b, h, w = 1, 3, 10
    disp = rng.uniform(0, 5, (b, h, w, 1)).astype(np.float32)
    conf = rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32)
    att = 0.9
    ours = np.asarray(truncate_corr_volume(jnp.asarray(disp), jnp.asarray(conf), None, att))

    xs = np.arange(w, dtype=np.float32)
    center = xs[None, None, :, None] - disp  # (B,H,W2,1)
    ramp = center - xs[None, None, None, :]
    sig = 1 / (1 + np.exp(-ramp))
    ref = 1 * (1 - conf) + conf * (sig * (1 - att) + att)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # Behavior: with conf=1, far-behind cells (x3 << x2-d) keep mask ~1,
    # cells just in front (x3 > x2-d) are attenuated toward att.
    ones = np.ones_like(conf)
    m = np.asarray(truncate_corr_volume(jnp.asarray(disp), jnp.asarray(ones), None, att))
    x2 = 8
    d = disp[0, 0, x2, 0]
    assert m[0, 0, x2, max(int(x2 - d) - 4, 0)] > 0.95
    assert abs(m[0, 0, x2, min(int(x2 - d) + 4, w - 1)] - att) < 0.05


def test_gauss_corr_volume(rng):
    disp = rng.uniform(0, 4, (1, 3, 8, 1)).astype(np.float32)
    k = 7.5
    ours = np.asarray(gauss_corr_volume(jnp.asarray(disp), k))
    xs = np.arange(8, dtype=np.float32)
    center = xs[None, None, :, None] - disp
    delta = center - xs[None, None, None, :]
    ref = k * np.exp(-(delta**2) / 2.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_mirror_detector_matches_reference_formula(rng):
    shape = (2, 4, 5, 1)
    sd = rng.uniform(0, 10, shape).astype(np.float32)
    md = rng.uniform(0, 10, shape).astype(np.float32)
    sc = rng.uniform(0, 1, shape).astype(np.float32)
    mc = rng.uniform(0, 1, shape).astype(np.float32)
    ours = np.asarray(
        handcrafted_mirror_detector(*(jnp.asarray(a) for a in (sd, md, sc, mc)), conf_th=0.98)
    )

    def sig(x):
        return 1 / (1 + np.exp(-x))

    both = sc * mc
    near = sig(20 * (md - sd))
    a = both * near
    b = (1 - sc) * mc
    better = a + b - a * b
    ref = sig(20 * (better - 0.98))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
