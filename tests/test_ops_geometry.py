"""Oracle tests for geometry ops (normalize, normals, warping, softlrc, lsq)."""
import math

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stereoanywhere_tpu.ops import (
    joint_minmax_normalize,
    estimate_normals,
    disp_warping,
    softlrc,
    weighted_lsq,
)
from stereoanywhere_tpu.ops.geometry import central_gradients
from stereoanywhere_tpu.ops.lsq import normalized_scale_and_shift


def test_joint_minmax_normalize(rng):
    a = rng.uniform(-3, 5, (2, 4, 6, 1)).astype(np.float32)
    b = rng.uniform(-1, 9, (2, 4, 6, 1)).astype(np.float32)
    na, nb = joint_minmax_normalize([jnp.asarray(a), jnp.asarray(b)])
    lo = np.minimum(a.min(axis=(1, 2, 3), keepdims=True), b.min(axis=(1, 2, 3), keepdims=True))
    hi = np.maximum(a.max(axis=(1, 2, 3), keepdims=True), b.max(axis=(1, 2, 3), keepdims=True))
    np.testing.assert_allclose(np.asarray(na), (a - lo) / (hi - lo + 1e-4), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nb), (b - lo) / (hi - lo + 1e-4), rtol=1e-5)


def test_joint_minmax_normalize_per_channel(rng):
    """Reference normalize keeps the channel axis: max_pool2d over (H,W) only
    (reference utils/utils.py:64-67) — each channel uses its own min/max."""
    a = rng.uniform(-3, 5, (2, 4, 6, 3)).astype(np.float32)
    a[..., 2] *= 100.0  # a channel with a wildly different range
    (na,) = joint_minmax_normalize([jnp.asarray(a)])
    lo = a.min(axis=(1, 2), keepdims=True)
    hi = a.max(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(np.asarray(na), (a - lo) / (hi - lo + 1e-4), rtol=1e-5)
    # every channel individually spans ~[0, 1]
    assert np.asarray(na).max(axis=(1, 2)).min() > 0.99


def test_central_gradients_replicate(rng):
    x = rng.standard_normal((1, 5, 6, 1)).astype(np.float32)
    gx, gy = central_gradients(jnp.asarray(x))
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    ref_gx = xp[:, 1:-1, 2:, :] - xp[:, 1:-1, :-2, :]
    ref_gy = xp[:, 2:, 1:-1, :] - xp[:, :-2, 1:-1, :]
    np.testing.assert_allclose(np.asarray(gx), ref_gx)
    np.testing.assert_allclose(np.asarray(gy), ref_gy)


def test_estimate_normals_unit_and_plane(rng):
    # A tilted plane depth(x) = a*x has normals with constant x component.
    h, w = 8, 10
    depth = (np.arange(w, dtype=np.float32)[None, None, :, None] * 0.1).repeat(h, axis=1)
    n = np.asarray(estimate_normals(jnp.asarray(depth), normal_gain=2.0))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    # interior: gx = 2*(0.1*2) = 0.4 -> n = normalize([-0.4, 0, 1])
    expect = np.array([-0.4, 0.0, 1.0])
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(n[0, 3, 4], expect, atol=1e-5)


def torch_disp_warping(disp, img, right_disp):
    # reference utils/utils.py:172-187 (BCHW)
    B, _, H, W = disp.shape
    ys, xs = torch.meshgrid(
        torch.arange(H, dtype=disp.dtype), torch.arange(W, dtype=disp.dtype), indexing="ij"
    )
    xs = xs[None].repeat(B, 1, 1)
    ys = ys[None].repeat(B, 1, 1)
    if right_disp:
        grid = 2 * torch.cat(
            [(xs + disp.squeeze(1)).unsqueeze(-1) / W, ys.unsqueeze(-1) / H], -1
        ) - 1
    else:
        grid = 2 * torch.cat(
            [(xs - disp.squeeze(1)).unsqueeze(-1) / W, ys.unsqueeze(-1) / H], -1
        ) - 1
    return F.grid_sample(img, grid, align_corners=True)


def test_disp_warping(rng):
    # w=9 exercises the gather fallback; w=48 the windowed-slab tent path
    for b, h, w, c in [(2, 6, 9, 3), (1, 7, 48, 2)]:
        _check_disp_warping(rng, b, h, w, c)


def _check_disp_warping(rng, b, h, w, c):
    disp = rng.uniform(-2, 4, (b, h, w, 1)).astype(np.float32)
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    for right in (False, True):
        ours = np.asarray(disp_warping(jnp.asarray(disp), jnp.asarray(img), right))
        ref = (
            torch_disp_warping(
                torch.from_numpy(disp).permute(0, 3, 1, 2),
                torch.from_numpy(img).permute(0, 3, 1, 2),
                right,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_softlrc(rng):
    b, h, w = 1, 5, 8
    d2 = rng.uniform(0, 3, (b, h, w, 1)).astype(np.float32)
    d3 = rng.uniform(0, 3, (b, h, w, 1)).astype(np.float32)
    s2, s3 = softlrc(jnp.asarray(d2), jnp.asarray(d3), lrc_th=1.0)

    # torch oracle (reference utils/utils.py:189-198)
    td2 = torch.from_numpy(d2).permute(0, 3, 1, 2)
    td3 = torch.from_numpy(d3).permute(0, 3, 1, 2)
    div_const = math.log(1 + math.exp(1.0))
    w2 = torch_disp_warping(F.relu(td3), td2, True)
    w3 = torch_disp_warping(F.relu(td2), td3, False)
    ref2 = (F.softplus(-torch.abs(td2 - w3) + 1.0) / div_const).permute(0, 2, 3, 1).numpy()
    ref3 = (F.softplus(-torch.abs(td3 - w2) + 1.0) / div_const).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(s2), ref2, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s3), ref3, rtol=1e-3, atol=1e-4)
    assert np.all(np.asarray(s2) > 0) and np.all(np.asarray(s2) < 1)


def torch_weighted_lsq(mde, disp, conf, min_q=0.2, max_q=0.9):
    # Faithful oracle of reference utils/utils.py:345-384
    B = mde.shape[0]
    mde = torch.from_numpy(mde).reshape(B, -1).float()
    disp = torch.from_numpy(disp).reshape(B, -1).float()
    conf = torch.from_numpy(conf).reshape(B, -1).float()
    disp = F.relu(disp)
    out = torch.zeros((B, 2))
    for b in range(B):
        s = disp[b]
        lo, hi = torch.quantile(s, min_q), torch.quantile(s, max_q)
        keep = (lo <= s) & (s <= hi)
        m = torch.abs(mde[b][keep])
        d = torch.abs(s[keep])
        c = torch.abs(conf[b][keep]) * 0.9 + 0.1
        wgt = torch.sqrt(c)
        A = torch.stack([m * wgt, wgt], -1)
        Bv = (d * wgt).unsqueeze(-1)
        out[b] = torch.linalg.lstsq(A, Bv)[0].squeeze(-1)
    return out[:, 0].numpy(), out[:, 1].numpy()


def test_weighted_lsq_matches_reference_loop(rng):
    b, h, w = 3, 12, 16
    scale_true, shift_true = 30.0, 4.0
    mde = rng.uniform(0, 1, (b, h, w, 2)).astype(np.float32)
    disp = scale_true * mde + shift_true + rng.normal(0, 0.1, mde.shape).astype(np.float32)
    conf = rng.uniform(0.2, 1, mde.shape).astype(np.float32)

    s, t = weighted_lsq(jnp.asarray(mde), jnp.asarray(disp), jnp.asarray(conf))
    rs, rt = torch_weighted_lsq(mde, disp, conf)
    np.testing.assert_allclose(np.asarray(s)[:, 0, 0, 0], rs, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t)[:, 0, 0, 0], rt, rtol=1e-3, atol=1e-3)
    # And it recovers the planted affine map.
    np.testing.assert_allclose(np.asarray(s)[:, 0, 0, 0], scale_true, rtol=0.05)
    np.testing.assert_allclose(np.asarray(t)[:, 0, 0, 0], shift_true, rtol=0.2)


def test_normalized_scale_and_shift(rng):
    b, h, w = 2, 10, 12
    pred = rng.uniform(0, 1, (b, 1, h, w)).astype(np.float32).transpose(0, 2, 3, 1)
    target = 5 * pred + 2
    mask = np.ones_like(pred)
    s, t = normalized_scale_and_shift(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(s)[:, 0, 0, 0], 5.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t)[:, 0, 0, 0], 2.0, rtol=1e-3)
