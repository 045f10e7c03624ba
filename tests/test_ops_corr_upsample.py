"""Oracle tests for the correlation-pyramid lookup and convex upsampling."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stereoanywhere_tpu.ops import build_corr_pyramid, lookup_corr_pyramid, convex_upsample, upflow


def torch_corr_block_lookup(volume_bhwv, coords_x, num_levels=4, radius=4):
    """Faithful oracle of reference CorrBlock1D (corr.py:75-115).

    volume (B,H,W2,W3); coords_x (B,H,W2) -> (B, levels*(2r+1), H, W2)."""
    v = torch.from_numpy(volume_bhwv)
    b, h, w2, w3 = v.shape
    corr = v.reshape(b * h * w2, 1, 1, w3)
    pyramid = [corr]
    for _ in range(num_levels):
        corr = F.avg_pool2d(corr, [1, 2], stride=[1, 2])
        pyramid.append(corr)

    coords = torch.from_numpy(coords_x).reshape(b * h * w2, 1, 1, 1)
    out = []
    for i in range(num_levels):
        c = pyramid[i]
        dx = torch.linspace(-radius, radius, 2 * radius + 1).view(1, 1, 2 * radius + 1, 1)
        x0 = dx + coords / 2**i
        wl = c.shape[-1]
        xg = 2 * x0 / (wl - 1) - 1
        grid = torch.cat([xg, torch.zeros_like(xg)], dim=-1)
        sampled = F.grid_sample(c, grid, align_corners=True)  # (BHW,1,1,2r+1)
        out.append(sampled.view(b, h, w2, -1))
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2).numpy()


def test_corr_pyramid_lookup_matches_reference(rng):
    b, h, w2, w3 = 2, 3, 8, 32
    vol = rng.standard_normal((b, h, w2, w3)).astype(np.float32)
    coords = rng.uniform(-1, w3, (b, h, w2)).astype(np.float32)

    pyr = build_corr_pyramid(jnp.asarray(vol), num_levels=4, radius=4)
    ours = np.asarray(lookup_corr_pyramid(pyr, jnp.asarray(coords)))  # (B,H,W2,36)
    ref = torch_corr_block_lookup(vol, coords)  # (B,36,H,W2)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_tent_lookup_equals_gather(rng):
    """Both TPU formulations (tent einsum, lagged product) must match the
    gather exactly."""
    from stereoanywhere_tpu.ops.corr_lookup import (
        _lookup_level_gather,
        _lookup_level_lagged,
        _lookup_level_tent,
    )

    level = jnp.asarray(rng.standard_normal((2, 3, 8, 32)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-3, 35, (2, 3, 8)).astype(np.float32))
    a = np.asarray(_lookup_level_gather(level, coords, 4))
    b = np.asarray(_lookup_level_tent(level, coords, 4))
    c = np.asarray(_lookup_level_lagged(level, coords, 4))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)

    from stereoanywhere_tpu.ops.corr_lookup import _lookup_level_inline_tent_pair

    d, e = _lookup_level_inline_tent_pair(level, 2.0 * level, coords, 4)
    np.testing.assert_allclose(np.asarray(d), a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e), 2.0 * a, rtol=1e-4, atol=1e-5)


def test_pair_lookup_equals_two_single_lookups(rng):
    """The shared-tent pair formulation (one g build for both volumes) must
    match two independent lookups, level-for-level and through the full
    pyramid API."""
    from stereoanywhere_tpu.ops.corr_lookup import (
        CorrPyramid,
        _lookup_level_gather,
        _lookup_level_lagged_pair,
        build_corr_pyramid,
        lookup_corr_pyramid,
        lookup_corr_pyramid_pair,
    )

    level_a = jnp.asarray(rng.standard_normal((2, 3, 8, 32)).astype(np.float32))
    level_b = jnp.asarray(rng.standard_normal((2, 3, 8, 32)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-3, 35, (2, 3, 8)).astype(np.float32))
    oa, ob = _lookup_level_lagged_pair(level_a, level_b, coords, 4)
    np.testing.assert_allclose(
        np.asarray(oa), np.asarray(_lookup_level_gather(level_a, coords, 4)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ob), np.asarray(_lookup_level_gather(level_b, coords, 4)),
        rtol=1e-4, atol=1e-5,
    )

    pa = build_corr_pyramid(jnp.asarray(rng.standard_normal((1, 4, 8, 16)).astype(np.float32)))
    pb = build_corr_pyramid(jnp.asarray(rng.standard_normal((1, 4, 8, 16)).astype(np.float32)))
    c2 = jnp.asarray(rng.uniform(0, 15, (1, 4, 8)).astype(np.float32))
    ra, rb = lookup_corr_pyramid_pair(pa, pb, c2)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(lookup_corr_pyramid(pa, c2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(lookup_corr_pyramid(pb, c2)), rtol=1e-5)


def torch_convex_upflow(flow, mask, n_downsample=2, use_scale_factor=True):
    # reference utils/utils.py:97-110
    N, D, H, W = flow.shape
    factor = 2**n_downsample
    mask = mask.view(N, 1, 9, factor, factor, H, W)
    mask = torch.softmax(mask, dim=2)
    _tmp = factor * flow if use_scale_factor else flow
    up_flow = F.unfold(_tmp, [3, 3], padding=1)
    up_flow = up_flow.view(N, D, 9, 1, 1, H, W)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(N, D, factor * H, factor * W)


def test_convex_upsample_matches_reference(rng):
    b, h, w = 2, 5, 7
    f = 4
    flow = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    mask = rng.standard_normal((b, h, w, 9 * f * f)).astype(np.float32)

    ours = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask), n_downsample=2))
    ref = torch_convex_upflow(
        torch.from_numpy(flow).permute(0, 3, 1, 2),
        torch.from_numpy(mask).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_upflow(rng):
    x = rng.standard_normal((1, 4, 6, 1)).astype(np.float32)
    ours = np.asarray(upflow(jnp.asarray(x), factor=2))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (16, 24), mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
        * 4
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_window_lookup_equals_gather(rng):
    """Windowed-slab pair lookup == gather reference for every size class:
    blocked wide levels (nb=4), small levels (inline fallback), coords past
    both edges (slab clamping must reproduce the zeros-padding fade)."""
    from stereoanywhere_tpu.ops.corr_lookup import (
        _lookup_level_gather,
        _lookup_level_window_pair,
    )

    for wl in (256, 128, 96, 64, 32, 16):
        level_a = jnp.asarray(rng.standard_normal((1, 4, 8, wl)).astype(np.float32))
        level_b = jnp.asarray(rng.standard_normal((1, 4, 8, wl)).astype(np.float32))
        coords = jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(-6, wl + 6, (1, 4, 6)),  # incl. out-of-range
                    np.array([[[0.0, wl - 1.0]] * 4]),   # exact edges
                ],
                axis=-1,
            ).astype(np.float32)
        )
        ref_a = np.asarray(_lookup_level_gather(level_a, coords, 4))
        ref_b = np.asarray(_lookup_level_gather(level_b, coords, 4))
        got_a, got_b = _lookup_level_window_pair(level_a, level_b, coords, 4)
        np.testing.assert_allclose(np.asarray(got_a), ref_a, rtol=1e-5, atol=1e-5, err_msg=f"wl={wl}")
        np.testing.assert_allclose(np.asarray(got_b), ref_b, rtol=1e-5, atol=1e-5, err_msg=f"wl={wl}")
