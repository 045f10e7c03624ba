"""Oracle tests: interpolation/pooling parity with torch F.interpolate/avg_pool."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.ops import (
    resize_bilinear_align_corners,
    resize_trilinear_align_corners,
    pool2x,
    pool4x,
)
from stereoanywhere_tpu.ops.interp import (
    avg_pool_last_axis_2,
    resize_nearest,
    sample_1d_linear,
)


def test_bilinear_align_corners_up_down(rng):
    x = rng.standard_normal((2, 7, 11, 3)).astype(np.float32)
    for out in [(14, 22), (28, 44), (4, 6), (7, 11), (1, 5)]:
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out))
        ref = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), out, mode="bilinear", align_corners=True
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_trilinear_align_corners(rng):
    x = rng.standard_normal((1, 6, 5, 8, 2)).astype(np.float32)
    for out in [(3, 3, 4), (12, 10, 16), (6, 5, 8)]:
        ours = np.asarray(resize_trilinear_align_corners(jnp.asarray(x), out))
        ref = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 4, 1, 2, 3), out, mode="trilinear", align_corners=True
            )
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_nearest(rng):
    x = rng.standard_normal((1, 6, 8, 2)).astype(np.float32)
    for out in [(3, 4), (12, 16), (5, 7)]:
        ours = np.asarray(resize_nearest(jnp.asarray(x), out))
        ref = (
            F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), out, mode="nearest")
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref)


def test_pool2x_pool4x(rng):
    x = rng.standard_normal((2, 9, 13, 4)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref2 = F.avg_pool2d(xt, 3, stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    ref4 = F.avg_pool2d(xt, 5, stride=4, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(pool2x(jnp.asarray(x))), ref2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pool4x(jnp.asarray(x))), ref4, rtol=1e-5, atol=1e-6)


def test_avg_pool_last_axis(rng):
    # reference corr.py:90: F.avg_pool2d(corr, [1,2], stride=[1,2]) over W
    x = rng.standard_normal((2, 3, 4, 9)).astype(np.float32)
    ours = np.asarray(avg_pool_last_axis_2(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x), [1, 2], stride=[1, 2]).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_sample_1d_linear_matches_grid_sample(rng):
    # reference utils/utils.py:19-35 bilinear_sampler on a 1-row image.
    # w2=12 exercises the gather fallback; w2=64 the windowed-slab tent.
    for w2 in (12, 64):
        bhw = 6
        vals = rng.standard_normal((bhw, 1, 1, w2)).astype(np.float32)
        coords = rng.uniform(-2, w2 + 1, (bhw, 1, 9)).astype(np.float32)

        ours = np.asarray(
            sample_1d_linear(jnp.asarray(vals[:, :, 0, :]), jnp.asarray(coords))
        )  # (BHW,1,9)

        xg = 2 * torch.from_numpy(coords)[..., None] / (w2 - 1) - 1  # (BHW,1,9,1)
        grid = torch.cat([xg, torch.zeros_like(xg)], dim=-1)
        ref = F.grid_sample(torch.from_numpy(vals), grid, align_corners=True).numpy()
        # grid_sample output: (BHW, C=1, 1, 9); ours (BHW,1,9)
        np.testing.assert_allclose(ours, ref[:, 0, :, :], rtol=1e-5, atol=1e-5)


def test_resize_bilinear_halfpix_matches_jax_image(rng):
    # the DPT head's align_corners=False upsample (models/dpt.py) — matrix
    # form must match jax.image.resize 'bilinear' exactly (upsampling)
    from stereoanywhere_tpu.ops.interp import resize_bilinear_halfpix

    x = jnp.asarray(rng.standard_normal((2, 7, 9, 5)).astype(np.float32))
    for hw in [(14, 18), (21, 27), (7, 20)]:
        want = np.asarray(
            jax.image.resize(x, (2, hw[0], hw[1], 5), "bilinear")
        )
        got = np.asarray(resize_bilinear_halfpix(x, hw))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3x3_of_resize_halfpix_exact(rng):
    """Fused conv3x3-of-resize (the DPT output stage's algebraic
    rearrangement: channel mix before the H-upsample) vs the sequential
    resize -> zero-padded conv."""
    from stereoanywhere_tpu.ops.interp import (
        conv3x3_of_resize_halfpix,
        resize_bilinear_halfpix,
    )

    x = jnp.asarray(rng.standard_normal((2, 9, 11, 5)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((3, 3, 5, 4)) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        resize_bilinear_halfpix(x, (31, 38)), k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = conv3x3_of_resize_halfpix(x, (31, 38), k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pool2x_slices_exact(rng):
    """pool2x(slices=True) — 9 shifted strided slices summed — matches the
    reduce_window form (torch count_include_pad avg-pool semantics)."""
    from stereoanywhere_tpu.ops.interp import pool2x

    for (h, w) in [(8, 12), (64, 96), (7, 9)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 5)).astype(np.float32))
        a = pool2x(x, slices=False)
        b = pool2x(x, slices=True)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)
