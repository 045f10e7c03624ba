"""Tests for auxiliary components: loss extras, warps, SGM, dcn, logging."""
import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def test_ssim_matches_definition(rng):
    from stereoanywhere_tpu.train.loss_extras import ssim

    x = rng.uniform(0, 1, (1, 12, 12, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    d_same = float(np.mean(np.asarray(ssim(jnp.asarray(x), jnp.asarray(x)))))
    d_noisy = float(np.mean(np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))))
    assert d_same < 1e-5
    assert d_noisy > d_same


def test_csim_matches_oracle(rng):
    """CSIM twin (reference losses.py:35-62): numpy oracle of
    K1*(mu_x-mu_y)^2 + K2*(sig_x+sig_y-2*sig_xy) -> clamp((1-v)/2, 0, 1)
    with the same zero-pad window-3 means as our ssim twin."""
    from stereoanywhere_tpu.train.loss_extras import csim

    x = rng.uniform(0, 1, (1, 8, 16, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)

    def pool3(a):
        p = np.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return sum(
            p[:, i : i + a.shape[1], j : j + a.shape[2]] for i in range(3) for j in range(3)
        ) / 9.0

    mu_x, mu_y = pool3(x), pool3(y)
    sig_x = pool3(x * x) - mu_x**2
    sig_y = pool3(y * y) - mu_y**2
    sig_xy = pool3(x * y) - mu_x * mu_y
    v = 0.25 * (mu_x**2 + mu_y**2 - 2 * mu_x * mu_y) + 1.0 * (sig_x + sig_y - 2 * sig_xy)
    want = np.clip((1 - v) / 2, 0, 1)
    got = np.asarray(csim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # identical inputs: zero contrast/structure distance -> exactly 0.5
    same = np.asarray(csim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.5, atol=1e-6)


def test_silog_and_affine_losses(rng):
    from stereoanywhere_tpu.train.loss_extras import affine_invariant_mae, silog_loss

    gt = rng.uniform(0.5, 5, (1, 8, 8, 1)).astype(np.float32)
    valid = np.ones_like(gt)
    # perfect prediction -> 0
    assert float(silog_loss(jnp.asarray(gt), jnp.asarray(gt), jnp.asarray(valid))) < 1e-4
    # affine-invariant: scale+shift of gt -> ~0
    pred = 3 * gt + 1
    v = float(affine_invariant_mae(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid)))
    assert v < 1e-5


def test_ransac_scale_shift(rng):
    from stereoanywhere_tpu.train.loss_extras import ransac_scale_shift

    mde = rng.uniform(0, 1, (40, 50)).astype(np.float32)
    disp = 25 * mde + 3
    # 20% outliers
    mask = rng.uniform(size=disp.shape) < 0.2
    disp[mask] += rng.uniform(20, 60, mask.sum())
    s, t = ransac_scale_shift(mde, disp, np.ones_like(disp), iters=200)
    assert abs(s - 25) < 1.0 and abs(t - 3) < 1.0


def test_fast_warps(rng):
    from stereoanywhere_tpu.data.warps import fast_warp_disparity, interpolate_background

    # constant-disparity plane warps to a shifted plane
    disp = np.full((6, 20), 4.0, np.float32)
    warped = fast_warp_disparity(disp)
    assert (warped[:, : 20 - 4] == 4.0).all()
    assert (warped[:, 20 - 4 :] == 0).all()

    holes = disp.copy()
    holes[:, 5:9] = 0
    filled = interpolate_background(holes)
    assert (filled > 0).all()


def test_sgm_constant_shift():
    from stereoanywhere_tpu.ops.sgm import sgm_disparity

    rng = np.random.default_rng(0)
    w, d_true = 48, 5
    tex = rng.uniform(0, 1, (24, w + d_true)).astype(np.float32)
    # left[x] corresponds to right[x - d]: right is the texture shifted left
    left = tex[:, :w]
    right = tex[:, d_true : d_true + w]
    disp = np.asarray(sgm_disparity(jnp.asarray(left[None]), jnp.asarray(right[None]), max_disp=16))
    interior = disp[0, 4:-4, d_true + 4 : -4]
    frac_correct = float((np.abs(interior - d_true) <= 1).mean())
    assert frac_correct > 0.9, f"SGM only {frac_correct:.2%} correct"


def test_deformable_conv_zero_offsets_is_regular_conv(rng):
    from stereoanywhere_tpu.models.dcn import DeformableConv2d

    x = jnp.asarray(rng.standard_normal((1, 8, 10, 4)).astype(np.float32))
    m = DeformableConv2d(6)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # offset conv init zeros -> modulation sigmoid(0)*2 = 1, offsets 0 ->
    # must equal a plain 3x3 conv with the same kernel
    k = v["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_metric_logger(tmp_path):
    from stereoanywhere_tpu.utils.logging import MetricLogger

    lg = MetricLogger(str(tmp_path))
    lg.log(1, {"loss": 0.5, "skipme": "str"})
    lg.log(2, {"loss": 0.25})
    lg.close()
    lines = open(os.path.join(tmp_path, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) == 2 and '"loss": 0.25' in lines[1]


def test_otsu_bimodal():
    from stereoanywhere_tpu.parallel.non_lambertian import otsu_threshold

    rng = np.random.default_rng(0)
    a = np.clip(rng.normal(0.2, 0.03, 5000), 0, 1)
    b = np.clip(rng.normal(0.8, 0.03, 5000), 0, 1)
    th = otsu_threshold(np.concatenate([a, b]))
    # Otsu's between-class variance is flat on the inter-mode plateau; any
    # threshold that separates the modes is a valid argmax (cv2 also returns
    # a plateau edge).  Require separation quality, not a specific value.
    sep = ((a < th).mean() + (b > th).mean()) / 2
    assert sep > 0.97, (th, sep)


@pytest.mark.slow
def test_multi_update_scaler_block_shapes(rng):
    """MultiUpdateScalerBlock (reference BasicMultiUpdateScalerBlock,
    update.py:199-240): full assembly returns scale/shift/confidence deltas
    with the right shapes and bounded ranges."""
    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.models.update import MultiUpdateScalerBlock

    b, h, w = 1, 16, 24
    net = tuple(
        jnp.asarray(rng.standard_normal((b, h // s, w // s, 128)).astype(np.float32))
        for s in (1, 2, 4)
    )
    inp = tuple(
        tuple(
            jnp.asarray(rng.standard_normal(n.shape).astype(np.float32)) for _ in range(3)
        )
        for n in net
    )
    corr = jnp.asarray(rng.standard_normal((b, h, w, 36)).astype(np.float32))
    flow = jnp.zeros((b, h, w, 2))
    flow_conf = jnp.ones((b, h, w, 1)) * 0.5

    block = MultiUpdateScalerBlock()
    variables = block.init(jax.random.PRNGKey(0), net, inp, corr, corr, flow, flow_conf)
    new_net, d_lscale, d_gscale, d_gshift, d_conf = block.apply(
        variables, net, inp, corr, corr, flow, flow_conf
    )
    assert tuple(x.shape for x in new_net) == tuple(x.shape for x in net)
    assert d_lscale.shape == (b, h, w, 1)
    assert d_conf.shape == (b, h, w, 1)
    assert d_gscale.shape == (b, 1, 1, 1) and d_gshift.shape == (b, 1, 1, 1)
    # sigmoid heads are bounded
    assert float(d_lscale.min()) >= 0 and float(d_lscale.max()) <= 1
    assert float(d_conf.min()) >= 0 and float(d_conf.max()) <= 1


def test_convert_cli_roundtrip(tmp_path):
    """cli convert: torch .tar checkpoint -> native msgpack; _load_stereo
    reads it back identical to the direct converter output (so serving needs
    no torch).  DataParallel 'module.' prefixes included like the reference's
    saved checkpoints (reference train.py:647-653)."""
    import jax
    import torch as _torch

    from stereoanywhere_tpu.cli import main as cli_main
    from stereoanywhere_tpu.compat.torch_convert import (
        convert_stereo_checkpoint,
        load_torch_state_dict,
    )
    from tests.reference_loader import load_reference_stereo_module

    load_reference_stereo_module()
    from models.stereoanywhere.stereoanywhere import StereoAnywhere as TorchSA

    torch_model = TorchSA({})
    sd = {f"module.{k}": v for k, v in torch_model.state_dict().items()}
    tar = str(tmp_path / "ckpt.tar")
    _torch.save({"state_dict": sd}, tar)

    out = str(tmp_path / "ckpt.msgpack")
    cli_main(["convert", "--input", tar, "--output", out, "--kind", "stereo"])

    from flax import serialization

    restored = serialization.msgpack_restore(open(out, "rb").read())
    direct = convert_stereo_checkpoint(load_torch_state_dict(tar))

    flat_r = jax.tree.leaves(restored)
    flat_d = jax.tree.leaves(direct)
    assert len(flat_r) == len(flat_d) and len(flat_r) > 50
    for a, b in zip(flat_r, flat_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_small_cout_packed_exact(rng):
    """Column-packed low-Cout conv (models/layers.py conv_small_cout_packed,
    the DPT-head output-conv lowering) is EXACTLY the plain conv — the
    widened kernel only adds structural zeros."""
    from stereoanywhere_tpu.models.layers import (
        conv_small_cout_packed,
        unpack_columns,
    )

    for (h, w, cin, co, k, pack) in [(9, 37, 16, 8, 3, 4), (6, 24, 8, 4, 3, 2),
                                     (7, 518 // 7, 12, 5, 3, 4)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        kern = jnp.asarray(
            rng.standard_normal((k, k, cin, co)).astype(np.float32)
        )
        bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        got = unpack_columns(
            conv_small_cout_packed(x, kern, bias, pack=pack, padding=k // 2), w, co
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5)


def test_dpt_output_convs_packed_matches_plain(rng):
    """The DPT head's packed output-conv path (incl. the block-diagonal 1x1
    consuming the packed layout) == the plain path."""
    from stereoanywhere_tpu.models.dpt import _output_convs

    x = jnp.asarray(rng.standard_normal((2, 10, 53, 24)).astype(np.float32))
    k20 = jnp.asarray(rng.standard_normal((3, 3, 24, 32)).astype(np.float32))
    b20 = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    k22 = jnp.asarray(rng.standard_normal((1, 1, 32, 1)).astype(np.float32))
    b22 = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    plain = np.asarray(_output_convs(x, k20, b20, k22, b22, packed=False))
    packed = np.asarray(_output_convs(x, k20, b20, k22, b22, packed=True))
    # identical sums up to f32 accumulation order (the packed contraction
    # reduces over cin*(kw+pack-1) in one pass)
    np.testing.assert_allclose(packed, plain, rtol=1e-5, atol=3e-4)


def test_naive_scale_shift_golden(rng):
    """ops/lsq.naive_scale_shift vs the reference's per-sample loop
    (reference utils/utils.py:386-410) — incl. torch.quantile's linear rank
    interpolation and torch.median's lower-middle convention."""
    from stereoanywhere_tpu.ops.lsq import naive_scale_shift

    mde = rng.uniform(0, 1, (3, 1, 7, 11)).astype(np.float32)
    disp = (mde * 3.7 + 0.5 + rng.normal(0, 0.05, mde.shape)).astype(np.float32)
    conf = rng.uniform(0, 1, mde.shape).astype(np.float32)

    t_mde, t_disp, t_conf = map(torch.from_numpy, (mde, disp, conf))
    want_scale = np.zeros((3,), np.float32)
    want_shift = np.zeros((3,), np.float32)
    for b in range(3):
        m = t_mde[b][t_conf[b] > 0.5]
        d = t_disp[b][t_conf[b] > 0.5]
        s = (torch.quantile(d, 0.9) - d.median()) / (torch.quantile(m, 0.9) - m.median())
        want_scale[b] = s
        want_shift[b] = d.median() - s * m.median()

    # ours takes NHWC-like; layout-free (stats over all non-batch axes)
    scale, shift = naive_scale_shift(
        jnp.asarray(mde.transpose(0, 2, 3, 1)),
        jnp.asarray(disp.transpose(0, 2, 3, 1)),
        jnp.asarray(conf.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(scale)[:, 0, 0, 0], want_scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(shift)[:, 0, 0, 0], want_shift, rtol=1e-4, atol=1e-5)


def test_naive_scale_shift_empty_mask_is_nan(rng):
    """An all-low-confidence frame must fail LOUDLY (NaN), not silently emit
    a plausible-looking scale from the sort filler (the torch reference
    raises on the empty tensor; advisor finding r3)."""
    from stereoanywhere_tpu.ops.lsq import naive_scale_shift

    mde = jnp.asarray(rng.uniform(0, 1, (2, 5, 7, 1)).astype(np.float32))
    disp = mde * 2.0 + 1.0
    conf = jnp.concatenate(
        [jnp.zeros((1, 5, 7, 1)), jnp.ones((1, 5, 7, 1))], axis=0
    )  # batch row 0: no conf > th
    scale, shift = naive_scale_shift(mde, disp, conf)
    assert np.isnan(np.asarray(scale)[0]).all() and np.isnan(np.asarray(shift)[0]).all()
    assert np.isfinite(np.asarray(scale)[1]).all() and np.isfinite(np.asarray(shift)[1]).all()
