"""Banded-fold conv3d lowering vs direct lax conv3d (exact same math)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (fast tier: -m 'not slow')

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.ops.conv3d_fold import _pick_block, conv3d_folded


def _direct(x, k, strides, padding):
    return jax.lax.conv_general_dilated(
        x, k, strides, ((padding, padding),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize(
    "shape,co,strides,block",
    [
        ((1, 8, 10, 16, 4), 3, (1, 1, 1), None),   # nb=1 dense path
        ((2, 8, 10, 32, 4), 5, (1, 1, 1), 8),      # blocked, nb=4
        ((1, 8, 8, 48, 8), 8, (1, 1, 1), None),    # auto block (24)
        ((1, 8, 10, 32, 4), 6, (2, 2, 2), 8),      # stride 2 everywhere
        ((1, 16, 6, 24, 2), 4, (2, 2, 2), None),   # stride 2, auto block
    ],
)
def test_folded_matches_direct(rng, shape, co, strides, block):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, shape[-1], co)).astype(np.float32))
    want = np.asarray(_direct(x, k, strides, 1))
    got = np.asarray(conv3d_folded(x, k, strides, 1, block_w=block))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_folded_grads_match(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 16, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)).astype(np.float32))

    gd = jax.grad(lambda kk: jnp.sum(jnp.sin(_direct(x, kk, (1, 1, 1), 1))))(k)
    gf = jax.grad(lambda kk: jnp.sum(jnp.sin(conv3d_folded(x, kk, (1, 1, 1), 1, block_w=8))))(k)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd), rtol=1e-4, atol=1e-4)


def test_pick_block():
    assert _pick_block(128) == 32
    assert _pick_block(312) == 26
    assert _pick_block(8) == 8
    assert _pick_block(4) == 4   # no divisor >= 8: whole axis, nb=1
    assert _pick_block(40) == 20
    for w in (8, 16, 24, 40, 48, 96, 128, 312, 752):
        b = _pick_block(w)
        assert w % b == 0
    # stride-2 convs need an even block: W=544 -> w4=136 (divisors 8,17,34..)
    # used to pick 17 and crash every strided hourglass conv
    for w in (136, 152, 184, 200, 216, 68, 34):
        b = _pick_block(w, multiple=2)
        assert w % b == 0 and b % 2 == 0, (w, b)
    assert _pick_block(136, multiple=2) == 8


@pytest.mark.parametrize("w", [136, 152])
def test_folded_stride2_odd_factor_widths(rng, w):
    """Regression: widths whose divisors near 32 are odd (544/4=136 etc.)
    must still run the strided banded conv and match the direct conv3d."""
    x = jnp.asarray(rng.standard_normal((1, 4, 6, w, 2)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 4)).astype(np.float32))
    want = np.asarray(_direct(x, k, (2, 2, 2), 1))
    got = np.asarray(conv3d_folded(x, k, (2, 2, 2), 1))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fold_and_direct_paths_share_init_and_output(rng):
    """The banded-fold branch and the direct conv3d branch of BasicConv /
    Conv3dClassifier must produce IDENTICAL random init (same initializers,
    same param paths) and matching outputs — regression for the
    lecun/kaiming initializer mismatch in Conv3dClassifier."""
    import jax
    import jax.numpy as jnp

    import stereoanywhere_tpu.models.layers as layers
    from stereoanywhere_tpu.models.layers import BasicConv
    from stereoanywhere_tpu.models.stereoanywhere import Conv3dClassifier

    x = jnp.asarray(rng.standard_normal((1, 6, 8, 16, 8)).astype(np.float32))
    orig = layers._use_banded_conv3d
    try:
        outs, params = {}, {}
        for enabled in (True, False):
            layers._use_banded_conv3d = lambda ci, co, _e=enabled: _e
            for name, mod in (
                ("cls", Conv3dClassifier()),
                ("bc", BasicConv(8, is_3d=True, kernel_size=3, padding=1, norm="instance")),
            ):
                v = mod.init(jax.random.PRNGKey(3), x)
                outs[(name, enabled)] = np.asarray(mod.apply(v, x))
                params[(name, enabled)] = jax.tree_util.tree_leaves(v)
    finally:
        layers._use_banded_conv3d = orig

    for name in ("cls", "bc"):
        for a, b in zip(params[(name, True)], params[(name, False)]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            outs[(name, True)], outs[(name, False)], rtol=2e-5, atol=2e-5
        )


def test_small_cin_conv_im2col_matches_direct(rng):
    """SmallCinConv's im2col lowering == direct conv, identical params."""
    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.models.layers import SmallCinConv

    for cin, k, s in [(3, 7, 1), (2, 7, 1), (3, 7, 2), (1, 7, 1)]:
        x = jnp.asarray(rng.standard_normal((2, 20, 24, cin)).astype(np.float32))
        a = SmallCinConv(16, k, s, k // 2, use_im2col=False)
        b = SmallCinConv(16, k, s, k // 2, use_im2col=True)
        v = a.init(jax.random.PRNGKey(1), x)
        for pa, pb in zip(
            jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(b.init(jax.random.PRNGKey(1), x))
        ):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        np.testing.assert_allclose(
            np.asarray(a.apply(v, x)), np.asarray(b.apply(v, x)), rtol=2e-5, atol=2e-5
        )


# ---------------------------------------------------------------------------
# Lane-folded volume algebra (ops/folded.py): every op is an exact reordering
# of its unfolded counterpart.


def test_folded_io_matches_conv3d_folded(rng):
    from stereoanywhere_tpu.ops.folded import conv3d_folded_io, fold, unfold

    for shape, co, strides in [
        ((2, 6, 4, 8, 8), 16, (1, 1, 1)),
        ((1, 8, 6, 24, 4), 8, (2, 2, 2)),
        ((1, 4, 4, 3, 8), 8, (1, 1, 1)),    # odd W, nb=1
    ]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 3, shape[-1], co)).astype(np.float32))
        want = np.asarray(conv3d_folded(x, k, strides, 1))
        got = np.asarray(unfold(conv3d_folded_io(fold(x), k, strides, 1, w=shape[3]), co))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_folded_elementwise_ops_match(rng):
    from stereoanywhere_tpu.models.layers import instance_norm
    from stereoanywhere_tpu.ops.folded import (
        build_masked_volume_folded,
        fold,
        instance_norm_folded,
        lane_broadcast_c,
        lane_broadcast_w,
        resize_folded,
        unfold,
    )
    from stereoanywhere_tpu.ops.interp import resize_trilinear_align_corners
    from stereoanywhere_tpu.ops.volume import apply_bin_masks

    B, D, H, W, C = 2, 6, 4, 8, 8
    x = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(unfold(instance_norm_folded(fold(x), C), C)),
        np.asarray(instance_norm(x)),
        rtol=1e-5, atol=1e-5,
    )

    for tgt in [(12, 8, 16), (3, 2, 4), (D, H, W)]:
        np.testing.assert_allclose(
            np.asarray(unfold(resize_folded(fold(x), tgt, w=W, c=C), C)),
            np.asarray(resize_trilinear_align_corners(x, tgt)),
            rtol=1e-5, atol=1e-5,
        )

    g = jnp.asarray(rng.standard_normal((B, D, H, C)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(lane_broadcast_c(g, W)),
        np.asarray(jnp.broadcast_to(g[:, :, :, None, :], (B, D, H, W, C)).reshape(B, D, H, W * C)),
    )
    v = jnp.asarray(rng.standard_normal((B, D, H, W)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(lane_broadcast_w(v, C)),
        np.asarray(jnp.broadcast_to(v[..., None], (B, D, H, W, C)).reshape(B, D, H, W * C)),
    )

    H2, W2, W3, N = 4, 8, 6, 8
    vol = jnp.asarray(rng.standard_normal((B, H2, W2, W3)).astype(np.float32))
    lm = jnp.asarray(rng.standard_normal((B, H2, W2, N)).astype(np.float32))
    rm = jnp.asarray(rng.standard_normal((B, H2, W3, N)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(unfold(build_masked_volume_folded(vol, lm, rm, jnp.float32), N)),
        np.asarray(apply_bin_masks(vol, lm, rm).transpose(0, 3, 1, 2, 4)),
    )


def test_blocked_ops_match_folded(rng):
    """Carried block layout (B, nb, D, H, wb*C): every op is an exact
    reordering of its folded counterpart (ops/folded.py)."""
    from stereoanywhere_tpu.ops.folded import (
        build_masked_volume_blocked,
        build_masked_volume_folded,
        conv3d_blocked_io,
        conv3d_folded_io,
        fold,
        from_blocks,
        instance_norm_blocked,
        instance_norm_folded,
        pick_nb,
        resize_blocked,
        resize_folded,
        to_blocks,
    )

    assert [pick_nb(w) for w in (24, 32, 80, 136, 256, 17)] == [3, 2, 5, 17, 16, None]

    B, D, H, W, C = 2, 6, 4, 32, 8
    x5 = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
    xf = fold(x5)
    nb = 2
    xb = to_blocks(xf, nb)
    np.testing.assert_array_equal(np.asarray(from_blocks(xb)), np.asarray(xf))

    for co, st, k, p in [(16, (1, 1, 1), 3, 1), (8, (2, 2, 2), 3, 1), (16, (1, 1, 1), 1, 0)]:
        kern = jnp.asarray(rng.standard_normal((k, k, k, C, co)).astype(np.float32))
        want = conv3d_folded_io(xf, kern, st, p, w=W)
        got = from_blocks(conv3d_blocked_io(xb, kern, st, p, w=W))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    np.testing.assert_allclose(
        np.asarray(from_blocks(instance_norm_blocked(xb, C))),
        np.asarray(instance_norm_folded(xf, C)),
        rtol=1e-5, atol=1e-5,
    )

    for tgt in [(12, 8, 64), (D, H, W)]:  # W upsample + same-W
        np.testing.assert_allclose(
            np.asarray(from_blocks(resize_blocked(xb, tgt, w=W, c=C))),
            np.asarray(resize_folded(xf, tgt, w=W, c=C)),
            rtol=1e-5, atol=1e-5,
        )

    H2, W2, W3, N = 4, 32, 6, 8
    vol = jnp.asarray(rng.standard_normal((B, H2, W2, W3)).astype(np.float32))
    lm = jnp.asarray(rng.standard_normal((B, H2, W2, N)).astype(np.float32))
    rm = jnp.asarray(rng.standard_normal((B, H2, W3, N)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(from_blocks(build_masked_volume_blocked(vol, lm, rm, jnp.float32, nb))),
        np.asarray(build_masked_volume_folded(vol, lm, rm, jnp.float32)),
        rtol=1e-6, atol=1e-6,
    )


def test_hourglass_blocked_matches_folded(rng):
    """Hourglass(blocked=True) == Hourglass(folded=True): identical param
    tree/init, matching outputs on the carried block layout."""
    from stereoanywhere_tpu.models.hourglass import Hourglass
    from stereoanywhere_tpu.ops.folded import fold, from_blocks, pick_nb, to_blocks

    B, W3, H, W2, C = 1, 24, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((B, W3, H, W2, C)).astype(np.float32))
    fl = [
        jnp.asarray(rng.standard_normal((B, H // 2**i, W2 // 2**i, 1)).astype(np.float32))
        for i in range(4)
    ]
    fr = [
        jnp.asarray(rng.standard_normal((B, H // 2**i, W3 // 2**i, 1)).astype(np.float32))
        for i in range(4)
    ]
    nb = pick_nb(W2)
    assert nb == 2
    hg_f = Hourglass(C, C, folded=True)
    hg_b = Hourglass(C, C, folded=True, blocked=True)
    vf = hg_f.init(jax.random.PRNGKey(3), fold(x), fl, fr)
    vb = hg_b.init(jax.random.PRNGKey(3), to_blocks(fold(x), nb), fl, fr)
    kf = [(jax.tree_util.keystr(p), v.shape) for p, v in jax.tree_util.tree_flatten_with_path(vf)[0]]
    kb = [(jax.tree_util.keystr(p), v.shape) for p, v in jax.tree_util.tree_flatten_with_path(vb)[0]]
    assert kf == kb
    for a, b in zip(jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(vb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(hg_f.apply(vf, fold(x), fl, fr))
    got = np.asarray(from_blocks(hg_b.apply(vf, to_blocks(fold(x), nb), fl, fr)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_model_forward_blocked_matches_folded(rng):
    """Full StereoAnywhere forward: hourglass_blocked True/False agree at a
    width whose W2 blocks (w4=32 -> nb=2), incl. the stereo aggregation and
    stacked hourglasses."""
    from dataclasses import replace

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    h, w = 64, 128
    xs = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32))
        for c in (3, 3, 1, 1)
    )
    cfg_b = StereoAnywhereConfig(use_aggregate_stereo_vol=True, n_additional_hourglass=2)
    cfg_f = replace(cfg_b, hourglass_blocked=False)
    m_b, m_f = StereoAnywhere(cfg_b), StereoAnywhere(cfg_f)
    vb = jax.jit(lambda k, *a: m_b.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), *xs
    )
    vf = jax.jit(lambda k, *a: m_f.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), *xs
    )
    for a, b in zip(jax.tree_util.tree_leaves(vb), jax.tree_util.tree_leaves(vf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ob = jax.jit(lambda v, *a: m_b.apply(v, *a, iters=4, test_mode=True))(vb, *xs)
    of = jax.jit(lambda v, *a: m_f.apply(v, *a, iters=4, test_mode=True))(vf, *xs)
    for key in ("disparity", "coarse_dispmono2", "coarse_dispstereo2", "coarse_conf2"):
        a = np.asarray(ob[key], np.float32)
        b = np.asarray(of[key], np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-4 * scale, rtol=0, err_msg=key)


def test_hourglass_folded_matches_unfolded(rng):
    """Hourglass(folded=True) == Hourglass(folded=False): identical param
    tree/init, matching outputs."""
    from stereoanywhere_tpu.models.hourglass import Hourglass
    from stereoanywhere_tpu.ops.folded import fold, unfold

    B, W3, H, W2, C = 1, 24, 16, 24, 8
    x = jnp.asarray(rng.standard_normal((B, W3, H, W2, C)).astype(np.float32))
    fl = [
        jnp.asarray(rng.standard_normal((B, H // 2**i, W2 // 2**i, 1)).astype(np.float32))
        for i in range(4)
    ]
    fr = [
        jnp.asarray(rng.standard_normal((B, H // 2**i, W3 // 2**i, 1)).astype(np.float32))
        for i in range(4)
    ]
    hg_u = Hourglass(C, C, folded=False)
    hg_f = Hourglass(C, C, folded=True)
    vu = hg_u.init(jax.random.PRNGKey(3), x, fl, fr)
    vf = hg_f.init(jax.random.PRNGKey(3), fold(x), fl, fr)
    ku = [(jax.tree_util.keystr(p), v.shape) for p, v in jax.tree_util.tree_flatten_with_path(vu)[0]]
    kf = [(jax.tree_util.keystr(p), v.shape) for p, v in jax.tree_util.tree_flatten_with_path(vf)[0]]
    assert ku == kf
    for a, b in zip(jax.tree_util.tree_leaves(vu), jax.tree_util.tree_leaves(vf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = np.asarray(hg_u.apply(vu, x, fl, fr))
    got = np.asarray(unfold(hg_f.apply(vu, fold(x), fl, fr), C))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_model_forward_folded_matches_unfolded(rng):
    """Full StereoAnywhere forward: hourglass_folded True/False agree
    (incl. the optional stereo aggregation + stacked hourglasses)."""
    from dataclasses import replace

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    h, w = 64, 96
    xs = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32))
        for c in (3, 3, 1, 1)
    )
    cfg_f = StereoAnywhereConfig(
        hourglass_folded=True, use_aggregate_stereo_vol=True, n_additional_hourglass=2
    )
    cfg_u = replace(cfg_f, hourglass_folded=False)
    m_f, m_u = StereoAnywhere(cfg_f), StereoAnywhere(cfg_u)
    vf = jax.jit(lambda k, *a: m_f.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), *xs
    )
    vu = jax.jit(lambda k, *a: m_u.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), *xs
    )
    for a, b in zip(jax.tree_util.tree_leaves(vf), jax.tree_util.tree_leaves(vu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    of = jax.jit(lambda v, *a: m_f.apply(v, *a, iters=4, test_mode=True))(vf, *xs)
    ou = jax.jit(lambda v, *a: m_u.apply(v, *a, iters=4, test_mode=True))(vu, *xs)
    for key in ("disparity", "coarse_dispmono2", "coarse_dispstereo2", "coarse_conf2"):
        a = np.asarray(of[key], np.float32)
        b = np.asarray(ou[key], np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=5e-4 * scale, rtol=0, err_msg=key)


def test_blocked_conv_co_major_output(rng):
    """out_co_major=True reorders output lanes (co, w) — contiguous sibling
    split — with identical values to the default (w, co) interleave."""
    from stereoanywhere_tpu.ops.folded import conv3d_blocked_io, fold, to_blocks

    B, D, H, W, C, CO = 1, 5, 4, 32, 6, 2
    x5 = jnp.asarray(rng.standard_normal((B, D, H, W, C)).astype(np.float32))
    xb = to_blocks(fold(x5), 2)
    kern = jnp.asarray(rng.standard_normal((3, 3, 3, C, CO)).astype(np.float32))
    std = conv3d_blocked_io(xb, kern, (1, 1, 1), 1, w=W)  # (..., wb*CO)
    com = conv3d_blocked_io(xb, kern, (1, 1, 1), 1, w=W, out_co_major=True)
    wb = std.shape[-1] // CO
    for c in range(CO):
        np.testing.assert_allclose(
            np.asarray(com[..., c * wb : (c + 1) * wb]),
            np.asarray(std[..., c::CO]),
            rtol=1e-6, atol=1e-6,
        )


def test_cnet_replicated_input_kernel_sum(rng):
    """ContextEncoder fed 1 channel == fed the channel replicated x3 (the
    conv1 kernel Cin-sum shortcut is exact for identical channels)."""
    from stereoanywhere_tpu.models.extractor import ContextEncoder

    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 1)).astype(np.float32))
    x3 = jnp.concatenate([x1] * 3, axis=-1)
    m = ContextEncoder(output_dims=((64, 64, 64), (64, 64, 64)))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x3)
    o3 = jax.jit(m.apply)(v, x3)
    o1 = jax.jit(m.apply)(v, x1)
    # identical sums up to f32 accumulation order (kernel Cin-sum first)
    for a, b in zip(jax.tree_util.tree_leaves(o1), jax.tree_util.tree_leaves(o3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5)


def test_blocked_halo_split_exact(rng):
    """conv3d_blocked_io(halo_split=True) — main conv on the raw block
    lanes + a 2C-lane halo conv, summed — matches the windowed form."""
    from stereoanywhere_tpu.ops import folded

    b, nb, d, h, wb, ci, co = 1, 4, 6, 5, 8, 3, 7
    x = jnp.asarray(rng.standard_normal((b, nb, d, h, wb * ci)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((3, 3, 3, ci, co)) * 0.1).astype(np.float32))
    for strides in [(1, 1, 1), (2, 2, 2)]:
        y0 = folded.conv3d_blocked_io(x, k, strides, 1, w=nb * wb, halo_split=False)
        y1 = folded.conv3d_blocked_io(x, k, strides, 1, w=nb * wb, halo_split=True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-5)
