"""Pallas fused dual-lookup kernel vs the reference-semantics XLA lookup
(interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from stereoanywhere_tpu.ops import build_corr_pyramid, lookup_corr_pyramid
from stereoanywhere_tpu.ops.pallas.corr_kernel import dual_lookup_pallas


def test_dual_lookup_matches_xla(rng):
    b, h, w2, w3 = 1, 8, 16, 32
    svol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
    mvol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-2, w3 + 2, (b, h, w2)).astype(np.float32))

    spyr = build_corr_pyramid(svol, 4, 4)
    mpyr = build_corr_pyramid(mvol, 4, 4)
    ref_s = np.asarray(lookup_corr_pyramid(spyr, coords))
    ref_m = np.asarray(lookup_corr_pyramid(mpyr, coords))

    got_s, got_m = dual_lookup_pallas(spyr.levels, mpyr.levels, coords, radius=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), ref_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_m), ref_m, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_windowed_gather_matches_xla(rng):
    """corr_gather.py windowed dynamic-gather kernel, incl. chunked wide
    levels (Wl > 128) and tiny levels (Wl < 2r+2)."""
    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid_pair
    from stereoanywhere_tpu.ops.pallas.corr_gather import (
        dual_lookup_windowed,
        pad_levels_to_lane_multiple,
    )

    for (b, h, w2, w3) in [(1, 8, 16, 32), (1, 8, 136, 136), (1, 8, 40, 40)]:
        svol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        mvol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-2, w3 + 2, (b, h, w2)).astype(np.float32))
        spyr = build_corr_pyramid(svol, 4, 4)
        mpyr = build_corr_pyramid(mvol, 4, 4)
        wls = tuple(l.shape[-1] for l in spyr.levels)
        ref_s, ref_m = lookup_corr_pyramid_pair(
            CorrPyramid(spyr.levels, 4), CorrPyramid(mpyr.levels, 4), coords
        )
        got_s, got_m = dual_lookup_windowed(
            pad_levels_to_lane_multiple(spyr.levels),
            pad_levels_to_lane_multiple(mpyr.levels),
            coords, radius=4, wls=wls, interpret=True,
        )
        # atol 5e-5: the chunked masked-sum accumulates in a different order
        # than the XLA tent contraction.
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=1e-4, atol=5e-5)


def test_lagged_single_pass_matches_xla(rng):
    """corr_lagged.py single-pass lagged-product kernel: matches the XLA
    pair lookup (same tent algebra, executed in VMEM)."""
    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid_pair
    from stereoanywhere_tpu.ops.pallas.corr_lagged import dual_lookup_lagged

    for (b, h, w2, w3) in [(1, 8, 16, 32), (1, 8, 128, 128)]:
        svol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        mvol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-2, w3 + 2, (b, h, w2)).astype(np.float32))
        spyr = build_corr_pyramid(svol, 4, 4)
        mpyr = build_corr_pyramid(mvol, 4, 4)
        ref_s, ref_m = lookup_corr_pyramid_pair(
            CorrPyramid(spyr.levels, 4), CorrPyramid(mpyr.levels, 4), coords
        )
        got_s, got_m = dual_lookup_lagged(spyr.levels, mpyr.levels, coords, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=1e-4, atol=5e-5)


def test_tent_single_pass_matches_xla(rng):
    """corr_tent.py single-pass dense-tent kernel (documented negative perf
    result, kept exact): matches the XLA pair lookup."""
    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid_pair
    from stereoanywhere_tpu.ops.pallas.corr_tent import dual_lookup_tent

    for (b, h, w2, w3) in [(1, 8, 16, 32), (1, 8, 128, 128)]:
        svol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        mvol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-2, w3 + 2, (b, h, w2)).astype(np.float32))
        spyr = build_corr_pyramid(svol, 4, 4)
        mpyr = build_corr_pyramid(mvol, 4, 4)
        ref_s, ref_m = lookup_corr_pyramid_pair(
            CorrPyramid(spyr.levels, 4), CorrPyramid(mpyr.levels, 4), coords
        )
        got_s, got_m = dual_lookup_tent(spyr.levels, mpyr.levels, coords, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=1e-4, atol=5e-5)


def test_barrel_single_pass_matches_xla(rng):
    """corr_barrel.py single-pass barrel-shift kernel: per-row log-step lane
    rotation replaces the per-tap cross-lane reductions; matches the XLA
    pair lookup incl. tiny levels (Wl < 2r+2, lane-padded)."""
    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid_pair
    from stereoanywhere_tpu.ops.pallas.corr_barrel import dual_lookup_barrel

    for (b, h, w2, w3) in [(1, 8, 16, 32), (1, 8, 128, 128), (1, 8, 40, 40)]:
        svol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        mvol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-2, w3 + 2, (b, h, w2)).astype(np.float32))
        spyr = build_corr_pyramid(svol, 4, 4)
        mpyr = build_corr_pyramid(mvol, 4, 4)
        ref_s, ref_m = lookup_corr_pyramid_pair(
            CorrPyramid(spyr.levels, 4), CorrPyramid(mpyr.levels, 4), coords
        )
        got_s, got_m = dual_lookup_barrel(spyr.levels, mpyr.levels, coords, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=1e-4, atol=5e-5)


def test_mxu_single_pass_matches_xla(rng):
    """corr_mxu.py single-pass MXU-reduction kernel: tap reductions as one
    ones-matmul dot per level; matches the XLA pair lookup."""
    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid_pair
    from stereoanywhere_tpu.ops.pallas.corr_mxu import dual_lookup_mxu

    for (b, h, w2, w3) in [(1, 8, 16, 32), (1, 8, 128, 128)]:
        svol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        mvol = jnp.asarray(rng.standard_normal((b, h, w2, w3)).astype(np.float32))
        coords = jnp.asarray(rng.uniform(-2, w3 + 2, (b, h, w2)).astype(np.float32))
        spyr = build_corr_pyramid(svol, 4, 4)
        mpyr = build_corr_pyramid(mvol, 4, 4)
        ref_s, ref_m = lookup_corr_pyramid_pair(
            CorrPyramid(spyr.levels, 4), CorrPyramid(mpyr.levels, 4), coords
        )
        got_s, got_m = dual_lookup_mxu(spyr.levels, mpyr.levels, coords, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), rtol=1e-4, atol=5e-5)


def test_lookup_impl_validation():
    """Unknown lookup impl strings raise instead of silently running the
    lagged path (they previously fell through to it)."""
    import pytest

    from stereoanywhere_tpu.ops.corr_lookup import CorrPyramid, lookup_corr_pyramid_pair

    vol = jnp.zeros((1, 4, 8, 16))
    pyr = CorrPyramid((vol,), 4)
    with pytest.raises(ValueError, match="unknown lookup impl"):
        lookup_corr_pyramid_pair(pyr, pyr, jnp.zeros((1, 4, 8)), impl="nope")


def test_vit_attention_matches_xla(rng):
    """ViT attention kernel (natural (B,T,3D) qkv layout, head-pair blocks,
    rowsum-in-matmul softmax) vs XLA attention, incl. a non-block-multiple T
    and a T smaller than the default block."""
    import jax

    from stereoanywhere_tpu.ops.pallas.vit_attention import vit_attention

    for (b, t, h, hd, bq) in [(2, 200, 4, 64, 128), (1, 96, 2, 64, 128), (1, 300, 2, 128, None)]:
        d = h * hd
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)).astype(np.float32))
        q, k, v = (qkv[..., i * d : (i + 1) * d].reshape(b, t, h, hd) for i in range(3))
        ref = jax.nn.dot_product_attention(q, k, v).reshape(b, t, d)
        got = vit_attention(qkv, h, block_q=bq, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_vit_mlp_matches_xla(rng):
    """Fused LN+fc1+gelu+fc2 kernel vs the inline XLA math (erf-poly gelu
    agrees with exact erf to ~1.5e-7)."""
    import jax

    from stereoanywhere_tpu.ops.pallas.vit_mlp import vit_mlp

    b, t, d, hidden = 2, 200, 256, 1024
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    be = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((d, hidden)) * 0.05).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((hidden, d)) * 0.05).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(d).astype(np.float32))

    xf = x
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    hln = xc * jax.lax.rsqrt(var + 1e-6) * g + be
    ref = jax.nn.gelu(hln @ w1 + b1, approximate=False) @ w2 + b2

    got = vit_mlp(x, g, be, w1, b1, w2, b2, block_t=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_vit_ln_dense_matches_xla(rng):
    """Fused LN+matmul kernel (the QKV projection with LN1 absorbed) vs the
    inline XLA chain, incl. a non-block-multiple token count."""
    import jax

    from stereoanywhere_tpu.ops.pallas.vit_dense import ln_dense

    b, t, d, f = 2, 200, 256, 768
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    be = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((d, f)) * 0.05).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(f).astype(np.float32))

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    ref = (xc * jax.lax.rsqrt(var + 1e-6) * g + be) @ w + bb

    got = ln_dense(x, g, be, w, bb, block_t=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_vit_dense_scale_residual_matches_xla(rng):
    """Fused proj+LayerScale+residual kernel vs the inline XLA chain."""
    from stereoanywhere_tpu.ops.pallas.vit_dense import dense_scale_residual

    b, t, d = 2, 200, 256
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    o = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    gam = jnp.asarray(rng.standard_normal(d).astype(np.float32))

    ref = x + gam * (o @ w + bb)
    got = dense_scale_residual(x, o, w, bb, gam, block_t=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gru_fused_matches_xla(rng):
    """Fused ConvGRU kernels (split h/x weights, VMEM-border conv padding,
    band halo DMA) vs the inline XLA GRU math — incl. edge bands."""
    import jax

    from stereoanywhere_tpu.ops.pallas.gru_fused import gru_fused

    b, h, w, ch, cx = 1, 16, 24, 8, 16
    arr = lambda *s, sc=1.0: jnp.asarray((rng.standard_normal(s) * sc).astype(np.float32))  # noqa: E731
    hid, x = arr(b, h, w, ch), arr(b, h, w, cx)
    cz, cr, cq = arr(b, h, w, ch), arr(b, h, w, ch), arr(b, h, w, ch)
    wzr, bzr = arr(3, 3, ch + cx, 2 * ch, sc=0.05), arr(2 * ch)
    wq, bq = arr(3, 3, ch + cx, ch, sc=0.05), arr(ch)

    hx = jnp.concatenate([hid, x], axis=-1)

    def conv(inp, kern, bias):
        y = jax.lax.conv_general_dilated(
            inp, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias

    zr = conv(hx, wzr, bzr)
    z = jax.nn.sigmoid(zr[..., :ch] + cz)
    r = jax.nn.sigmoid(zr[..., ch:] + cr)
    q = jnp.tanh(conv(jnp.concatenate([r * hid, x], axis=-1), wq, bq) + cq)
    ref = (1 - z) * hid + z * q

    got = gru_fused(hid, x, cz, cr, cq, wzr, bzr, wq, bq, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fused level-0 step kernels (ops/pallas/step_fused.py)


def _sf_inputs(rng, b=1, h=32, w2=64, dt=jnp.float32):
    import jax.numpy as jnp  # noqa: F811

    def arr(*shape, scale=1.0):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale, dtype=dt
        )

    hcar = arr(b, h, w2, 128)
    coords0 = jnp.broadcast_to(
        jnp.arange(w2, dtype=jnp.float32)[None, None, :], (b, h, w2)
    )
    coords = coords0 - jnp.abs(
        jnp.asarray(rng.standard_normal((b, h, w2)).astype(np.float32) * 5.0)
    )
    levels_a, levels_b, wl = [], [], w2
    for _ in range(4):
        levels_a.append(arr(b, h, w2, wl))
        levels_b.append(arr(b, h, w2, wl))
        wl //= 2
    return hcar, coords0, coords, levels_a, levels_b, arr


def test_fused_step_head_matches_ref(rng):
    from stereoanywhere_tpu.ops.pallas import step_fused as sf

    h, coords0, coords, la, lb, arr = _sf_inputs(rng)
    kf1, bf1 = arr(3, 3, 128, 256, scale=0.05), arr(256, scale=0.1)
    k2, b2 = arr(3, 3, 256, 2, scale=0.05), arr(2, scale=0.1)
    hw = sf.pack_head_weights(kf1, bf1, k2, b2, jnp.float32)
    cn, cf = sf.fused_step_head(h, coords, la, lb, hw, interpret=True)
    cn_r, cf_r = sf.step_head_ref(h, coords, la, lb, kf1, bf1, k2, b2)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_r), rtol=1e-4, atol=1e-4)


def test_fused_step_motion_matches_ref(rng):
    from stereoanywhere_tpu.ops.pallas import step_fused as sf

    h, coords0, coords, la, lb, arr = _sf_inputs(rng)
    cf = arr(1, 32, 64, 128, scale=0.5)
    cf = cf.at[..., 72:].set(0.0)
    k1, b1 = arr(1, 1, 36, 64, scale=0.1), arr(64, scale=0.1)
    k2c, b2c = arr(3, 3, 64, 64, scale=0.05), arr(64, scale=0.1)
    kcf1, bcf1 = arr(7, 7, 2, 64, scale=0.05), arr(64, scale=0.1)
    kcf2, bcf2 = arr(3, 3, 64, 64, scale=0.05), arr(64, scale=0.1)
    kmc, bmc = arr(3, 3, 192, 126, scale=0.05), arr(126, scale=0.1)
    mw = sf.pack_motion_weights(
        k1, b1, k2c, b2c, kcf1, bcf1, kcf2, bcf2, kmc, bmc, 4, 4, jnp.float32
    )
    flowcols = sf.make_flowcols((coords - coords0).astype(jnp.float32))
    mo = sf.fused_step_motion(cf, flowcols, mw, interpret=True)
    mo_r = sf.step_motion_ref(cf, coords, k1, b1, k2c, b2c, kcf1, bcf1, kcf2, bcf2, kmc, bmc)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(mo_r), rtol=1e-4, atol=1e-4)


def test_fused_step_gru_matches_ref(rng):
    from stereoanywhere_tpu.ops.pallas import step_fused as sf

    h, coords0, coords, la, lb, arr = _sf_inputs(rng)
    mo = arr(1, 32, 64, 128)
    xup = arr(1, 32, 64, 128)
    czrq = arr(1, 32, 64, 384, scale=0.3)
    kz, bz = arr(3, 3, 384, 128, scale=0.05), arr(128, scale=0.1)
    kr, br_ = arr(3, 3, 384, 128, scale=0.05), arr(128, scale=0.1)
    kq, bq = arr(3, 3, 384, 128, scale=0.05), arr(128, scale=0.1)
    gw = sf.pack_gru_weights(kz, bz, kr, br_, kq, bq, jnp.float32)
    hn = sf.fused_step_gru(h, [mo, xup], czrq, gw, interpret=True)
    hn_r = sf.step_gru_ref(h, mo, xup, czrq, kz, bz, kr, br_, kq, bq)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hn_r), rtol=1e-4, atol=1e-5)
