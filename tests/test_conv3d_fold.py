"""Banded-fold conv3d lowering vs direct lax conv3d (exact same math)."""
import numpy as np
import pytest

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
