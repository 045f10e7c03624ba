"""Alternate MobileNet feature extractors: shapes, channels, and the Conv2x /
FeatureAtt building blocks (reference submodule.py:55-111,161-293)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.models.mobile_extractors import (
    Conv2x,
    Feature,
    FeatureAtt,
    FeatureV4,
)


def _img(rng, h=64, w=96, c=3):
    return jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32))


def test_feature_mnv2_pyramid_shapes(rng):
    """[x4,x8,x16,x32] channels [48,64,192,160] (reference submodule.py:176-196)."""
    x = _img(rng)
    m = Feature()
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [
        (1, 16, 24, 48),
        (1, 8, 12, 64),
        (1, 4, 6, 192),
        (1, 2, 3, 160),
    ]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


@pytest.mark.parametrize(
    "nd,want_chans",
    [(3, [128, 192, 128]), (2, [64, 128, 192, 128]), (1, [64, 64, 128, 192, 128]),
     (0, [64, 64, 64, 128, 192, 128])],
)
def test_featurev4_scales_and_channels(rng, nd, want_chans):
    """Per-n_downsample channel lists match the reference comments
    (submodule.py:278-291)."""
    x = _img(rng)
    m = FeatureV4(img_channels=3, n_downsample=nd)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == want_chans
    # scales: finest output is /2**nd (x1 for nd=0)
    finest = outs[0]
    assert finest.shape[1] == 64 // max(2 ** nd, 1)


def test_conv2x_updown_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 32)).astype(np.float32))
    rem = jnp.asarray(rng.standard_normal((1, 16, 24, 16)).astype(np.float32))
    m = Conv2x(16, deconv=True)
    v = m.init(jax.random.PRNGKey(0), x, rem)
    y = m.apply(v, x, rem)
    assert y.shape == (1, 16, 24, 32)  # concat doubles channels

    md = Conv2x(24, deconv=False)
    vd = md.init(jax.random.PRNGKey(0), rem, jnp.zeros((1, 8, 12, 24)))
    yd = md.apply(vd, rem, jnp.zeros((1, 8, 12, 24)))
    assert yd.shape == (1, 8, 12, 48)


def test_feature_att_gates_volume(rng):
    cv = jnp.asarray(rng.standard_normal((1, 16, 8, 12, 8)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((1, 8, 12, 32)).astype(np.float32))
    m = FeatureAtt(8)
    v = m.init(jax.random.PRNGKey(0), cv, feat)
    y = m.apply(v, cv, feat)
    assert y.shape == cv.shape
    # sigmoid gate: |out| <= |in| elementwise
    assert (np.abs(np.asarray(y)) <= np.abs(np.asarray(cv)) + 1e-6).all()
