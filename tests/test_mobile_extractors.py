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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Golden numerics vs the torch reference (timm-free blocks).
#
# The MobileNet TRUNKS have no numerical oracle in this environment: the
# reference builds them via `timm.create_model` (submodule.py:166,231) and
# timm is not installed (nor are its ImageNet checkpoints reachable — zero
# egress).  They are also never shipped (instantiation commented out at
# reference stereoanywhere.py:56,123), so weight parity has no consumer; the
# trunk tests above pin the architecture (stage/stride/channel contract)
# instead.  Everything BELOW the trunks — Conv2x and FeatureAtt, the blocks
# the extractors add around timm — is torch-source-defined in submodule.py,
# so those ARE golden-tested here with converted random weights.


def _torch_submodule():
    from tests.reference_loader import load_reference_stereo_module

    load_reference_stereo_module()
    import importlib

    return importlib.import_module("models.stereoanywhere.submodule")


def test_conv2x_golden_vs_reference(rng):
    """Conv2x (deconv and downsample variants) matches reference
    submodule.py:55-94 with converted weights."""
    import torch as T

    sm = _torch_submodule()
    from stereoanywhere_tpu.compat.torch_convert import _conv2d, _convT2d

    for deconv in (True, False):
        T.manual_seed(int(deconv))
        ref = sm.Conv2x(8, 12, deconv=deconv)
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        variables = {
            "params": {
                "conv1": {"conv": {"kernel": jnp.asarray(
                    (_convT2d if deconv else _conv2d)(sd["conv1.conv.weight"])
                )}},
                "conv2": {"conv": {"kernel": jnp.asarray(_conv2d(sd["conv2.conv.weight"]))}},
            }
        }
        if deconv:
            x_np = rng.standard_normal((2, 6, 9, 8)).astype(np.float32)
            rem_np = rng.standard_normal((2, 12, 18, 12)).astype(np.float32)
        else:
            x_np = rng.standard_normal((2, 12, 18, 8)).astype(np.float32)
            rem_np = rng.standard_normal((2, 6, 9, 12)).astype(np.float32)
        with T.no_grad():
            want = ref(
                T.from_numpy(x_np).permute(0, 3, 1, 2),
                T.from_numpy(rem_np).permute(0, 3, 1, 2),
            ).permute(0, 2, 3, 1).numpy()
        m = Conv2x(12, deconv=deconv)
        got = np.asarray(m.apply(variables, jnp.asarray(x_np), jnp.asarray(rem_np)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_feature_att_golden_vs_reference(rng):
    """FeatureAtt matches reference submodule.py:96-111 with converted
    weights (volume layout: ours (B,D,H,W,C) vs reference (B,C,D,H,W))."""
    import torch as T

    sm = _torch_submodule()
    from stereoanywhere_tpu.compat.torch_convert import _conv2d

    T.manual_seed(2)
    ref = sm.FeatureAtt(cv_chan=6, feat_chan=16)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = {
        "params": {
            "feat_att_0": {"conv": {"kernel": jnp.asarray(_conv2d(sd["feat_att.0.conv.weight"]))}},
            "feat_att_1": {
                "kernel": jnp.asarray(_conv2d(sd["feat_att.1.weight"])),
                "bias": jnp.asarray(sd["feat_att.1.bias"]),
            },
        }
    }
    cv_np = rng.standard_normal((2, 5, 6, 9, 6)).astype(np.float32)  # B,D,H,W,C
    feat_np = rng.standard_normal((2, 6, 9, 16)).astype(np.float32)
    with T.no_grad():
        want = ref(
            T.from_numpy(cv_np).permute(0, 4, 1, 2, 3),
            T.from_numpy(feat_np).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 4, 1).numpy()
    m = FeatureAtt(6)
    got = np.asarray(m.apply(variables, jnp.asarray(cv_np), jnp.asarray(feat_np)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
