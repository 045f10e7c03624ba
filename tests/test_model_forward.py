"""Smoke + behavior tests for the full StereoAnywhere forward pass.

Shapes are minimal (32x64: the smallest multiple-of-32 frame the 4-scale
hourglass supports) to keep CPU compile times tractable.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.config import StereoAnywhereConfig
from stereoanywhere_tpu.models import StereoAnywhere


@pytest.fixture(scope="module")
def tiny_inputs():
    rng = np.random.default_rng(1)
    b, h, w = 1, 32, 64
    im2 = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    im3 = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    mde2 = rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32)
    mde3 = rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (im2, im3, mde2, mde3))


@pytest.fixture(scope="module")
def model_and_params(tiny_inputs):
    model = StereoAnywhere(StereoAnywhereConfig())
    variables = model.init(jax.random.PRNGKey(0), *tiny_inputs, iters=1, test_mode=True)
    return model, variables


def test_forward_test_mode(model_and_params, tiny_inputs):
    model, variables = model_and_params

    @jax.jit
    def fwd(v, *args):
        return model.apply(v, *args, iters=2, test_mode=True)

    out = fwd(variables, *tiny_inputs)
    disp = np.asarray(out["disparity"])
    assert disp.shape == (1, 32, 64, 1)
    assert np.isfinite(disp).all()
    assert np.isfinite(np.asarray(out["coarse_dispmono2"])).all()
    assert np.isfinite(np.asarray(out["scale"])).all()
    # determinism
    np.testing.assert_array_equal(np.asarray(fwd(variables, *tiny_inputs)["disparity"]), disp)


@pytest.mark.slow
def test_train_mode_and_gradients(model_and_params, tiny_inputs):
    # volume corruption off: a firing corruption branch detaches the whole
    # corrupted volume (matching reference `.detach()`, stereoanywhere.py:221)
    # which legitimately zeroes fnet grads for that step.
    model = StereoAnywhere(StereoAnywhereConfig(volume_corruption_prob=0.0))
    variables = model_and_params[1]
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out = model.apply(
            {"params": p, **rest},
            *tiny_inputs,
            iters=2,
            test_mode=False,
            train=True,
            rngs={"corruption": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )[0]
        aux = (out["disparities"], out["disparity"])
        loss = (
            jnp.abs(out["disparities"]).mean()
            + jnp.abs(out["coarse_dispmono2"]).mean()
            + jnp.abs(out["coarse_dispmono3"]).mean()
            + jnp.abs(out["coarse_conf2"]).mean()
        )
        return loss, aux

    (loss, (disps, disp)), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert disps.shape == (2, 1, 32, 64, 1)
    assert np.isfinite(np.asarray(disps)).all()
    np.testing.assert_array_equal(np.asarray(disps[-1]), np.asarray(disp))

    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    nonzero = [bool(jnp.abs(g).max() > 0) for g in flat]
    frac = float(np.mean(nonzero))
    # fnet, cnet, hourglass, update block, classifiers all sit on the loss path
    assert frac > 0.9, f"only {frac:.2%} of params got nonzero grads"


def test_batchnorm_running_stats_match_torch(rng):
    """Batch-stat mode (freeze_bn=False): normalization uses the biased batch
    variance but running_var updates with the UNBIASED one, like torch."""
    import torch

    from stereoanywhere_tpu.models.layers import BatchNorm

    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)
    y, mutated = bn.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )

    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))

    np.testing.assert_allclose(
        np.asarray(y), ty.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_nondefault_context_dims_forward(rng):
    """cfg.context_dims must thread into the context encoder; mismatched
    dims used to break the GRU scan carry (64ch hidden vs 128ch cnet)."""
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    cfg = StereoAnywhereConfig(context_dims=(64, 64, 64))
    model = StereoAnywhere(cfg)
    args = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 32, 64, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    variables = jax.jit(lambda k: model.init(k, *args, iters=2, test_mode=True))(
        jax.random.PRNGKey(0)
    )
    out = model.apply(variables, *args, iters=2, test_mode=True)
    assert np.isfinite(np.asarray(out["disparity"])).all()


@pytest.mark.slow
def test_stereo_stack_hourglass_applied(rng):
    """use_aggregate_stereo_vol + n_additional_hourglass: the stereo stack
    loop must create/apply hourglass_stereo_stack_i (identity-first quirk)."""
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    cfg = StereoAnywhereConfig(use_aggregate_stereo_vol=True, n_additional_hourglass=2)
    model = StereoAnywhere(cfg)
    args = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 32, 64, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    variables = jax.jit(lambda k: model.init(k, *args, iters=1, test_mode=True))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]
    assert "hourglass_stereo_stack_1" in params, sorted(params)
    assert "hourglass_mono_stack_1" in params
    assert "hourglass_stereo_stack_0" not in params  # HourglassIdentity slot
    out = model.apply(variables, *args, iters=1, test_mode=True)
    assert np.isfinite(np.asarray(out["disparity"])).all()


def test_paired_feature_encoder_exact():
    """Folded-pair fnet (views in channels, block-diagonal kernels) computes
    the same math as the unpaired path — the extra multiplications are by
    structural zeros — up to conv-implementation reassociation (~1e-5)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.models.extractor import FeatureEncoder

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    paired = FeatureEncoder(64, paired=True)
    unpaired = FeatureEncoder(64, paired=False)
    variables = paired.init(jax.random.PRNGKey(0), x, train=False)
    # identical param paths: the same variables drive both paths
    yp = paired.apply(variables, x, train=False)
    yu = unpaired.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yu), rtol=1e-3, atol=1e-4)


@pytest.mark.xfail(
    reason="JAX 0.9 lowering-cache bug: interpreted pallas_call inside "
    "lax.scan raises KeyError('closed_call', ...) in "
    "cached_primitive_lowerings (the clip/pad sub-jaxprs come from pallas "
    "interpret internals, not model code).  The six kernels are covered "
    "by tests/test_pallas_kernel.py interpret-mode exactness and were "
    "verified compiled-on-device at ~1e-5 vs f32-precision XLA references "
    "(ARCHITECTURE.md fused-step postmortem).",
    strict=False,
)
def test_fused_level0_matches_xla_forward(rng):
    """Full-forward integration: the rotated level-0-fused schedule
    (cfg.fused_level0='interpret', Pallas kernels interpreted on CPU) vs
    the XLA scan body — identical math up to dot reassociation."""
    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    h = w = 64
    ins = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32))
        for c in (3, 3, 1, 1)
    )
    cfg_off = StereoAnywhereConfig(fused_level0="off")
    cfg_on = StereoAnywhereConfig(fused_level0="interpret")
    m_off = StereoAnywhere(cfg_off)
    m_on = StereoAnywhere(cfg_on)
    variables = m_off.init(jax.random.PRNGKey(0), *ins, iters=2, test_mode=True)
    ref = m_off.apply(variables, *ins, iters=3, test_mode=True)["disparity"]
    got = m_on.apply(variables, *ins, iters=3, test_mode=True)["disparity"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_width_pad_align(rng):
    """Internal width alignment (models/stereoanywhere.py geometry fix):
    aligned widths bypass it bit-for-bit; unaligned wide inputs produce the
    input's shape and match the unpadded model away from the padded edge."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    h, w = 32, 96  # W/4 = 24, not a multiple of 16 -> pads to 128 wide
    ins = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32))
        for c in (3, 3, 1, 1)
    )
    cfg_off = StereoAnywhereConfig(width_pad_align=0, fused_level0="off")
    cfg_on = dataclasses.replace(cfg_off, width_pad_align=64, width_pad_min=96)
    m_off, m_on = StereoAnywhere(cfg_off), StereoAnywhere(cfg_on)
    variables = m_off.init(jax.random.PRNGKey(0), *ins, iters=1, test_mode=True)
    got = np.asarray(
        m_on.apply(variables, *ins, iters=2, test_mode=True)["disparity"]
    )
    assert got.shape == (1, h, w, 1)
    assert np.isfinite(got).all()
    # exact equivalence: auto-pad(raw) == crop(no-pad(edge-padded input))
    ins_p = tuple(
        jnp.asarray(np.pad(np.asarray(x), ((0, 0), (0, 0), (0, 128 - w), (0, 0)), mode="edge"))
        for x in ins
    )
    ref = np.asarray(
        m_off.apply(variables, *ins_p, iters=2, test_mode=True)["disparity"]
    )[:, :, :w]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
