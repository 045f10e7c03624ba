"""Cost-volume ops: all-pairs correlation, depth-bin masks, soft-argmax
disparity regression, entropy confidence, mirror detection and truncation.

Volume layout: (B, H, W2, W3) — left pixel axis W2, right (disparity
hypothesis) axis W3 in the trailing, lane-aligned position so softmax /
expectation reductions ride the VPU lanes and the all-pairs build is a
batched MXU matmul.

Reference shapes are (B, 1, H, W2, W3) (reference corr.py:117-132).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def all_pairs_correlation(feat_left: jax.Array, feat_right: jax.Array) -> jax.Array:
    """All-pairs 1-D correlation volume.

    feat_left (B,H,W2,C), feat_right (B,H,W3,C) -> (B,H,W2,W3), scaled by
    1/sqrt(C) (reference corr.py:117-132 einsum('aijk,aijh->ajkh')/sqrt(D)).
    This contracts over C per (B,H) pair: a batched matmul on the MXU.
    """
    c = feat_left.shape[-1]
    # precision HIGHEST: keep f32 inputs in f32 on the MXU (JAX's default
    # matmul precision silently downcasts f32 operands).  bf16 operands
    # still take the native bf16-multiply/f32-accumulate path.
    vol = jnp.einsum(
        "bhwc,bhvc->bhwv",
        feat_left,
        feat_right,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (vol / math.sqrt(c)).astype(feat_left.dtype)


def generate_masks(mde: jax.Array, n: int) -> jax.Array:
    """N one-hot depth-bin masks from normalized mono depth.

    mde (B,H,W,1) in [0,1] -> (B,H,W,N) with mask_i = [i/N <= mde < (i+1)/N]
    (reference utils/utils.py:48-54; the reference stores float16, we keep the
    compute dtype).
    """
    edges = jnp.arange(n, dtype=mde.dtype) / n
    lo = mde >= edges  # (B,H,W,N) via broadcast of (B,H,W,1) vs (N,)
    hi = mde < (edges + 1.0 / n)
    return (lo & hi).astype(mde.dtype)


def apply_bin_masks(volume: jax.Array, left_masks: jax.Array, right_masks: jax.Array) -> jax.Array:
    """Mask a volume per depth bin: (B,H,W2,W3) x (B,H,W2,N) x (B,H,W3,N)
    -> (B,H,W2,W3,N).

    Reference stereoanywhere.py:148,161:
    `vol * left_masks.unsqueeze(4) * right_masks.unsqueeze(3)`.
    """
    return (
        volume[..., None] * left_masks[:, :, :, None, :] * right_masks[:, :, None, :, :]
    )


def _softmax_expectation(volume: jax.Array, axis: int) -> jax.Array:
    """E[index] under softmax(volume) along `axis`."""
    prob = jax.nn.softmax(volume, axis=axis)
    idx = jnp.arange(volume.shape[axis], dtype=volume.dtype)
    shape = [1] * volume.ndim
    shape[axis] = volume.shape[axis]
    return jnp.sum(prob * idx.reshape(shape), axis=axis)


def estimate_left_disparity(volume: jax.Array) -> jax.Array:
    """Soft-argmax left disparity from (B,H,W2,W3) -> (B,H,W2,1).

    disp_left[x2] = x2 - E_softmax[x3] (reference utils/utils.py:112-131).
    """
    exp_x3 = _softmax_expectation(volume, axis=3)  # (B,H,W2)
    xs = jnp.arange(volume.shape[2], dtype=volume.dtype)[None, None, :]
    return (xs - exp_x3)[..., None]


def estimate_right_disparity(volume: jax.Array) -> jax.Array:
    """Soft-argmax right disparity from (B,H,W2,W3) -> (B,H,W3,1).

    disp_right[x3] = E_softmax[x2] - x3 (reference utils/utils.py:133-152).
    """
    exp_x2 = _softmax_expectation(volume, axis=2)  # (B,H,W3)
    xs = jnp.arange(volume.shape[3], dtype=volume.dtype)[None, None, :]
    return (exp_x2 - xs)[..., None]


def _entropy_confidence(volume: jax.Array, axis: int) -> jax.Array:
    prob = jax.nn.softmax(volume, axis=axis)
    ent = -jnp.sum(prob * jnp.log2(prob + 1e-6), axis=axis)
    return 1.0 - ent / math.log2(volume.shape[axis])


def estimate_left_confidence(volume: jax.Array) -> jax.Array:
    """1 - normalized Shannon entropy over W3 (reference utils/utils.py:154-161)."""
    return _entropy_confidence(volume, axis=3)[..., None]


def estimate_right_confidence(volume: jax.Array) -> jax.Array:
    """1 - normalized Shannon entropy over W2 (reference utils/utils.py:163-170)."""
    return _entropy_confidence(volume, axis=2)[..., None]


def gauss_corr_volume(disp_left: jax.Array, gauss_k: float | jax.Array = 10.0, gauss_c: float = 1.0) -> jax.Array:
    """Synthetic Gaussian volume peaked at x2 - disp (reference utils/utils.py:200-214).

    disp_left (B,H,W,1) -> (B,H,W,W).
    """
    w = disp_left.shape[2]
    xs = jnp.arange(w, dtype=disp_left.dtype)
    center = xs[None, None, :, None] - disp_left  # (B,H,W,1): matched x3 position
    delta = center - xs[None, None, None, :]      # (B,H,W2,W3)
    return gauss_k * jnp.exp(-(delta**2) / (2 * gauss_c**2))


def truncate_corr_volume(
    disp_left: jax.Array,
    conf_left: jax.Array,
    conf_th: float | None = None,
    attenuation_gain: float = 0.1,
) -> jax.Array:
    """Sigmoid ramp attenuating volume cells BEHIND the (mirror-confident)
    mono surface (reference utils/utils.py:216-238 truncate_corr_volume_v2).

    disp_left, conf_left (B,H,W,1) -> multiplicative mask (B,H,W2,W3).
    Where confident, cells at x3 < x2 - disp (behind the surface) are scaled
    toward `attenuation_gain`; elsewhere the mask is 1.
    """
    w = disp_left.shape[2]
    xs = jnp.arange(w, dtype=disp_left.dtype)
    if conf_th is not None:
        conf_left = (conf_left > conf_th).astype(disp_left.dtype)
    center = xs[None, None, :, None] - disp_left        # (B,H,W2,1)
    ramp = center - xs[None, None, None, :]             # (B,H,W2,W3)
    att = jax.nn.sigmoid(ramp) * (1.0 - attenuation_gain) + attenuation_gain
    return (1.0 - conf_left) + conf_left * att


def handcrafted_mirror_detector(
    stereo_disp: jax.Array,
    mono_disp: jax.Array,
    stereo_conf: jax.Array,
    mono_conf: jax.Array,
    conf_th: float = 0.5,
    step_gain: float = 20.0,
) -> jax.Array:
    """Fuzzy mirror detector (reference utils/utils.py:255-269).

    Rule: (mono >> stereo AND both-confident) OR (mono-confident AND NOT
    stereo-confident), sharpened through sigmoid gates.
    """
    from stereoanywhere_tpu.ops.fuzzy import fuzzy_and, fuzzy_not, fuzzy_or

    both_conf = fuzzy_and(stereo_conf, mono_conf)
    mono_near = jax.nn.sigmoid(step_gain * (mono_disp - stereo_disp))
    mono_better_a = fuzzy_and(both_conf, mono_near)
    mono_better_b = fuzzy_and(fuzzy_not(stereo_conf), mono_conf)
    mono_better = fuzzy_or(mono_better_a, mono_better_b)
    return jax.nn.sigmoid(step_gain * (mono_better - conf_th))
