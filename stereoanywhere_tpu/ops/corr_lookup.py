"""Correlation-pyramid construction and per-iteration radius-window lookup.

TPU-native replacement for the reference CorrBlock1D (reference corr.py:75-115)
and the external `corr_sampler` CUDA extension (reference corr.py:5-29).

The pyramid is built once per forward (avg-pool-2 over the disparity axis);
each GRU iteration gathers a (2r+1)-tap linearly-interpolated window around
the current disparity estimate from every level.  The gather is expressed as
clipped `take_along_axis` + lerp, which XLA lowers to an efficient dynamic
gather; the (B,H,W2,W3) volume layout keeps the gathered axis in lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.ops.interp import avg_pool_last_axis_2


class CorrPyramid(NamedTuple):
    """Tuple of volumes (B,H,W2,W3/2^i) for i in [0, num_levels)."""

    levels: tuple[jax.Array, ...]
    radius: int


def build_corr_pyramid(volume: jax.Array, num_levels: int = 4, radius: int = 4) -> CorrPyramid:
    """volume (B,H,W2,W3) -> pyramid of `num_levels` levels.

    Reference corr.py:85-91 builds 1+num_levels levels but only indexes the
    first num_levels (corr.py:101); we build exactly what is used.
    """
    levels = [volume]
    for _ in range(num_levels - 1):
        levels.append(avg_pool_last_axis_2(levels[-1]))
    return CorrPyramid(levels=tuple(levels), radius=radius)


def _lookup_level_gather(level: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Gather formulation (reference semantics; good on CPU backends)."""
    wl = level.shape[-1]
    taps = jnp.arange(-radius, radius + 1, dtype=coords.dtype)
    pos = coords[..., None] + taps  # (B,H,W2,2r+1)

    x0 = jnp.floor(pos)
    frac = (pos - x0).astype(level.dtype)
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1

    def tap(idx, weight):
        valid = (idx >= 0) & (idx <= wl - 1)
        safe = jnp.clip(idx, 0, wl - 1)
        vals = jnp.take_along_axis(level, safe, axis=-1)
        return vals * weight * valid.astype(level.dtype)

    return tap(x0i, 1.0 - frac) + tap(x1i, frac)


def _lookup_level_tent(level: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Tent-kernel contraction: identical math to the gather (linear interp,
    zeros padding) expressed as a dense weighted reduction over the disparity
    axis — no data-dependent gathers, so it maps onto the TPU's vector unit
    instead of XLA's scalar dynamic-slice loops.

    out[..., k] = sum_j level[..., j] * max(0, 1 - |j - (coords + dx_k)|)
    """
    wl = level.shape[-1]
    taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    pos = coords.astype(jnp.float32)[..., None] + taps  # (B,H,W2,K)
    j = jnp.arange(wl, dtype=jnp.float32)
    # (B,H,W2,K,Wl) tent weights; the |pos - j| difference must be computed
    # in f32 (bf16 cannot represent index deltas precisely), but the clamped
    # weights are in [0,1] where bf16's 8-bit mantissa costs <0.4% — so the
    # contraction itself can ride the MXU in bf16 when the level is bf16.
    w = jnp.maximum(1.0 - jnp.abs(pos[..., None] - j), 0.0).astype(level.dtype)
    return jnp.einsum(
        "bhwj,bhwkj->bhwk",
        level,
        w,
        preferred_element_type=jnp.float32,
    ).astype(level.dtype)


def _lookup_level_lagged(level: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Lagged-product formulation: all (2r+1) taps share ONE tent array.

    tent(j - (pos + dx_k)) = g[(j - dx_k)] with g[m] = tent(m - pos), so each
    tap is an elementwise product of `level` with a STATICALLY-shifted slice
    of g, reduced over the disparity axis.  Exactly the gather/tent math, but
    HBM traffic is one g array instead of K materialized weight tensors
    (measured: the K-wide einsum materialized 75 MB f32 per level per
    iteration inside the GRU loop).
    """
    wl = level.shape[-1]
    pos = coords.astype(jnp.float32)[..., None]  # (B,H,W2,1)
    # extended support m in [-(r+1), wl + r]
    m = jnp.arange(-(radius + 1), wl + radius + 1, dtype=jnp.float32)
    g = jnp.maximum(1.0 - jnp.abs(m - pos), 0.0).astype(level.dtype)  # (B,H,W2,wl+2r+2)

    outs = []
    for t in range(-radius, radius + 1):
        # g index for level column j is (j - t) + (r+1): a static slice
        start = radius + 1 - t
        g_slice = jax.lax.slice_in_dim(g, start, start + wl, axis=-1)
        outs.append(jnp.sum(level * g_slice, axis=-1, dtype=jnp.float32))
    return jnp.stack(outs, axis=-1).astype(level.dtype)


def _lookup_level(level: jax.Array, coords: jax.Array, radius: int) -> jax.Array:
    """Radius-window linearly-interpolated lookup (reference utils/utils.py:19-35
    bilinear_sampler semantics: zeros padding, positions outside [0, Wl-1]
    fade linearly to 0).  Formulation chosen per backend."""
    if jax.default_backend() == "cpu":
        return _lookup_level_gather(level, coords, radius)
    return _lookup_level_lagged(level, coords, radius)


def _lookup_level_inline_tent_pair(
    level_a: jax.Array, level_b: jax.Array, coords: jax.Array, radius: int
) -> tuple[jax.Array, jax.Array]:
    """Per-tap inline-tent formulation: each tap is one fusion that
    RECOMPUTES its tent weights from (iota, pos) instead of slicing a shared
    materialized g array (the lagged-product path).

    Same math as _lookup_level_lagged / the gather: linear interpolation with
    zeros padding.  Why it can beat the lagged product on TPU: the tent
    weight build is ~5 cheap VPU ops that fuse into the tap's
    multiply-reduce, so each tap's HBM traffic is the LEVEL READ ONLY — the
    lagged path's shared g is itself volume-sized and gets materialized +
    re-read per tap (device trace: ~254 MB/iter vs ~16 MB of unique level
    data at 512x512).  Floor here is K x |levels| (both volumes share one
    weight build per tap).
    """
    pos = coords.astype(jnp.float32)[..., None]  # (B,H,W2,1)
    wl = level_a.shape[-1]
    j = jnp.arange(wl, dtype=jnp.float32)
    outs_a, outs_b = [], []
    for t in range(-radius, radius + 1):
        w = jnp.maximum(1.0 - jnp.abs(j - (pos + t)), 0.0).astype(level_a.dtype)
        outs_a.append(jnp.sum(level_a * w, axis=-1, dtype=jnp.float32))
        outs_b.append(jnp.sum(level_b * w, axis=-1, dtype=jnp.float32))
    return (
        jnp.stack(outs_a, axis=-1).astype(level_a.dtype),
        jnp.stack(outs_b, axis=-1).astype(level_b.dtype),
    )


def _lookup_level_window_pair(
    level_a: jax.Array,
    level_b: jax.Array,
    coords: jax.Array,
    radius: int,
    nb_cap: int = 8,
    inner: str = "inline",
) -> tuple[jax.Array, jax.Array]:
    """Windowed-slab inline-tent lookup: the tent weights of all 2r+1 taps
    are nonzero only inside (pos-r-1, pos+r+1), yet the dense formulations
    evaluate them over the FULL Wl axis (~0.8% useful work at 1024^2 — the
    measured VPU wall, ARCHITECTURE.md "Why the inline-tent lookup...").

    Here the Wl axis is cut into `nb` static blocks; each row first extracts
    a slab of length L = block + 2r + 2 via a one-hot block select (nb
    masked static slices — no data-dependent gather), and the inline tent
    then runs over L lanes instead of Wl:

        c    = clamp(floor((pos - (r+1)) / block), 0, nb-1)
        slab = level_padded[..., c*block : c*block + L]    (one-hot select)
        out[k] = sum_{j<L} slab[j] * max(0, 1 - |j - (pos - c*block) - t_k|)

    Every j with a nonzero tent weight lands inside the slab for any pos
    (incl. the clamped edges, where out-of-range taps fade to zero exactly
    as with zeros padding), so this is bit-identical f32 math to the
    gather/tent/lagged formulations — the removed products are exact zeros.
    Fully differentiable (no Pallas), shared by both volumes per iteration.
    """
    wl = level_a.shape[-1]
    nb = min(nb_cap, wl // 32)
    if nb < 2 or wl % nb or (wl // nb) + 2 * radius + 2 >= wl:
        # tiny or indivisible levels: the dense inline tent is already cheap
        return _lookup_level_inline_tent_pair(level_a, level_b, coords, radius)
    block = wl // nb
    slab_len = block + 2 * radius + 2

    pos = coords.astype(jnp.float32)[..., None]  # (B,H,W2,1)
    c = jnp.clip(
        jnp.floor((pos - (radius + 1)) * (1.0 / block)), 0, nb - 1
    ).astype(jnp.int32)  # (B,H,W2,1) block index

    pad = [(0, 0)] * (level_a.ndim - 1) + [(0, slab_len - block)]
    ap = jnp.pad(level_a, pad)
    bp = jnp.pad(level_b, pad)
    slab_a = jnp.zeros(level_a.shape[:-1] + (slab_len,), level_a.dtype)
    slab_b = jnp.zeros_like(slab_a)
    for bi in range(nb):
        m = c == bi
        slab_a = jnp.where(m, jax.lax.slice_in_dim(ap, bi * block, bi * block + slab_len, axis=-1), slab_a)
        slab_b = jnp.where(m, jax.lax.slice_in_dim(bp, bi * block, bi * block + slab_len, axis=-1), slab_b)

    local = pos - c.astype(jnp.float32) * block  # (B,H,W2,1)
    outs_a, outs_b = [], []
    if inner == "lagged":
        # one shared tent array over the slab's extended support, 2r+1
        # statically-shifted slices (the lagged-product algebra on L lanes
        # instead of Wl — the g array is now slab-sized, not volume-sized)
        m = jnp.arange(-(radius + 1), slab_len + radius + 1, dtype=jnp.float32)
        g = jnp.maximum(1.0 - jnp.abs(m - local), 0.0).astype(level_a.dtype)
        for t in range(-radius, radius + 1):
            start = radius + 1 - t
            gs = jax.lax.slice_in_dim(g, start, start + slab_len, axis=-1)
            outs_a.append(jnp.sum(slab_a * gs, axis=-1, dtype=jnp.float32))
            outs_b.append(jnp.sum(slab_b * gs, axis=-1, dtype=jnp.float32))
    else:
        j = jnp.arange(slab_len, dtype=jnp.float32)
        for t in range(-radius, radius + 1):
            w = jnp.maximum(1.0 - jnp.abs(j - (local + t)), 0.0).astype(level_a.dtype)
            outs_a.append(jnp.sum(slab_a * w, axis=-1, dtype=jnp.float32))
            outs_b.append(jnp.sum(slab_b * w, axis=-1, dtype=jnp.float32))
    return (
        jnp.stack(outs_a, axis=-1).astype(level_a.dtype),
        jnp.stack(outs_b, axis=-1).astype(level_b.dtype),
    )


def _lookup_level_lagged_pair(
    level_a: jax.Array, level_b: jax.Array, coords: jax.Array, radius: int
) -> tuple[jax.Array, jax.Array]:
    """Lagged-product lookup of TWO same-shape volumes at the same coords.

    The tent array g depends only on (coords, Wl) — not on the volume — so
    the stereo and mono lookups of each GRU iteration share one g build and
    one set of static slices (the model always indexes both pyramids at the
    same coords1, reference stereoanywhere.py:270-272)."""
    wl = level_a.shape[-1]
    pos = coords.astype(jnp.float32)[..., None]
    m = jnp.arange(-(radius + 1), wl + radius + 1, dtype=jnp.float32)
    g = jnp.maximum(1.0 - jnp.abs(m - pos), 0.0).astype(level_a.dtype)

    outs_a, outs_b = [], []
    for t in range(-radius, radius + 1):
        start = radius + 1 - t
        g_slice = jax.lax.slice_in_dim(g, start, start + wl, axis=-1)
        outs_a.append(jnp.sum(level_a * g_slice, axis=-1, dtype=jnp.float32))
        outs_b.append(jnp.sum(level_b * g_slice, axis=-1, dtype=jnp.float32))
    return (
        jnp.stack(outs_a, axis=-1).astype(level_a.dtype),
        jnp.stack(outs_b, axis=-1).astype(level_b.dtype),
    )


def lookup_corr_pyramid_pair(
    pyr_a: CorrPyramid, pyr_b: CorrPyramid, coords: jax.Array, impl: str = "lagged"
) -> tuple[jax.Array, jax.Array]:
    """lookup_corr_pyramid for two pyramids sharing the same coords; on TPU
    the per-level tent arrays (lagged) or tent fusions (inline) are shared
    by both volumes.  impl: "lagged" | "inline" | "window" (XLA pair
    functions above) | "mxu" (Pallas single-pass kernel, ops/pallas/corr_mxu.py)."""
    if impl not in ("lagged", "inline", "window", "mxu"):
        raise ValueError(
            f"unknown lookup impl {impl!r}; use lagged|inline|window|mxu (or barrel at the model level)"
        )
    if jax.default_backend() == "cpu":
        return lookup_corr_pyramid(pyr_a, coords), lookup_corr_pyramid(pyr_b, coords)
    if impl == "mxu":
        from stereoanywhere_tpu.ops.pallas.corr_mxu import dual_lookup_mxu

        return dual_lookup_mxu(pyr_a.levels, pyr_b.levels, coords, pyr_a.radius)
    pair_fn = {
        "inline": _lookup_level_inline_tent_pair,
        "window": _lookup_level_window_pair,
        "lagged": _lookup_level_lagged_pair,
    }[impl]
    outs_a, outs_b = [], []
    for i, (la, lb) in enumerate(zip(pyr_a.levels, pyr_b.levels)):
        oa, ob = pair_fn(la, lb, coords / (2 ** i), pyr_a.radius)
        outs_a.append(oa)
        outs_b.append(ob)
    return jnp.concatenate(outs_a, axis=-1), jnp.concatenate(outs_b, axis=-1)


def lookup_corr_pyramid(pyramid: CorrPyramid, coords: jax.Array) -> jax.Array:
    """Index all pyramid levels at `coords` (B,H,W2) (x-coordinate in the
    right image, i.e. coords1 x), returning (B,H,W2, levels*(2r+1)).

    Level i is indexed at coords / 2^i (reference corr.py:105).
    Output channel order matches the reference concatenation: level-major
    [l0 taps..., l1 taps..., ...] (reference corr.py:112-115).
    """
    outs = []
    for i, level in enumerate(pyramid.levels):
        outs.append(_lookup_level(level, coords / (2 ** i), pyramid.radius))
    return jnp.concatenate(outs, axis=-1)
