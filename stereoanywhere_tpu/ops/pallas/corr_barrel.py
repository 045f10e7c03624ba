"""Pallas TPU kernel: single-pass dual-pyramid BARREL-SHIFT lookup.

Fifth formulation of the GRU-loop correlation lookup.  Measured history
(tools/profile_lookup.py, v5e, 512^2/bf16, per iteration-pair):

  - XLA lagged (in-model default)   ~0.2 ms standalone, but ~2 ms/iter
    in-model at 1024^2 (device trace): each tap fusion re-reads the volume
    levels from HBM (~13x re-read).
  - pl-tent   0.39 ms  (dense in-kernel tent: VPU-bound, 99% zeros)
  - pl-gather           (per-tap dynamic gathers: Mosaic gather-bound)
  - pl-lag    0.53 ms  (lagged product in VMEM: single-pass traffic, but
    each of the 9 taps pays a cross-lane `jnp.sum` over Wl lanes =
    ~log2(Wl) full-width VPU ops PER TAP — the reduction is the wall)

This kernel removes the reduction entirely.  Observation: the 9 taps of a
row are 9 *contiguous* linearly-interpolated samples around one per-row
integer base, so the whole window can be brought to static lanes by ONE
per-row circular rotation of the level row:

    base = floor(pos),  s = (base - r) mod Wl
    rot[l] = level[(l + s) mod Wl]          (barrel shift)
    tap_t  = (1-frac) * rot[t+r] * v0_t  +  frac * rot[t+r+1] * v1_t

The per-row dynamic rotation is a log2(Wl)-step barrel shifter: for each
bit k of s, conditionally `pltpu.roll` by 2^k (a hardware lane rotate)
under a per-row `where`.  Total work per element is ~log2(Wl) x
(rotate + select) ONCE — shared by all 9 taps — instead of 9 cross-lane
reductions, at the same minimal single-pass HBM traffic.

Mosaic's lane rotate only exists for 32-bit element types ("Rotate with
non-32-bit data" otherwise), so the bf16 path PACKS the two volumes
together: volume-a and volume-b rows are interleaved along sublanes
(2w = a[w], 2w+1 = b[w]) and `pltpu.bitcast` to int32 — which packs
exactly sublane pairs (2s, 2s+1) into one 32-bit lane register (verified
on v5e) — so ONE i32 barrel shift rotates both volumes' rows at half the
register volume of even a single f32 volume.  Both volumes are indexed at
the same coords (reference stereoanywhere.py:270-272), so they share s.

Out-of-range positions are zeroed by the validity masks v0/v1 (reference
bilinear_sampler zeros-padding semantics, reference corr.py:93-115,
utils/utils.py:19-35), so the circular wraparound never leaks data.

Output: the reference's level-major tap concatenation per volume
(reference corr.py:112-115), like ops/corr_lookup.py.

STATUS: exact on TPU (1 bf16 ulp vs the XLA path; it keeps the blend
weights in f32 where the XLA path rounds the tent to bf16), but MEASURED
SLOWER than the XLA formulations (tools/profile_lookup.py, v5e bf16):
0.650 ms @512^2 / 3.518 ms @1024^2 per iteration-pair vs XLA lagged
0.185 / 1.544 and inline 0.180 / 0.964.  Mosaic lowers each conditional
rotate step to multi-op lane shuffles, so the log2(Wl) barrel steps cost
far more than the arithmetic they replace.  Fifth and final Pallas
formulation: the sweep (tent / gather / lagged / barrel) establishes that
on this hardware generation the XLA fusions win this op; the model keeps
the XLA path ("auto"), with `lookup_impl="barrel"` available for
re-evaluation on future hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 4  # rows per grid step (VMEM budget; see corr_tent.py)
_SLOT = 16  # lanes per (volume, level) slot; requires 2r+1 <= 16


def _barrel_rotate(x: jax.Array, s: jax.Array, nbits: int) -> jax.Array:
    """rot[..., l] = x[..., (l + s) mod Wl] via log-step conditional rotates.

    s: int32 (..., W2) in [0, Wl).  Roll semantics are out[i] = x[i - shift],
    so rotating left by 2^k uses shift Wl - 2^k.
    """
    wl = x.shape[-1]
    for k in range(nbits):
        bit = ((s >> k) & 1).astype(jnp.bool_)[..., None]
        rolled = pltpu.roll(x, (wl - (1 << k)) % wl, axis=x.ndim - 1)
        x = jnp.where(bit, rolled, x)
    return x


def _blend_taps(rot, pos, wl, radius, out_dtype):
    """Linear-interp blend + validity masking of the rotated window.

    rot: (..., R, Wl_pad) with window lanes 0..2r+1 = level[base-r..base+r+1]
    pos: (..., R) f32 positions; wl: logical level width.
    Returns (..., R, _SLOT) slot-padded taps.
    """
    f32 = jnp.float32
    k = 2 * radius + 1
    base = jnp.floor(pos)
    frac = (pos - base)[..., None]  # f32 (..., R, 1)
    idx0 = base.astype(jnp.int32)[..., None] + (
        jax.lax.broadcasted_iota(jnp.int32, (*pos.shape, k), pos.ndim) - radius
    )
    v0 = ((idx0 >= 0) & (idx0 < wl)).astype(f32)
    v1 = ((idx0 >= -1) & (idx0 < wl - 1)).astype(f32)
    w0 = jax.lax.slice_in_dim(rot, 0, k, axis=-1).astype(f32)
    w1 = jax.lax.slice_in_dim(rot, 1, k + 1, axis=-1).astype(f32)
    taps = (1.0 - frac) * w0 * v0 + frac * w1 * v1
    pad = jnp.zeros((*pos.shape, _SLOT - k), dtype=out_dtype)
    return jnp.concatenate([taps.astype(out_dtype), pad], axis=-1)


def _kernel_plain(num_levels, radius, wls, coords_ref, *refs):
    """32-bit data (f32 levels) or interpret mode: rotate each volume
    directly."""
    out_ref = refs[-1]
    lvl_refs = refs[:-1]
    pos0 = coords_ref[..., 0].astype(jnp.float32)  # (ROWS, W2)
    k = 2 * radius + 1

    for li in range(num_levels):
        xa = lvl_refs[li][...]  # (ROWS, W2, Wl_pad)
        xb = lvl_refs[num_levels + li][...]
        wl = wls[li]
        wl_pad = xa.shape[-1]
        nbits = max((wl_pad - 1).bit_length(), 1)
        pos = pos0 * (1.0 / (2.0**li))
        s = jnp.mod(jnp.floor(pos).astype(jnp.int32) - radius, wl_pad)

        rot_a = _barrel_rotate(xa, s, nbits)
        rot_b = _barrel_rotate(xb, s, nbits)
        out_ref[:, :, li * _SLOT : (li + 1) * _SLOT] = _blend_taps(
            rot_a, pos, wl, radius, out_ref.dtype
        )
        slot_b = num_levels + li
        out_ref[:, :, slot_b * _SLOT : (slot_b + 1) * _SLOT] = _blend_taps(
            rot_b, pos, wl, radius, out_ref.dtype
        )


def _kernel_packed(num_levels, radius, wls, coords_ref, coords2_ref, *refs):
    """bf16 path: levels arrive volume-interleaved along sublanes
    (ROWS, 2*W2, Wl); bitcast to i32 (ROWS, W2, Wl) and rotate once."""
    out_ref = refs[-1]  # (ROWS, 2*W2, num_levels*_SLOT)
    lvl_refs = refs[:-1]
    pos0 = coords_ref[..., 0].astype(jnp.float32)  # (ROWS, W2)
    pos2_0 = coords2_ref[..., 0].astype(jnp.float32)  # (ROWS, 2*W2)

    for li in range(num_levels):
        x = lvl_refs[li][...]  # (ROWS, 2*W2, Wl_pad) bf16 interleaved
        wl = wls[li]
        wl_pad = x.shape[-1]
        nbits = max((wl_pad - 1).bit_length(), 1)
        pos = pos0 * (1.0 / (2.0**li))
        s = jnp.mod(jnp.floor(pos).astype(jnp.int32) - radius, wl_pad)

        xi = pltpu.bitcast(x, jnp.int32)  # (ROWS, W2, Wl_pad)
        xi = _barrel_rotate(xi, s, nbits)
        rot = pltpu.bitcast(xi, jnp.bfloat16)  # (ROWS, 2*W2, Wl_pad)

        pos2 = pos2_0 * (1.0 / (2.0**li))
        out_ref[:, :, li * _SLOT : (li + 1) * _SLOT] = _blend_taps(
            rot, pos2, wl, radius, out_ref.dtype
        )


def _prep_level(lvl, bh, w2, radius):
    # The window slice needs >= 2r+2 lanes; zero-pad tiny levels.  The
    # validity masks use the LOGICAL width, so padding never leaks.
    flat = lvl.reshape(bh, w2, lvl.shape[-1])
    if lvl.shape[-1] < 2 * radius + 2:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, 2 * radius + 2 - lvl.shape[-1])))
    return flat


def pack_pyramid_pair(levels_a, levels_b, radius: int):
    """Interleave two same-shape pyramids along sublanes for the packed
    bf16 kernel: level i becomes (B*H, 2*W2, Wl_i) with sublane 2w = a[w],
    2w+1 = b[w].  Done ONCE outside the GRU loop (the levels are
    loop-invariant); `lookup_packed_pair` consumes the result every
    iteration."""
    b, h, w2, _ = levels_a[0].shape
    bh = b * h
    return tuple(
        jnp.stack(
            [_prep_level(la, bh, w2, radius), _prep_level(lb, bh, w2, radius)], axis=2
        ).reshape(bh, 2 * w2, max(la.shape[-1], 2 * radius + 2))
        for la, lb in zip(levels_a, levels_b)
    )


def lookup_packed_pair(packed_levels, coords: jax.Array, radius: int, wls, interpret: bool = False):
    """Barrel-shift lookup on pre-packed (pack_pyramid_pair) bf16 levels.

    coords: (B, H, W2); wls: the LOGICAL level widths (before tiny-level
    padding).  Returns (corr_a, corr_b) as in dual_lookup_barrel.
    """
    num_levels = len(packed_levels)
    b, h, w2 = coords.shape
    bh = b * h
    assert bh % _ROWS == 0, f"B*H/4 = {bh} must be a multiple of {_ROWS}"
    dtype = packed_levels[0].dtype
    k = 2 * radius + 1

    coords_flat = coords.reshape(bh, w2, 1).astype(jnp.float32)
    coords2 = jnp.repeat(coords_flat, 2, axis=1)  # (bh, 2*W2, 1)
    out_ch = num_levels * _SLOT
    in_specs = [
        pl.BlockSpec((_ROWS, w2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_ROWS, 2 * w2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((_ROWS, 2 * w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for lvl in packed_levels
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_packed, num_levels, radius, tuple(wls)),
        out_shape=jax.ShapeDtypeStruct((bh, 2 * w2, out_ch), dtype),
        grid=(bh // _ROWS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_ROWS, 2 * w2, out_ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(coords_flat, coords2, *packed_levels)
    out = out.reshape(b, h, w2, 2, out_ch)
    taps_a = [out[..., 0, s * _SLOT : s * _SLOT + k] for s in range(num_levels)]
    taps_b = [out[..., 1, s * _SLOT : s * _SLOT + k] for s in range(num_levels)]
    return jnp.concatenate(taps_a, axis=-1), jnp.concatenate(taps_b, axis=-1)


def dual_lookup_barrel(levels_a, levels_b, coords: jax.Array, radius: int, interpret: bool = False):
    """Single-pass barrel-shift lookup of two same-shape pyramids at shared
    coords.

    levels_*: tuples of (B, H, W2, Wl_i); coords: (B, H, W2) x-coordinates.
    Returns (corr_a, corr_b), each (B, H, W2, n_levels*(2r+1)) in the
    reference's level-major tap order (reference corr.py:112-115).
    """
    num_levels = len(levels_a)
    assert 2 * radius + 1 <= _SLOT, radius
    b, h, w2 = coords.shape
    bh = b * h
    assert bh % _ROWS == 0, f"B*H/4 = {bh} must be a multiple of {_ROWS}"
    dtype = levels_a[0].dtype
    k = 2 * radius + 1
    wls = tuple(lvl.shape[-1] for lvl in levels_a)
    packed = dtype == jnp.bfloat16 and not interpret

    coords_flat = coords.reshape(bh, w2, 1).astype(jnp.float32)

    if packed:
        packed_levels = pack_pyramid_pair(levels_a, levels_b, radius)
        return lookup_packed_pair(packed_levels, coords, radius, wls, interpret=interpret)

    flat = [_prep_level(lvl, bh, w2, radius) for lvl in (*levels_a, *levels_b)]
    out_ch = 2 * num_levels * _SLOT
    in_specs = [pl.BlockSpec((_ROWS, w2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((_ROWS, w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for lvl in flat
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_plain, num_levels, radius, wls),
        out_shape=jax.ShapeDtypeStruct((bh, w2, out_ch), dtype),
        grid=(bh // _ROWS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_ROWS, w2, out_ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_flat, *flat)

    out = out.reshape(b, h, w2, out_ch)
    taps_a = [out[..., s * _SLOT : s * _SLOT + k] for s in range(num_levels)]
    taps_b = [out[..., s * _SLOT : s * _SLOT + k] for s in range(num_levels, 2 * num_levels)]
    return jnp.concatenate(taps_a, axis=-1), jnp.concatenate(taps_b, axis=-1)
