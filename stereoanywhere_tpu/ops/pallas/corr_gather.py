"""Pallas TPU kernel: windowed dual-pyramid correlation lookup via
per-lane dynamic gather.

Replaces the reference's external `corr_sampler` CUDA extension (reference
corr.py:5-29) on the GRU hot loop.  The XLA fallback (ops/corr_lookup.py)
computes each of the (2r+1) taps as a full contraction over the disparity
axis — O(Wl) VPU work and HBM reads per tap per iteration (~0.7 ms/iter at
512x512).  But the taps are a LERP of 2r+2 CONTIGUOUS elements around
floor(coords): this kernel gathers exactly that window with Mosaic's
per-lane `dynamic_gather` (out[s, l] = x[s, idx[s, l]]), then forms the
(2r+1) linearly-interpolated taps with two static lane shifts — O(1) work
per tap instead of O(Wl).

Layout: levels stay in the model's native (B, H, W2, Wl) layout (W2 in
sublanes, disparity in lanes — the gather dimension must span a single
128-lane vreg, so levels with Wl > 128 are processed in 128-lane chunks
whose contributions are masked and summed; levels are zero-padded to a lane
multiple of 128 OUTSIDE the GRU loop so padded reads contribute zero).

Output: (B, H, W2, 2 * n_levels * 16) — each (volume, level) owns a
16-lane-aligned slot [slot*16, slot*16 + 2r+1); the wrapper slices the slots
back to the reference's level-major tap concatenation (corr.py:112-115).

Semantics identical to ops/corr_lookup.py `_lookup_level_gather` (linear
interp, zeros padding, positions outside [0, Wl-1] fade to zero), which is
itself oracle-tested against the reference bilinear_sampler math.

STATUS: compiles and is exact on TPU (tests/test_pallas_kernel.py covers
interpret mode), but MEASURED NO FASTER than the XLA lagged-product path at
512x512/bf16 on v5e: 0.83 ms vs 0.73 ms per iteration pair (a stacked
one-gather-per-row variant and a VMEM-resident lagged-product variant both
measured ~1.0 ms).  Mosaic's `dynamic_gather` moves ~19 elements/cycle and
must gather all 128 lanes per row to use 17, so the gather itself costs as
much as XLA's full tent contractions.  Kept as the reference implementation
for a future Mosaic with narrower gathers; the model uses the XLA path
(ops/corr_lookup.py)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # h-rows per program
_SLOT = 16  # output lanes per (volume, level); requires 2r+2 <= _SLOT


def pad_levels_to_lane_multiple(levels, multiple: int = 128):
    """Zero-pad each level's disparity (last) axis to a multiple of 128.

    Call OUTSIDE the GRU loop: padded columns read as zero in the kernel and
    never contribute (tap validity is computed against the true Wl).
    """
    out = []
    for lvl in levels:
        wl = lvl.shape[-1]
        pad = (-wl) % multiple
        if pad:
            lvl = jnp.pad(lvl, ((0, 0),) * (lvl.ndim - 1) + ((0, pad),))
        out.append(lvl)
    return tuple(out)


def _kernel(num_levels, wls, radius, coords_ref, *refs):
    out_ref = refs[-1]  # (ROWS, W2, 2*num_levels*_SLOT)
    lvl_refs = refs[:-1]  # per volume/level: (ROWS, W2, WlPad)
    k = 2 * radius + 1
    f32 = jnp.float32

    # One (ROWS, W2) -> (W2, ROWS) vreg transpose per program: the gather
    # needs coords per-W2 in SUBLANES while the natural layout has W2 in
    # lanes.
    coords_t = jnp.transpose(coords_ref[:, :])  # (W2, ROWS)

    for hh in range(_ROWS):
        c = coords_t[:, hh : hh + 1]  # (W2, 1)
        for v in range(2):
            for li in range(num_levels):
                wl = wls[li]
                x = lvl_refs[v * num_levels + li][hh]  # (W2, WlPad)
                w2, wl_pad = x.shape
                nc = wl_pad // 128

                posc = c.astype(f32) * (1.0 / (2.0 ** li))  # (W2, 1)
                x0 = jnp.floor(posc)
                frac = posc - x0  # (W2, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (w2, 128), 1)
                # window position p(l) = floor(pos) - r + l  (lane l)
                p = x0.astype(jnp.int32) - radius + lane  # (W2, 128)

                acc = None
                for ci in range(nc):
                    base = 128 * ci
                    idx = jnp.clip(p - base, 0, 127)
                    chunk = jax.lax.slice_in_dim(x, base, base + 128, axis=1)
                    g = jnp.take_along_axis(
                        chunk.astype(f32), idx, axis=1, mode="promise_in_bounds"
                    )
                    sel = ((p >= base) & (p < base + 128)).astype(f32)
                    contrib = g * sel
                    acc = contrib if acc is None else acc + contrib

                # taps: lo = value at p(l), hi = value at p(l)+1 = lane l+1
                lo = jax.lax.slice_in_dim(acc, 0, _SLOT, axis=1)
                hi = jax.lax.slice_in_dim(acc, 1, _SLOT + 1, axis=1)
                pk = jax.lax.slice_in_dim(p, 0, _SLOT, axis=1)
                vlo = ((pk >= 0) & (pk <= wl - 1)).astype(f32)
                vhi = ((pk + 1 >= 0) & (pk + 1 <= wl - 1)).astype(f32)
                out16 = lo * (1.0 - frac) * vlo + hi * frac * vhi
                slot = v * num_levels + li
                out_ref[hh, :, slot * _SLOT : (slot + 1) * _SLOT] = out16.astype(
                    out_ref.dtype
                )


def dual_lookup_windowed(
    levels_a,
    levels_b,
    coords: jax.Array,
    radius: int,
    wls: tuple[int, ...],
    interpret: bool = False,
):
    """Windowed lookup of two same-shape pyramids at shared coords.

    levels_*: tuples of (B, H, W2, WlPad_i) LANE-PADDED levels
    (pad_levels_to_lane_multiple); wls: the TRUE disparity lengths;
    coords: (B, H, W2) x-coordinates.

    Returns (corr_a, corr_b), each (B, H, W2, n_levels*(2r+1)) in the
    reference's level-major tap order.
    """
    num_levels = len(levels_a)
    assert 2 * radius + 2 <= _SLOT, radius
    b, h, w2 = coords.shape
    bh = b * h
    assert bh % _ROWS == 0, f"B*H/4 = {bh} must be a multiple of {_ROWS}"
    dtype = levels_a[0].dtype
    k = 2 * radius + 1

    flat = [lvl.reshape(bh, w2, lvl.shape[-1]) for lvl in (*levels_a, *levels_b)]
    coords_flat = coords.reshape(bh, w2).astype(jnp.float32)

    out_ch = 2 * num_levels * _SLOT
    grid = (bh // _ROWS,)
    in_specs = [
        pl.BlockSpec((_ROWS, w2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(
            (_ROWS, w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        for lvl in flat
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, tuple(wls), radius),
        out_shape=jax.ShapeDtypeStruct((bh, w2, out_ch), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_ROWS, w2, out_ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(coords_flat, *flat)

    out = out.reshape(b, h, w2, out_ch)
    taps_a = [
        out[..., s * _SLOT : s * _SLOT + k] for s in range(num_levels)
    ]
    taps_b = [
        out[..., s * _SLOT : s * _SLOT + k]
        for s in range(num_levels, 2 * num_levels)
    ]
    return jnp.concatenate(taps_a, axis=-1), jnp.concatenate(taps_b, axis=-1)
