"""Pallas TPU kernel: single-pass dual-pyramid tent-contraction lookup.

The GRU loop's per-iteration correlation lookup (ops/corr_lookup.py
lagged-product path) is numerically a tent contraction per tap:

    tap_t[.., w2] = sum_j level[.., w2, j] * max(0, 1 - |j - pos/2^l - t|)

XLA compiles the 9-tap x 4-level x 2-volume bundle into ~7 fusions that
EACH re-read the volume levels — ~254 MB of HBM traffic per GRU iteration
against ~16 MB of unique level data (device-trace finding, ~340 us/iter).
This kernel performs the whole bundle in ONE pass: each grid step holds an
8-row block of every level of BOTH pyramids in VMEM and emits all
2*4*(2r+1) taps, so each level byte is read from HBM exactly once.

Semantics: identical to ops/corr_lookup.py `_lookup_level_tent` (linear
interpolation, zeros padding, positions outside [0, Wl-1] fade to zero),
which is oracle-tested against the reference bilinear_sampler math
(reference corr.py:93-115, utils/utils.py:19-35).

Output layout: (B, H, W2, 2*n_levels*16) — each (volume, level) owns a
16-lane-aligned slot holding its 2r+1 taps; `dual_lookup_tent` slices the
slots back into the reference's level-major concatenation.

STATUS: compiles and is exact on TPU, but MEASURED SLOWER than the XLA
lagged-product path in a data-dependent scan at 512^2/bf16 on v5e:
1006 us vs 680 us per iteration pair (and the in-model fused XLA cost is
lower still, ~340 us).  The single-pass traffic saving is real but the
kernel is VPU-COMPUTE-bound: building the dense tent costs ~6 VPU ops per
(tap, element) and 99% of the tent weights are zero — the same wall every
Pallas lookup formulation has hit (see ops/pallas/corr_gather.py for the
dynamic-gather variant, bottlenecked on Mosaic gather throughput instead).
Kept as the reference single-pass implementation; the model uses the XLA
path (ops/corr_lookup.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 4  # rows per grid step: 8 exceeded the 16 MB scoped-vmem limit
_SLOT = 16  # lanes per (volume, level) slot; requires 2r+1 <= 16


def _kernel(num_levels, radius, coords_ref, *refs):
    out_ref = refs[-1]
    lvl_refs = refs[:-1]
    f32 = jnp.float32
    pos0 = coords_ref[..., 0].astype(f32)  # (ROWS, W2)

    for v in range(2):
        for li in range(num_levels):
            x = lvl_refs[v * num_levels + li][...]  # (ROWS, W2, Wl)
            wl = x.shape[-1]
            pos = pos0 * (1.0 / (2.0 ** li))
            # int32 iota (Mosaic requires integer iota results), then cast
            d = (
                jax.lax.broadcasted_iota(jnp.int32, x.shape, 2).astype(f32)
                - pos[..., None]
            )  # (ROWS, W2, Wl)
            taps = []
            for t in range(-radius, radius + 1):
                # bf16 product + f32 accumulate: identical to the XLA
                # lagged-product path (corr_lookup.py:107)
                w = jnp.maximum(1.0 - jnp.abs(d - t), 0.0).astype(x.dtype)
                taps.append(jnp.sum((x * w).astype(f32), axis=-1))  # (ROWS, W2)
            k = len(taps)
            block = jnp.stack(
                taps + [jnp.zeros_like(taps[0])] * (_SLOT - k), axis=-1
            )  # (ROWS, W2, _SLOT)
            slot = v * num_levels + li
            out_ref[:, :, slot * _SLOT : (slot + 1) * _SLOT] = block.astype(
                out_ref.dtype
            )


def dual_lookup_tent(
    levels_a, levels_b, coords: jax.Array, radius: int, interpret: bool = False
):
    """Single-pass lookup of two same-shape pyramids at shared coords.

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

    flat = [lvl.reshape(bh, w2, lvl.shape[-1]) for lvl in (*levels_a, *levels_b)]
    # trailing singleton: with ROWS < 8 a 2-D (ROWS, W2) block violates the
    # (8, 128) tile rule; (ROWS, W2, 1) keeps W2 in the sublane dim.
    coords_flat = coords.reshape(bh, w2, 1).astype(jnp.float32)

    out_ch = 2 * num_levels * _SLOT
    in_specs = [
        pl.BlockSpec((_ROWS, w2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(
            (_ROWS, w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        for lvl in flat
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, radius),
        out_shape=jax.ShapeDtypeStruct((bh, w2, out_ch), dtype),
        grid=(bh // _ROWS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (_ROWS, w2, out_ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(coords_flat, *flat)

    out = out.reshape(b, h, w2, out_ch)
    taps_a = [out[..., s * _SLOT : s * _SLOT + k] for s in range(num_levels)]
    taps_b = [
        out[..., s * _SLOT : s * _SLOT + k]
        for s in range(num_levels, 2 * num_levels)
    ]
    return jnp.concatenate(taps_a, axis=-1), jnp.concatenate(taps_b, axis=-1)
