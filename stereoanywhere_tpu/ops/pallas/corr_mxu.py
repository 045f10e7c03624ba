"""Pallas TPU kernel: lagged-product lookup with MXU-mapped tap reductions.

Sixth formulation of the GRU-loop correlation lookup.  Same lagged-product
algebra as ops/pallas/corr_lagged.py (shared tent array g per level, each
tap a statically-shifted slice — reference corr.py:93-115 semantics, linear
interpolation with zeros padding), but the reduction over the disparity
axis — the measured wall of the previous kernel (its per-tap cross-lane
`jnp.sum` cost ~log2(Wl) full-width VPU ops per tap) — is executed on the
MXU as ONE dot per level:

    stack all 2*(2r+1) tap products on the sublane axis
        P = [xa*g_t..., xb*g_t...]          (2K*ROWS*W2, Wl)
    reduce with a constant ones matrix
        S = P @ ones(Wl, 8)                 (2K*ROWS*W2, 8), lane 0 = sum

The ones-matmul does 128x the arithmetically-useful work, but the MXU has
~2 orders of magnitude more FLOPs than the VPU, and its cycles were idle
here — the kernel's VPU work drops to the tent build (one eval per element,
~0.8%-sparse dense-tent work eliminated) plus one multiply per (tap,
element).  HBM traffic: each level byte crosses once (the XLA inline-tent
default re-reads levels per merged tap fusion and is VPU-bound on
full-width weight evals at 3.1 TF/s — trace attribution in
ARCHITECTURE.md).

Semantics: identical to `_lookup_level_lagged_pair` (ops/corr_lookup.py);
exactness is tested against it in tests/test_pallas_kernel.py.

STATUS: measured on v5e at 512^2/bf16 (tools/profile_lookup.py): 0.237 ms
/iteration-pair vs XLA inline 0.175 / XLA lagged 0.118 standalone — the
MXU reduction removed the previous kernel's reduction wall (0.595 -> 0.237)
but grid/launch + VMEM-fill overheads still dominate at this size, and the
standalone XLA numbers exclude the loop-fusion contexts where the in-model
cost arises.  Opt-in via `lookup_impl="mxu"` (dispatched in
ops/corr_lookup.py lookup_corr_pyramid_pair; inference-only — no VJP — the
model falls back to the XLA inline tent outside test_mode/TPU); the
in-model default remains the XLA inline tent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # rows per grid step (VMEM budget)


def _kernel(num_levels, radius, coords_ref, *refs):
    out_ref = refs[-1]
    lvl_refs = refs[:-1]
    f32 = jnp.float32
    pos0 = coords_ref[..., 0].astype(f32)  # (ROWS, W2)
    k = 2 * radius + 1

    for li in range(num_levels):
        xa = lvl_refs[li][...]  # (ROWS, W2, Wl)
        xb = lvl_refs[num_levels + li][...]
        rows, w2, wl = xa.shape
        pos = pos0 * (1.0 / (2.0**li))
        wg = wl + 2 * radius + 2
        m = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, w2, wg), 2).astype(f32)
            - (radius + 1)
        )
        g = jnp.maximum(1.0 - jnp.abs(m - pos[..., None]), 0.0).astype(xa.dtype)

        prods = []
        for t in range(-radius, radius + 1):
            start = radius + 1 - t
            gs = jax.lax.slice_in_dim(g, start, start + wl, axis=-1)
            prods.append(xa * gs)
        for t in range(-radius, radius + 1):
            start = radius + 1 - t
            gs = jax.lax.slice_in_dim(g, start, start + wl, axis=-1)
            prods.append(xb * gs)
        # (2K, ROWS, W2, Wl) -> (2K*ROWS*W2, Wl): taps on sublanes, the
        # reduced axis on lanes — one MXU dot replaces 2K lane reductions.
        # (Only reshapes + static slices below: Mosaic rejects transposes /
        # strided slices here with "Only 2D gather is supported".)
        stack = jnp.stack(prods).reshape(2 * k * rows * w2, wl)
        ones = jnp.ones((wl, 8), dtype=stack.dtype)
        sums = jax.lax.dot_general(
            stack,
            ones,
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(2 * k, rows, w2, 8)

        # slot layout: per level, K lanes of volume a then K of volume b.
        base = li * 2 * k
        for idx in range(2 * k):
            out_ref[:, :, base + idx] = sums[idx, :, :, 0].astype(out_ref.dtype)


def dual_lookup_mxu(levels_a, levels_b, coords: jax.Array, radius: int, interpret: bool = False):
    """Single-pass lagged-product lookup of two same-shape pyramids at shared
    coords, tap reductions on the MXU.

    levels_*: tuples of (B, H, W2, Wl_i); coords: (B, H, W2) x-coordinates.
    Returns (corr_a, corr_b), each (B, H, W2, n_levels*(2r+1)) in the
    reference's level-major tap order (reference corr.py:112-115).
    """
    num_levels = len(levels_a)
    b, h, w2 = coords.shape
    bh = b * h
    rows = _ROWS if bh % _ROWS == 0 else 4
    assert bh % rows == 0, f"B*H = {bh} must be a multiple of {rows}"
    dtype = levels_a[0].dtype
    k = 2 * radius + 1

    flat = [lvl.reshape(bh, w2, lvl.shape[-1]) for lvl in (*levels_a, *levels_b)]
    coords_flat = coords.reshape(bh, w2, 1).astype(jnp.float32)

    out_ch = 2 * num_levels * k
    in_specs = [pl.BlockSpec((rows, w2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((rows, w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for lvl in flat
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, radius),
        out_shape=jax.ShapeDtypeStruct((bh, w2, out_ch), dtype),
        grid=(bh // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, w2, out_ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords_flat, *flat)

    out = out.reshape(b, h, w2, out_ch)
    taps_a = [out[..., li * 2 * k : li * 2 * k + k] for li in range(num_levels)]
    taps_b = [out[..., li * 2 * k + k : (li + 1) * 2 * k] for li in range(num_levels)]
    return jnp.concatenate(taps_a, axis=-1), jnp.concatenate(taps_b, axis=-1)
