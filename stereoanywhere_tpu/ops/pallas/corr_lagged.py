"""Pallas TPU kernel: single-pass dual-pyramid LAGGED-PRODUCT lookup.

Third formulation of the GRU-loop correlation lookup (see ops/corr_lookup.py
for the XLA paths and ops/pallas/corr_tent.py / corr_gather.py for the two
earlier Pallas attempts and their measured walls):

  - corr_tent.py built the dense per-tap tent IN-kernel: ~6 VPU ops per
    (tap, element), 99% zeros -> VPU-compute-bound (1006 us/iter-pair at
    512^2, worse than XLA's 680 us).
  - corr_gather.py used dynamic gathers -> Mosaic gather-throughput-bound.
  - the XLA lagged-product path (the in-model default) is HBM-bound: its
    2r+1 tap fusions EACH re-read the volume levels (~254 MB/iter vs ~16 MB
    of unique level data at 512^2; device trace, ARCHITECTURE.md).

This kernel combines the two halves that were fast: the *lagged-product*
algebra (one shared tent array g per level, each tap a STATICALLY-shifted
slice of g — reference corr.py:93-115 semantics, zero gathers, no dense
tent) executed *single-pass in VMEM* (each level byte crosses HBM once).

    g[m]     = max(0, 1 - |m - pos|),  m in [-(r+1), wl + r]
    tap_t[w] = sum_j level[w, j] * g[w, j - t + (r+1)]     (static slice)

Per (element, tap): one bf16 multiply + f32 accumulate, plus one lane
rotation of g per tap SHARED by both volumes — ~5x fewer VPU ops than the
dense tent, at the tent kernel's minimal HBM traffic.

Semantics: identical to ops/corr_lookup.py `_lookup_level_lagged_pair`
(linear interpolation, zeros padding, positions outside [0, Wl-1] fade to
zero), oracle-tested against the reference bilinear_sampler math
(reference corr.py:93-115, utils/utils.py:19-35).

Output layout: (B, H, W2, 2*n_levels*_SLOT) slot-aligned taps, sliced back
to the reference's level-major concatenation by `dual_lookup_lagged`.

STATUS: compiles and is exact on TPU (tests/test_pallas_kernel.py), but
MEASURED SLOWER than both in-graph XLA formulations in the standalone
chained benchmark at 512^2/bf16 on v5e (tools/profile_lookup.py):
pl-lag 0.595 ms vs XLA lagged 0.121 ms / inline 0.188 ms per iteration
pair (pl-tent 0.414 ms).  The traffic saving is real but the per-tap
cross-lane `jnp.sum` over Wl lanes costs ~log2(Wl) full-width vector ops
per tap — the reduction, not the multiply, is the VPU wall (and an
MXU-matvec reduction wastes 127/128 output lanes, which is worse).  Fourth
and final single-pass formulation; the model keeps the XLA lagged path
(ops/corr_lookup.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 4  # rows per grid step (VMEM budget; see corr_tent.py)
_SLOT = 16  # lanes per (volume, level) slot; requires 2r+1 <= 16


def _kernel(num_levels, radius, coords_ref, *refs):
    out_ref = refs[-1]
    lvl_refs = refs[:-1]
    f32 = jnp.float32
    pos0 = coords_ref[..., 0].astype(f32)  # (ROWS, W2)
    k = 2 * radius + 1

    for li in range(num_levels):
        xa = lvl_refs[li][...]  # (ROWS, W2, Wl)
        xb = lvl_refs[num_levels + li][...]
        wl = xa.shape[-1]
        pos = pos0 * (1.0 / (2.0**li))
        # Shared tent array over the extended support m in [-(r+1), wl+r]:
        # one build per level (f32 for index precision), reused by all
        # 2*(2r+1) tap reductions of both volumes.
        wg = wl + 2 * radius + 2
        m = (
            jax.lax.broadcasted_iota(jnp.int32, (_ROWS, pos.shape[1], wg), 2).astype(f32)
            - (radius + 1)
        )
        g = jnp.maximum(1.0 - jnp.abs(m - pos[..., None]), 0.0).astype(xa.dtype)

        taps_a, taps_b = [], []
        for t in range(-radius, radius + 1):
            start = radius + 1 - t
            gs = jax.lax.slice_in_dim(g, start, start + wl, axis=-1)
            taps_a.append(jnp.sum((xa * gs).astype(f32), axis=-1))  # (ROWS, W2)
            taps_b.append(jnp.sum((xb * gs).astype(f32), axis=-1))

        pad = [jnp.zeros_like(taps_a[0])] * (_SLOT - k)
        block_a = jnp.stack(taps_a + pad, axis=-1)  # (ROWS, W2, _SLOT)
        block_b = jnp.stack(taps_b + pad, axis=-1)
        out_ref[:, :, li * _SLOT : (li + 1) * _SLOT] = block_a.astype(out_ref.dtype)
        slot_b = num_levels + li
        out_ref[:, :, slot_b * _SLOT : (slot_b + 1) * _SLOT] = block_b.astype(out_ref.dtype)


def dual_lookup_lagged(levels_a, levels_b, coords: jax.Array, radius: int, interpret: bool = False):
    """Single-pass lagged-product lookup of two same-shape pyramids at shared
    coords.

    levels_*: tuples of (B, H, W2, Wl_i); coords: (B, H, W2) x-coordinates.
    Returns (corr_a, corr_b), each (B, H, W2, n_levels*(2r+1)) in the
    reference's level-major tap order (reference corr.py:112-115).
    """
    num_levels = len(levels_a)
    assert 2 * radius + 1 <= _SLOT, radius
    b, h, w2 = coords.shape
    bh = b * h
    assert bh % _ROWS == 0, f"B*H = {bh} must be a multiple of {_ROWS}"
    dtype = levels_a[0].dtype
    k = 2 * radius + 1

    flat = [lvl.reshape(bh, w2, lvl.shape[-1]) for lvl in (*levels_a, *levels_b)]
    coords_flat = coords.reshape(bh, w2, 1).astype(jnp.float32)

    out_ch = 2 * num_levels * _SLOT
    in_specs = [pl.BlockSpec((_ROWS, w2, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((_ROWS, w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for lvl in flat
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, num_levels, radius),
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
