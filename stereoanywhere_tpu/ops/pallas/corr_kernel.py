"""Pallas TPU kernel: fused dual-pyramid correlation lookup.

Replaces the reference's external `corr_sampler` CUDA extension
(reference corr.py:5-29) and this framework's per-level XLA einsums with ONE
kernel per GRU iteration: both volumes' pyramid levels stay resident in VMEM
for the row block while all (2r+1) x levels taps are computed as tent-kernel
contractions (linear interpolation with zeros padding — identical math to
ops/corr_lookup.py, tested against it in interpret mode AND compiled).

Grid: one program per 8-row band (Mosaic requires >=8 sublanes per block);
each program holds its band of every pyramid level in VMEM and emits the
full (8, W2, 2*levels*(2r+1)) lookup tensor.

STATUS: experimental. Correctness-verified in interpret mode
(tests/test_pallas_kernel.py).  On this environment's AOT TPU compile path
the pallas operands are staged wholesale into VMEM (~19 MB > the 16 MB
scoped limit at 512x512), so the compiled path needs manual HBM->VMEM DMA
windowing before it can be enabled in the model.  The XLA tent-contraction
lookup (ops/corr_lookup.py) already measures ~0.1 ms per iteration pair at
512x512, so this kernel is a future optimization, not a dependency.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # rows per program


def _dual_lookup_kernel(radius, num_levels, coords_ref, *refs):
    """refs: [s_l0..s_l{L-1}, m_l0..m_l{L-1}, out_ref]."""
    out_ref = refs[-1]
    levels = refs[:-1]
    k = 2 * radius + 1

    coords = coords_ref[:, :]  # (R, W2)
    r_, w2 = coords.shape

    col = 0
    for v in range(2):  # stereo, mono
        for li in range(num_levels):
            lvl = levels[v * num_levels + li][:, :, :]  # (R, W2, Wl)
            wl = lvl.shape[-1]
            # 2-D int iota (Mosaic: iota must be integer, <=2D); cast + broadcast
            j = jax.lax.broadcasted_iota(jnp.int32, (w2, wl), 1).astype(jnp.float32)[None, :, :]
            base = coords * (1.0 / (2.0 ** li))  # (R, W2)
            for t in range(k):
                pos = base + (t - radius)
                w = jnp.maximum(1.0 - jnp.abs(j - pos[:, :, None]), 0.0)
                val = jnp.sum(lvl.astype(jnp.float32) * w, axis=-1)  # (R, W2)
                # immediate per-tap write: keeps only one (R,W2,Wl) temporary live
                out_ref[col, :, :] = val.astype(out_ref.dtype)
                col += 1


def dual_lookup_pallas(
    stereo_levels: tuple[jax.Array, ...],
    mono_levels: tuple[jax.Array, ...],
    coords: jax.Array,
    radius: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """stereo/mono levels: tuples of (B,H,W2,Wl_i); coords (B,H,W2).
    Returns (stereo_corr, mono_corr) each (B,H,W2, levels*(2r+1)), matching
    lookup_corr_pyramid's level-major tap order.

    Requires B*H divisible by 8 (true for any H that is a multiple of 32
    after the model's /4 downsampling)."""
    num_levels = len(stereo_levels)
    k = 2 * radius + 1
    b, h, w2 = coords.shape
    bh = b * h
    assert bh % _ROWS == 0, f"B*H/4 = {bh} must be a multiple of {_ROWS}"
    dtype = stereo_levels[0].dtype

    flat_levels = [
        lvl.reshape(bh, w2, lvl.shape[-1]) for lvl in (*stereo_levels, *mono_levels)
    ]
    coords_flat = coords.reshape(bh, w2).astype(jnp.float32)

    out_ch = 2 * num_levels * k
    grid = (bh // _ROWS,)

    in_specs = [pl.BlockSpec((_ROWS, w2), lambda i: (i, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec(
            (_ROWS, w2, lvl.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        for lvl in flat_levels
    ]

    # channel-major output: each tap writes one aligned (ROWS, W2) tile
    out = pl.pallas_call(
        functools.partial(_dual_lookup_kernel, radius, num_levels),
        out_shape=jax.ShapeDtypeStruct((out_ch, bh, w2), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (out_ch, _ROWS, w2), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(coords_flat, *flat_levels)

    out = out.reshape(out_ch, b, h, w2).transpose(1, 2, 3, 0)
    half = num_levels * k
    return out[..., :half], out[..., half:]
