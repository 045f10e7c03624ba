"""Low-channel 3-D convolutions as MXU-shaped banded 2-D convolutions.

Why: the hourglass aggregation network and the volume classifiers (reference
hourglass.py:13-91, stereoanywhere.py:73-74) are 3-D convs with 1-48
channels.  A TPU conv keeps output channels in the 128-wide lane dimension,
so an 8->8-channel conv3d uses 6% of the MXU and an 8->1 classifier <1% —
XLA's cost model put the 512x512 classifier_mono conv at ~17 ms, ~1700x off
its FLOP roofline.

The fix is a layout transform, not a new kernel: fold the LAST spatial axis
(length W) plus channels into the 2-D conv channel dims.  The conv along the
folded axis becomes a block-banded channel mixing:

    out[d, h, wo*co + o] = sum_{kd,kh,kw,c} in[d+kd, h+kh, (wo*sw + kw - p)*ci + c]
                                          * K[kd, kh, kw, c, o]

i.e. a 2-D conv over (D, H) with in-ch W*ci, out-ch (W/sw)*co and a kernel
that is zero outside the band |wi - sw*wo - kw + p| = 0.  With ci=co=8 and
W=128 the operands are 1024-channel matmuls — exactly the MXU's shape.

The dense band wastes FLOPs (band density ~ k/wb_in), so for W > ~48 the
fold is BLOCKED: the folded axis is split into nb windows of block_w (+ k-1
halo, overlapping reads), the windows are stacked into the batch dim, and
ONE shared banded kernel of shape (kd, kh, (block_w+k-1)*ci, (block_w/sw)*co)
serves every window (the band is shift-invariant).  block_w trades band
waste (k/(block_w+k-1): 6x at 16 vs 11.3x at 32 for ci=8) against XLA's
willingness to fuse the window gather into the conv: at block 16 (nb=8
windows) the halved MXU cycles were confirmed by trace (86.8 -> 43 GF) but
XLA materialized the 8-slice window stack as standalone 75 MB concatenates
(+1.6 ms), a net LOSS; at block 32 (nb<=4) the gather fuses.  32 is the
trace-verified optimum on v5e.

Measured (v5e, bf16, 128^3 volume): classifier 8->1: 12.9 ms -> ~0.2 ms;
final_agg 8->8: 3.5 ms -> ~0.4 ms.  Exact same multiply-adds as the direct
conv3d (zeros elsewhere), so this is numerically a reordering only.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _pick_block(w: int, target: int | None = None, multiple: int = 1) -> int:
    """Largest divisor of w that is <= target (preferring >= 8) and a
    multiple of `multiple` (the folded-axis stride: strided banded convs
    require block_w % sw == 0 — W=544 -> w4=136 would otherwise pick the odd
    divisor 17 and crash every stride-2 hourglass conv).

    Default target 32 (trace-verified optimum for the stacked-window path;
    SA_FOLD_BLOCK overrides for measurement sweeps)."""
    if target is None:
        target = int(os.environ.get("SA_FOLD_BLOCK", "32"))
    best = None
    for d in range(1, w + 1):
        if w % d == 0 and d % multiple == 0:
            if d <= target:
                if best is None or d > best or (best < 8 <= d):
                    best = d
            elif best is None or best < 8:
                # smallest divisor above target, only if nothing decent below
                best = d
                break
            else:
                break
    assert best is not None and w % best == 0 and best % multiple == 0, (w, multiple)
    return best


def _banded_kernel(kernel: jax.Array, wb_in: int, wb_out: int, sw: int, dtype) -> jax.Array:
    """(kd,kh,kw,ci,co) -> (kd, kh, wb_in*ci, wb_out*co) block-banded kernel.

    Band condition: local input index wi = sw*wo + kw  (the window gather
    already absorbed the -padding offset).
    """
    kd, kh, kw, ci, co = kernel.shape
    wi = jnp.arange(wb_in)
    wo = jnp.arange(wb_out)
    tap = wi[:, None] - sw * wo[None, :]  # (wb_in, wb_out)
    band = (tap[..., None] == jnp.arange(kw)).astype(dtype)  # (wb_in, wb_out, kw)
    k2 = jnp.einsum("dhkco,wvk->dhwcvo", kernel.astype(dtype), band)
    return k2.reshape(kd, kh, wb_in * ci, wb_out * co)


def conv3d_folded(
    x: jax.Array,
    kernel: jax.Array,
    strides: tuple[int, int, int] = (1, 1, 1),
    padding: int = 1,
    block_w: int | None = None,
) -> jax.Array:
    """NDHWC conv3d via the blocked banded fold of the last spatial axis.

    x: (B, D, H, W, Ci); kernel: (kd, kh, kw, Ci, Co); torch-style symmetric
    `padding` on all three spatial axes.  Requires W % block_w == 0 and
    block_w % strides[2] == 0 (block_w auto-chosen as a divisor of W near 32).

    Returns (B, D', H', W//sw, Co) — identical (up to f32 accumulation order)
    to lax.conv_general_dilated over NDHWC.
    """
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    sd, sh, sw = strides
    p = padding
    assert (w + 2 * p - kw) // sw + 1 == w // sw, (
        "fold assumes size-preserving (stride-divided) conv on the folded axis"
    )

    if block_w is None:
        block_w = _pick_block(w, multiple=sw)
    assert w % block_w == 0 and block_w % sw == 0, (w, block_w, sw)
    nb = w // block_w
    wb_in = block_w + kw - 1
    wb_out = block_w // sw

    k2 = _banded_kernel(kernel, wb_in, wb_out, sw, x.dtype)

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p, p), (0, 0)))
    if nb == 1:
        wins = xp[:, :, :, : wb_in, :].reshape(b, d, h, wb_in * ci)
        y = jax.lax.conv_general_dilated(
            wins, k2, (sd, sh), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        do, ho = y.shape[1], y.shape[2]
        return y.reshape(b, do, ho, wb_out, co)

    wins = jnp.stack(
        [xp[:, :, :, i * block_w : i * block_w + wb_in, :] for i in range(nb)], axis=1
    )  # (B, nb, D, H, wb_in, Ci)
    wins = wins.reshape(b * nb, d, h, wb_in * ci)
    y = jax.lax.conv_general_dilated(
        wins, k2, (sd, sh), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    do, ho = y.shape[1], y.shape[2]
    y = y.reshape(b, nb, do, ho, wb_out, co)
    return y.transpose(0, 2, 3, 1, 4, 5).reshape(b, do, ho, nb * wb_out, co)
