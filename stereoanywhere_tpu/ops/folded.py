"""Lane-folded NDHWC volume algebra: (B, D, H, W, C) carried as (B, D, H, W*C).

Why: XLA's TPU layouts tile the two minor dims to (8 sublanes, 128 lanes),
so every materialized hourglass tensor with C=8 channels is padded 16x at
the lane dim.  At 1024x1024 a single full-resolution (B, 256, 256, 256, 8)
bf16 volume is 268 MB logical but 4.3 GB padded — the direct full-resolution
forward OOMs on a 16 GB chip for padding alone (ARCHITECTURE.md "High
resolution").  Folding W and C into one lane axis (w-major, c-minor) makes
every tensor's minor dim a multiple of 128: zero padding waste.

Every op here is an EXACT reordering of its unfolded counterpart (same
multiply-adds; f32 accumulation order may differ):

- `conv3d_folded_io`: the blocked banded-fold conv (ops/conv3d_fold.py)
  operating natively on folded input AND output — the window slices become
  lane-axis slices at C granularity, so the unfolded tensor never exists.
- `instance_norm_folded`: per-channel stats via a (B, W*C) -> (B, C)
  two-stage reduction; normalization broadcast back per lane.
- `resize_folded`: align-corners trilinear resize; the D/H axes use the
  constant-interp-matrix matmuls of ops/interp.py, the folded lane axis uses
  kron(R, I_C) as one MXU matmul (the 2-tap sparsity waste is dwarfed by the
  padding it avoids).
- `lane_broadcast_c` / `lane_broadcast_w`: expand a (.., C) or (.., W)
  tensor to (.., W*C) lanes via constant 0/1 selector matmuls — safe against
  XLA materializing a padded (.., W, C) broadcast intermediate.

Used by models/hourglass.py (folded=True) and the masked-volume build in
models/stereoanywhere.py; equivalence vs the unfolded path is tested in
tests/test_conv3d_fold.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from stereoanywhere_tpu.ops.conv3d_fold import _banded_kernel, _pick_block
from stereoanywhere_tpu.ops.interp import _interp_matrix, _resize_axis_align_corners


def fold(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, D, H, W*C), w-major c-minor lanes."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d, h, w * c)


def unfold(x: jax.Array, c: int) -> jax.Array:
    """(B, D, H, W*C) -> (B, D, H, W, C)."""
    b, d, h, wc = x.shape
    return x.reshape(b, d, h, wc // c, c)


def conv3d_folded_io(
    x: jax.Array,
    kernel: jax.Array,
    strides: tuple[int, int, int] = (1, 1, 1),
    padding: int = 1,
    *,
    w: int,
    block_w: int | None = None,
) -> jax.Array:
    """NDHWC conv3d on a lane-folded volume, folded in and out.

    x: (B, D, H, W*Ci); kernel: (kd, kh, kw, Ci, Co); torch-style symmetric
    `padding`.  Returns (B, D', H', (W/sw)*Co).  Same blocked banded fold as
    ops/conv3d_fold.conv3d_folded — the fold/unfold reshapes are eliminated,
    not just fused: window extraction is lane-axis slicing at Ci granularity.
    """
    b, d, h, wci = x.shape
    kd, kh, kw, ci, co = kernel.shape
    assert wci == w * ci, (x.shape, w, ci)
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

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p * ci, p * ci)))
    if nb == 1:
        wins = xp[:, :, :, : wb_in * ci]
        y = lax.conv_general_dilated(
            wins, k2, (sd, sh), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y  # (B, D', H', wb_out*Co) — already folded
    wins = jnp.stack(
        [xp[:, :, :, i * block_w * ci : i * block_w * ci + wb_in * ci] for i in range(nb)],
        axis=1,
    )  # (B, nb, D, H, wb_in*Ci)
    wins = wins.reshape(b * nb, d, h, wb_in * ci)
    y = lax.conv_general_dilated(
        wins, k2, (sd, sh), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    do, ho = y.shape[1], y.shape[2]
    y = y.reshape(b, nb, do, ho, wb_out * co)
    return y.transpose(0, 2, 3, 1, 4).reshape(b, do, ho, nb * wb_out * co)


def conv1x1x1_folded(x: jax.Array, kernel: jax.Array, *, w: int) -> jax.Array:
    """1x1x1 conv (channel matmul) on a folded volume.

    kernel: (1, 1, 1, Ci, Co) or (Ci, Co)."""
    if kernel.ndim == 5:
        kernel = kernel[0, 0, 0]
    ci, co = kernel.shape
    return conv3d_folded_io(
        x, kernel[None, None, None], (1, 1, 1), 0, w=w
    )


def instance_norm_folded(x: jax.Array, c: int, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel instance norm on a folded volume (no affine).

    Identical statistics to models/layers.instance_norm on the unfolded
    tensor (f32 accumulation; normalize in the input dtype), including the
    optimization_barrier that stops XLA duplicating the producing conv into
    both the stats reduction and the normalize pass.
    """
    x = lax.optimization_barrier(x)
    b, d, h, wc = x.shape
    w = wc // c
    n = d * h * w
    s = jnp.sum(x, axis=(1, 2), dtype=jnp.float32).reshape(b, w, c).sum(axis=1)
    # square-sum as a bf16-input multiply-reduce with f32 accumulation: an
    # explicit x.astype(f32) is a convert op XLA can output-fuse into the
    # producing conv, materializing the full activation in f32 (measured:
    # 137 MB per decoder conv at 1024²); the einsum form never creates it.
    s2 = (
        jnp.einsum("bdhw,bdhw->bw", x, x, preferred_element_type=jnp.float32)
        .reshape(b, w, c)
        .sum(axis=1)
    )
    mean = s / n
    var = s2 / n - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    # (B, C) -> (B, W*C) per-lane scale/shift (tiny tensors; tile is safe here)
    mean_l = jnp.tile(mean.astype(x.dtype), (1, w))[:, None, None, :]
    inv_l = jnp.tile(inv.astype(x.dtype), (1, w))[:, None, None, :]
    return (x - mean_l) * inv_l


def _selector_c(c: int, w: int, dtype) -> jax.Array:
    """(C, W*C) 0/1 matrix: out[c, i*C + c] = 1 — broadcast channels to lanes."""
    eye = jnp.eye(c, dtype=dtype)
    return jnp.tile(eye, (1, w))


def _selector_w(w: int, c: int, dtype) -> jax.Array:
    """(W, W*C) 0/1 matrix: out[i, i*C + c] = 1 — broadcast W to lanes."""
    return jnp.kron(jnp.eye(w, dtype=dtype), jnp.ones((1, c), dtype))


def lane_broadcast_c(x: jax.Array, w: int) -> jax.Array:
    """(..., C) -> (..., W*C), value at lane i*C+c = x[..., c].

    A constant selector matmul: XLA cannot materialize a lane-padded
    (..., W, C) intermediate the way a broadcast+reshape could."""
    c = x.shape[-1]
    sel = _selector_c(c, w, x.dtype)
    return jnp.einsum("...c,ck->...k", x, sel)


def lane_broadcast_w(x: jax.Array, c: int) -> jax.Array:
    """(..., W) -> (..., W*C), value at lane i*C+c = x[..., i]."""
    w = x.shape[-1]
    sel = _selector_w(w, c, x.dtype)
    return jnp.einsum("...w,wk->...k", x, sel)


def resize_folded(
    x: jax.Array, out_dhw: tuple[int, int, int], *, w: int, c: int
) -> jax.Array:
    """Align-corners trilinear resize of a folded volume.

    x (B, D, H, W*C) -> (B, D', H', W'*C).  D/H resize via the shared
    interp-matrix matmuls (exact parity with resize_trilinear_align_corners);
    the lane axis via kron(R_w, I_C) as one matmul.  Axis order is chosen to
    keep the intermediate smallest (linear resizes on independent axes
    commute exactly up to float rounding).
    """
    d_out, h_out, w_out = out_dhw

    def lane_resize(t: jax.Array) -> jax.Array:
        if w_out == w:
            return t
        m = _interp_matrix(w, w_out)  # (w_out, w)
        mk = jnp.kron(m, jnp.eye(c, dtype=jnp.float32)).astype(t.dtype)  # (w_out*C, w*C)
        return jnp.einsum(
            "bdhk,ok->bdho", t, mk, preferred_element_type=jnp.float32
        ).astype(t.dtype)

    if w_out >= w:
        # upsampling: widen lanes first while D/H rows are still small
        x = lane_resize(x)
        x = _resize_axis_align_corners(x, 1, d_out)
        x = _resize_axis_align_corners(x, 2, h_out)
    else:
        x = _resize_axis_align_corners(x, 1, d_out)
        x = _resize_axis_align_corners(x, 2, h_out)
        x = lane_resize(x)
    return x


# ---------------------------------------------------------------------------
# Block-batch carried layout: (B, nb, D, H, wb*C), wb = W/nb.
#
# The blocked banded conv (conv3d_folded_io) pays three full-tensor layout
# passes per conv — pad, nb-slice window stack, and the output
# transpose+reshape back to folded — because the block axis is created and
# destroyed around every conv.  Carrying the block axis as a real tensor
# dimension between convs removes two of the three passes: the only per-conv
# layout work left is the halo exchange (neighbor blocks contribute kw-1
# lane-columns, fetched with two shifts along the nb axis), and the conv
# output IS the carried layout.  It also unlocks smaller blocks (band density
# kw/(wb+kw-1): 3/18 at wb=16 vs 3/34 at wb=32 — measured 27.6 -> 20.6 ms of
# banded-conv time at 1024^2) that the stacked path couldn't afford (the
# stack materialization grew faster than the conv shrank; device traces
# 2026-08-19).  Every op below is an exact reordering of its folded
# counterpart; equivalence is tested in tests/test_conv3d_fold.py.


def pick_nb(w: int, target_wb: int = 16) -> int | None:
    """Number of blocks for the carried layout: wb = w/nb nearest `target_wb`
    with wb a multiple of 8 (three stride-2 hourglass levels each halve wb,
    and the deepest level's banded conv still needs an even block).  Returns
    None when w has no such split (caller falls back to the stacked path)."""
    cands = [
        nb for nb in range(1, w + 1) if w % nb == 0 and (w // nb) % 8 == 0
    ]
    if not cands:
        return None
    # minimize |wb - target|; on ties prefer MORE blocks (denser band)
    return min(cands, key=lambda nb: (abs(w // nb - target_wb), -nb))


def to_blocks(x: jax.Array, nb: int) -> jax.Array:
    """Folded (B, D, H, W*C) -> blocked (B, nb, D, H, (W/nb)*C)."""
    b, d, h, wc = x.shape
    return x.reshape(b, d, h, nb, wc // nb).transpose(0, 3, 1, 2, 4)


def from_blocks(x: jax.Array) -> jax.Array:
    """Blocked (B, nb, D, H, wb*C) -> folded (B, D, H, nb*wb*C)."""
    b, nb, d, h, l = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b, d, h, nb * l)


def halo_lanes(x: jax.Array, left: int, right: int, c: int) -> jax.Array:
    """Concatenate `left`/`right` halo columns (at C granularity) from the
    neighboring blocks onto each block's lane axis; W-edge blocks get zeros
    (= the conv's zero padding).  x: (B, nb, D, H, wb*C) ->
    (B, nb, D, H, (left+wb+right)*C)."""
    if left == 0 and right == 0:
        return x
    parts = []
    if left:
        tail = x[..., -left * c :]
        parts.append(jnp.pad(tail, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1])
    parts.append(x)
    if right:
        head = x[..., : right * c]
        parts.append(jnp.pad(head, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:])
    return jnp.concatenate(parts, axis=-1)


def _banded_kernel_append(
    kernel: jax.Array, wb: int, wb_out: int, sw: int, p: int, dtype,
    co_major: bool = False,
) -> jax.Array:
    """Banded kernel for the APPENDED-halo window layout: input rows are the
    wb in-block columns followed by the left-halo column (global offset -1)
    then the right-halo column (offset wb).  Same taps as _banded_kernel,
    permuted rows.

    co_major=True emits output lanes ordered (co, w_out) instead of
    (w_out, co): sibling convs fused along co then split with CONTIGUOUS
    lane slices instead of strided ones (the interleaved 0::2 split of the
    fused classifier pair cost 8.1 ms of sliced relayouts at 1024²)."""
    kd, kh, kw, ci, co = kernel.shape
    g = jnp.asarray(list(range(wb)) + [-1, wb])  # (wb+2,) global in-block offsets
    wo = jnp.arange(wb_out)
    tap = g[:, None] - sw * wo[None, :] + p  # (wb+2, wb_out)
    band = (tap[..., None] == jnp.arange(kw)).astype(dtype)
    k2 = jnp.einsum("dhkco,wvk->dhwcvo", kernel.astype(dtype), band)
    if co_major:
        k2 = k2.transpose(0, 1, 2, 3, 5, 4)  # (..., ci, co, wb_out)
        return k2.reshape(kd, kh, (wb + 2) * ci, co * wb_out)
    return k2.reshape(kd, kh, (wb + 2) * ci, wb_out * co)


# Default for conv3d_blocked_io's halo_split (A/B switch; see there).
# Env override SA_HALO_SPLIT=1 for profiling A/Bs without code edits.
import os as _os

HALO_SPLIT_DEFAULT = _os.environ.get("SA_HALO_SPLIT", "0") == "1"


def halo_lanes_append(x: jax.Array, c: int) -> jax.Array:
    """Append ONE left-neighbor tail column and ONE right-neighbor head
    column (at C granularity) to the END of each block's lane axis; W-edge
    blocks get zeros.  Unlike halo_lanes' [left | block | right] order, the
    big chunk lands at lane offset 0, so whenever wb*C is a multiple of the
    128-lane tile the concatenate is tile-aligned (measured: the interleaved
    order cost ~13 ms of misaligned concats at 1024^2)."""
    tail = jnp.pad(x[..., -c:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
    head = jnp.pad(x[..., :c], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:]
    return jnp.concatenate([x, tail, head], axis=-1)


def conv3d_blocked_io(
    x: jax.Array,
    kernel: jax.Array,
    strides: tuple[int, int, int] = (1, 1, 1),
    padding: int = 1,
    *,
    w: int,
    out_co_major: bool = False,
    halo_split: bool | None = None,
) -> jax.Array:
    """NDHWC conv3d on the carried block layout, blocked in and out.

    x: (B, nb, D, H, (w/nb)*Ci); kernel (kd, kh, kw, Ci, Co); torch-style
    symmetric `padding` (must equal (kw-1)/2 for kw>1 — the halo exchange
    assumes the size-preserving window).  Returns
    (B, nb, D', H', (w/nb/sw)*Co) — same multiply-adds as conv3d_folded_io.
    out_co_major=True orders output lanes (Co, w) instead of (w, Co) so a
    co-fused sibling-conv pair splits with contiguous lane slices (kw==3
    path only)."""
    b, nb, d, h, wbci = x.shape
    kd, kh, kw, ci, co = kernel.shape
    wb = w // nb
    assert wbci == wb * ci and w % nb == 0, (x.shape, w, ci)
    sd, sh, sw = strides
    p = padding
    assert (w + 2 * p - kw) // sw + 1 == w // sw, (
        "blocked fold assumes a size-preserving (stride-divided) conv on W"
    )
    assert wb % sw == 0, (wb, sw)
    wb_out = wb // sw

    if halo_split is None:
        halo_split = HALO_SPLIT_DEFAULT
    if kw == 3 and p == 1:
        k2 = _banded_kernel_append(kernel, wb, wb_out, sw, p, x.dtype, out_co_major)
        if halo_split:
            # Split-operand form: the banded conv's input rows are
            # [block | tail | head], so conv(wins, k2) ==
            # conv(x, k2[:wb*ci]) + conv(halo2c, k2[wb*ci:]) exactly —
            # the full (wb+2)C windowed tensor (a 1.125x-volume write+read
            # per conv) never materializes; only the 2C halo lanes do.
            k_main = k2[:, :, : wb * ci]
            k_halo = k2[:, :, wb * ci :]
            xm = x.reshape(b * nb, d, h, wb * ci)
            tail = jnp.pad(x[..., -ci:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
            head = jnp.pad(x[..., :ci], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:]
            halo2 = jnp.concatenate([tail, head], axis=-1).reshape(
                b * nb, d, h, 2 * ci
            )
            y = lax.conv_general_dilated(
                xm, k_main, (sd, sh), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + lax.conv_general_dilated(
                halo2, k_halo, (sd, sh), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y.reshape(b, nb, y.shape[1], y.shape[2], wb_out * co)
        wins = halo_lanes_append(x, ci).reshape(b * nb, d, h, (wb + 2) * ci)
    else:
        assert not out_co_major, "co-major output only on the kw==3 path"
        wb_in = wb + kw - 1
        k2 = _banded_kernel(kernel, wb_in, wb_out, sw, x.dtype)
        wins = halo_lanes(x, p, kw - 1 - p, ci).reshape(b * nb, d, h, wb_in * ci)
    y = lax.conv_general_dilated(
        wins, k2, (sd, sh), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, nb, y.shape[1], y.shape[2], wb_out * co)


def conv1x1x1_blocked(x: jax.Array, kernel: jax.Array, *, w: int) -> jax.Array:
    """1x1x1 conv (channel matmul) on the carried block layout."""
    if kernel.ndim == 5:
        kernel = kernel[0, 0, 0]
    return conv3d_blocked_io(x, kernel[None, None, None], (1, 1, 1), 0, w=w)


def instance_norm_blocked(x: jax.Array, c: int, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel instance norm on a blocked volume — identical
    statistics to instance_norm_folded (same two-stage f32 reduction, same
    producer barrier)."""
    x = lax.optimization_barrier(x)
    b, nb, d, h, wbc = x.shape
    wb = wbc // c
    n = nb * d * h * wb
    s = jnp.sum(x, axis=(1, 2, 3), dtype=jnp.float32).reshape(b, wb, c).sum(axis=1)
    # square-sum as a bf16-input multiply-reduce with f32 accumulation (no
    # explicit upcast of x).  A/B at 1024² (r4): neutral vs
    # square(x.astype(f32)) — AND a full dot-form stats path with zero
    # convert ops was neutral too, so the decoder convs' f32 outputs are
    # XLA's layout choice at the barrier, not convert fusion; kept for the
    # cheaper HLO.  See instance_norm_folded.
    s2 = (
        jnp.einsum("bndhw,bndhw->bw", x, x, preferred_element_type=jnp.float32)
        .reshape(b, wb, c)
        .sum(axis=1)
    )
    mean = s / n
    var = s2 / n - jnp.square(mean)
    inv = lax.rsqrt(var + eps)
    mean_l = jnp.tile(mean.astype(x.dtype), (1, wb))[:, None, None, None, :]
    inv_l = jnp.tile(inv.astype(x.dtype), (1, wb))[:, None, None, None, :]
    return (x - mean_l) * inv_l


def resize_blocked(
    x: jax.Array, out_dhw: tuple[int, int, int], *, w: int, c: int
) -> jax.Array:
    """Align-corners trilinear resize on the carried block layout (nb fixed).

    D/H resize via the shared interp-matrix matmuls (axes 2/3); the W axis
    via PER-BLOCK interp matrices applied to halo'd slabs with one batched
    einsum — linear interpolation reads at most one element beyond each
    block edge, so a 1-column halo is always sufficient.  W upsampling only
    (all hourglass decoder resizes upsample; the folded path covers the
    rest).  Exact parity with resize_folded / resize_trilinear_align_corners.
    """
    d_out, h_out, w_out = out_dhw
    b, nb, d, h, wbc = x.shape
    wb = wbc // c
    assert w == nb * wb and w_out % nb == 0 and w_out >= w, (x.shape, w, w_out)
    wbo = w_out // nb

    def lane_resize(t: jax.Array) -> jax.Array:
        if w_out == w:
            return t
        m = _interp_matrix(w, w_out)  # (w_out, w), <=2 nonzeros per row
        # per-block rows [i*wbo:(i+1)*wbo], columns [i*wb-1 : (i+1)*wb+1]
        mp = jnp.pad(m, ((0, 0), (1, 1)))
        mb = jnp.stack(
            [mp[i * wbo : (i + 1) * wbo, i * wb : i * wb + wb + 2] for i in range(nb)]
        )  # (nb, wbo, wb+2)
        eye = jnp.eye(c, dtype=jnp.float32)
        mbk = jnp.einsum("now,ck->nocwk", mb, eye).reshape(
            nb, wbo * c, (wb + 2) * c
        ).astype(t.dtype)
        slab = halo_lanes(t, 1, 1, c)  # (B, nb, D, H, (wb+2)*C)
        return jnp.einsum(
            "bndhk,nok->bndho", slab, mbk, preferred_element_type=jnp.float32
        ).astype(t.dtype)

    if w_out >= w:
        x = lane_resize(x)
        x = _resize_axis_align_corners(x, 2, d_out)
        x = _resize_axis_align_corners(x, 3, h_out)
    return x


def build_masked_volume_blocked(
    volume: jax.Array,
    left_masks: jax.Array,
    right_masks: jax.Array,
    dtype,
    nb: int,
) -> jax.Array:
    """Masked cost volume emitted directly in the carried block layout.

    Same values as build_masked_volume_folded -> to_blocks, but the
    right-mask lane broadcast is built once at BLOCK width (w2/nb lanes) and
    broadcast over the nb axis inside the product fusion — the full-width
    (B, W3, H, W2*N) right factor is never materialized."""
    b, hh, w2, n = left_masks.shape
    wb = w2 // nb
    vol_t = volume.transpose(0, 3, 1, 2).astype(dtype)  # (B, W3, H, W2)
    vol_b = to_blocks(vol_t, nb)  # (B, nb, W3, H, wb)
    vol_l = lane_broadcast_w(vol_b, n)  # (B, nb, W3, H, wb*N)
    left_b = to_blocks(
        left_masks.reshape(b, 1, hh, w2 * n).astype(dtype), nb
    )  # (B, nb, 1, H, wb*N)
    right_l = lane_broadcast_c(
        right_masks.transpose(0, 2, 1, 3).astype(dtype), wb
    )[:, None]  # (B, 1, W3, H, wb*N) — shared by every block
    return vol_l * left_b * right_l


def build_masked_volume_folded(
    volume: jax.Array, left_masks: jax.Array, right_masks: jax.Array, dtype
) -> jax.Array:
    """Masked cost volume directly in the folded hourglass layout.

    volume (B, H, W2, W3); left_masks (B, H, W2, N); right_masks (B, H, W3, N)
    -> (B, W3, H, W2*N) with value[b, w3, h, w2*N+n]
       = volume[b, h, w2, w3] * left[b, h, w2, n] * right[b, h, w3, n]

    Semantics of ops/volume.apply_bin_masks + the reference's permute to
    (W3, H, W2) spatial order (reference stereoanywhere.py:148,161 +
    hourglass.py:63), fused so neither the (B,H,W2,W3,N) nor a lane-padded
    (.., W2, N) intermediate is ever materialized.
    """
    b, hh, w2, n = left_masks.shape
    vol_t = volume.transpose(0, 3, 1, 2).astype(dtype)  # (B, W3, H, W2)
    vol_l = lane_broadcast_w(vol_t, n)  # (B, W3, H, W2*N)
    left_l = left_masks.reshape(b, hh, w2 * n).astype(dtype)[:, None]  # (B,1,H,W2*N)
    right_l = lane_broadcast_c(
        right_masks.transpose(0, 2, 1, 3).astype(dtype), w2
    )  # (B, W3, H, W2*N)
    return vol_l * left_l * right_l
