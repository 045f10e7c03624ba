"""Interpolation / pooling primitives with PyTorch-compatible semantics.

The reference uses `F.interpolate(..., align_corners=True)` throughout the
stereo branch (reference stereoanywhere.py:109-112, update.py:130-132,
hourglass.py:79-86, utils/utils.py:42-46).  `jax.image.resize` only implements
half-pixel (align_corners=False) sampling, so we implement align-corners
bilinear/trilinear resizing as separable 1-D gather+lerp — which XLA fuses
well on TPU.

All ops are channel-last (NHWC / NDHWC): the TPU-native layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _axis_lerp_weights(in_size: int, out_size: int, dtype=jnp.float32):
    """align_corners=True source coords: i_out * (in-1)/(out-1)."""
    if out_size == 1:
        src = jnp.zeros((1,), dtype)
    else:
        scale = (in_size - 1) / (out_size - 1)
        src = jnp.arange(out_size, dtype=dtype) * jnp.asarray(scale, dtype)
    x0 = jnp.clip(jnp.floor(src), 0, max(in_size - 1, 0)).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, in_size - 1)
    w = (src - x0.astype(dtype)).astype(dtype)
    return x0, x1, w


def _interp_matrix(in_size: int, out_size: int) -> jax.Array:
    """(out,in) align-corners linear interpolation matrix (constant)."""
    x0, x1, w = _axis_lerp_weights(in_size, out_size, jnp.float32)
    eye = jnp.eye(in_size, dtype=jnp.float32)
    return eye[x0] * (1.0 - w)[:, None] + eye[x1] * w[:, None]


def _resize_axis_align_corners(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    # Matmul with a constant interpolation matrix: identical math to
    # gather+lerp, but rides the MXU instead of XLA's TPU gather lowering.
    m = _interp_matrix(in_size, out_size).astype(x.dtype)
    y = jnp.tensordot(x, m, axes=[[axis], [1]])  # contracted axis moves to end
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize, align_corners=True (torch `F.interpolate` parity)."""
    assert x.ndim == 4, x.shape
    x = _resize_axis_align_corners(x, 1, out_hw[0])
    x = _resize_axis_align_corners(x, 2, out_hw[1])
    return x


def resize_trilinear_align_corners(x: jax.Array, out_dhw: tuple[int, int, int]) -> jax.Array:
    """NDHWC trilinear resize, align_corners=True."""
    assert x.ndim == 5, x.shape
    x = _resize_axis_align_corners(x, 1, out_dhw[0])
    x = _resize_axis_align_corners(x, 2, out_dhw[1])
    x = _resize_axis_align_corners(x, 3, out_dhw[2])
    return x


def _interp_matrix_halfpix(in_size: int, out_size: int) -> jax.Array:
    """(out,in) half-pixel (align_corners=False) linear interpolation matrix:
    src = (i+0.5)*in/out - 0.5, edge taps clamped — torch
    `F.interpolate(mode='bilinear', align_corners=False)` / jax.image.resize
    'bilinear' semantics (exact for upsampling; downsampling there is
    anti-aliased and NOT this matrix)."""
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (in_size / out_size) - 0.5
    x0 = jnp.floor(src)
    w = src - x0
    x0i = jnp.clip(x0, 0, in_size - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, in_size - 1).astype(jnp.int32)
    eye = jnp.eye(in_size, dtype=jnp.float32)
    return eye[x0i] * (1.0 - w)[:, None] + eye[x1i] * w[:, None]


def conv3x3_of_resize_halfpix(
    x: jax.Array,
    out_hw: tuple[int, int],
    kernel: jax.Array,
    bias: jax.Array | None,
) -> jax.Array:
    """conv3x3(resize_bilinear_halfpix(x), kernel, zero-pad) as a pure
    linear-algebra rearrangement:

        y[.., i, j, co] = sum_{dy,dx} (S_dy R_h) x (S_dx R_w)^T . K[dy,dx]

    where S_d shifts the interpolation matrix's ROWS by d with zero rows at
    the borders (== the conv's zero padding).  The channel contraction
    (Cin -> Co) happens at the LOW H resolution, before the expensive
    H-upsample matmul — for the DPT output stage (148²->518², 128->32) this
    is 40 GFLOP vs 106 for resize-then-conv, and it removes the packed
    output conv plus the 0.45 ms input relayout XLA emitted for it.
    Exact same sums as the sequential ops (everything is linear).

    x: (B, Hin, Win, Cin); kernel (3, 3, Cin, Co).  Returns
    (B, out_hw[0], out_hw[1], Co).
    """
    assert x.ndim == 4 and kernel.shape[:2] == (3, 3), (x.shape, kernel.shape)
    hout, wout = out_hw
    rh = _interp_matrix_halfpix(x.shape[1], hout)  # (Hout, Hin)
    rw = _interp_matrix_halfpix(x.shape[2], wout)  # (Wout, Win)

    def shift_rows(m, d):
        # (S_d M)[i] = M[i+d], zero rows where i+d is out of range
        if d == 0:
            return m
        if d > 0:
            return jnp.pad(m[d:], ((0, d), (0, 0)))
        return jnp.pad(m[:d], ((-d, 0), (0, 0)))

    # Order of operations matters a lot: mixing channels at the W-resized
    # width (first attempt) re-read the (B,Hin,Wout,Cin) intermediates 9x —
    # 2.37 ms measured at the DPT shape, WORSE than resize-then-conv.  This
    # form mixes channels at the LOW (Hin,Win) resolution for all 9 taps in
    # one matmul, then contracts the (Win, dx) and (Hin, dy) axes jointly
    # with stacked shifted interp matrices — ~31 GFLOP / ~150 MB total.
    k9 = kernel.astype(x.dtype)
    m = jnp.einsum("bhwc,uvco->bhuwvo", x, k9)  # (B,Hin,3,Win,3,Co)
    r3w = jnp.stack(
        [shift_rows(rw, d) for d in (-1, 0, 1)], axis=-1
    ).astype(x.dtype)  # (Wout, Win, 3)
    t = jnp.einsum("bhuwvo,jwv->bhujo", m, r3w)  # (B,Hin,3,Wout,Co)
    r3h = jnp.stack(
        [shift_rows(rh, d) for d in (-1, 0, 1)], axis=-1
    ).astype(x.dtype)  # (Hout, Hin, 3)
    out = jnp.einsum("bhujo,ihu->bijo", t, r3h)  # (B,Hout,Wout,Co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def resize_bilinear_halfpix(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize with half-pixel centers (torch `F.interpolate
    (mode='bilinear', align_corners=False)` — torch does NOT anti-alias, so
    the 2-tap matrix is exact for downsampling too), as two constant-matrix
    matmuls on the MXU instead of the gather/conv lowering (3.05 -> ~0.4 ms
    for the DPT head's 148^2 -> 518^2 x128ch resize, device trace)."""
    assert x.ndim == 4, x.shape
    # W-axis first: with the H matmul last, XLA's layout assignment feeds the
    # following conv directly — H-first needed a 0.84 ms copy+pad of the
    # 518²x128 tensor before the DPT output conv (device trace 2026-08-19).
    for axis, out_size in ((2, out_hw[1]), (1, out_hw[0])):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        m = _interp_matrix_halfpix(in_size, out_size).astype(x.dtype)
        y = jnp.tensordot(x, m, axes=[[axis], [1]])
        x = jnp.moveaxis(y, -1, axis)
    return x


def _interp_matrix_bicubic_halfpix(in_size: int, out_size: int) -> jax.Array:
    """(out,in) half-pixel bicubic (a=-0.75) interpolation matrix — torch
    `F.interpolate(mode='bicubic', align_corners=False)` semantics with
    border taps clamped (exact for upsampling AND downsampling; torch does
    not anti-alias)."""
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (in_size / out_size) - 0.5
    i0 = jnp.floor(src)
    t = src - i0
    a = -0.75
    rows = jnp.zeros((out_size, in_size), jnp.float32)
    eye = jnp.eye(in_size, dtype=jnp.float32)
    for k in range(-1, 3):
        d = jnp.abs(t - k)
        d2, d3 = d * d, d * d * d
        w = jnp.where(
            d <= 1,
            (a + 2) * d3 - (a + 3) * d2 + 1,
            jnp.where(d < 2, a * d3 - 5 * a * d2 + 8 * a * d - 4 * a, 0.0),
        )
        idx = jnp.clip(i0.astype(jnp.int32) + k, 0, in_size - 1)
        rows = rows + eye[idx] * w[:, None]
    return rows


def resize_bicubic_halfpix(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC bicubic resize, torch a=-0.75 half-pixel semantics, as two
    constant-matrix matmuls.  Used for DAv2 `infer_image` input-resize parity
    (reference dpt.py:230: F.interpolate mode='bicubic'); jax.image.resize
    'cubic' uses the Keys a=-0.5 kernel and anti-aliases downsampling — both
    deviations from torch."""
    assert x.ndim == 4, x.shape
    for axis, out_size in ((2, out_hw[1]), (1, out_hw[0])):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        m = _interp_matrix_bicubic_halfpix(in_size, out_size).astype(x.dtype)
        y = jnp.tensordot(x, m, axes=[[axis], [1]])
        x = jnp.moveaxis(y, -1, axis)
    return x


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC nearest resize (torch `mode='nearest'`: floor(i_out * in/out))."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    ih = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    iw = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    return x[:, ih][:, :, iw]


def interp_like(x: jax.Array, ref: jax.Array) -> jax.Array:
    """Bilinear align-corners resize of x to ref's spatial size (reference update.py:130-132)."""
    return resize_bilinear_align_corners(x, (ref.shape[1], ref.shape[2]))


def avg_pool2d(x: jax.Array, kernel: int, stride: int, padding: int) -> jax.Array:
    """NHWC average pooling, torch semantics with count_include_pad=True
    (divisor is always kernel**2, zero padding)."""
    window = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pads)
    return summed / (kernel * kernel)


def pool2x(x: jax.Array, slices: bool | None = None) -> jax.Array:
    """3x3 stride-2 pad-1 average pool (reference update.py:124-125).

    slices=True computes it as 9 shifted strided slices of a zero-padded
    copy summed — exact same sums.  Measured CATASTROPHICALLY negative
    in-scan (A/B, 1024², r4): loop 3.71 -> 5.87 ms/iter — stride-2
    sublane/lane slices force relayouts on every consumer; the
    reduce_window emitter (77 µs/iter vs a 26 µs read floor) stays the
    default.  Env SA_POOL_SLICES=1 only for profiling."""
    if slices is None:
        import os

        slices = os.environ.get("SA_POOL_SLICES", "0") == "1"
    if not slices:
        return avg_pool2d(x, 3, 2, 1)
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho, wo = (h + 1) // 2, (w + 1) // 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = lax.slice(
                xp, (0, dy, dx, 0), (b, dy + 2 * ho - 1, dx + 2 * wo - 1, c), (1, 2, 2, 1)
            )
            acc = t if acc is None else acc + t
    return acc / 9.0


def pool4x(x: jax.Array) -> jax.Array:
    """5x5 stride-4 pad-1 average pool (reference update.py:127-128)."""
    return avg_pool2d(x, 5, 4, 1)


def avg_pool_last_axis_2(x: jax.Array) -> jax.Array:
    """Average-pool by 2 along the LAST axis (disparity-pyramid construction,
    reference corr.py:88-91: `F.avg_pool2d(corr, [1,2], stride=[1,2])`).

    Odd trailing sizes drop the final element, matching torch's floor division.
    """
    n = x.shape[-1]
    m = (n // 2) * 2
    x = x[..., :m]
    return 0.5 * (x[..., 0::2] + x[..., 1::2])


def sample_1d_linear(values: jax.Array, coords: jax.Array) -> jax.Array:
    """Linear sampling of `values` (..., W) at fractional positions
    `coords` (..., K), with zeros padding outside [0, W-1].

    Matches `F.grid_sample(..., align_corners=True, padding_mode='zeros')`
    restricted to a 1-D row (reference utils/utils.py:19-35 bilinear_sampler,
    which asserts H==1 — "this is a stereo problem").

    Lowering: the windowed-slab tent of ops/corr_lookup.py at radius 0 —
    each position one-hot-selects a (W/nb + 2)-lane slab around its
    coordinate via nb masked static slices, then evaluates the linear tent
    max(0, 1-|j-pos|) over the slab.  Identical values to gather+lerp with
    zeros padding (the tent IS the lerp; out-of-range taps fade to exact
    zeros), but no per-element dynamic gather — XLA lowers take_along_axis
    to an element-at-a-time TPU gather (measured 12 ms of warp gathers in
    the 1024^2 base).  Tiny/indivisible W falls back to the gather."""
    w = values.shape[-1]
    nb = min(8, w // 16)
    if nb < 2 or w % nb:
        x0 = jnp.floor(coords)
        frac = coords - x0
        x0i = x0.astype(jnp.int32)

        def tap(idx, weight):
            valid = (idx >= 0) & (idx <= w - 1)
            safe = jnp.clip(idx, 0, w - 1)
            v = jnp.take_along_axis(values, safe, axis=-1)
            return v * weight * valid.astype(values.dtype)

        return tap(x0i, (1.0 - frac).astype(values.dtype)) + tap(
            x0i + 1, frac.astype(values.dtype)
        )

    block = w // nb
    slab_len = block + 2
    pos = coords.astype(jnp.float32)[..., None]  # (..., K, 1)
    c = jnp.clip(jnp.floor((pos - 1.0) * (1.0 / block)), 0, nb - 1).astype(jnp.int32)
    vp = jnp.pad(values, [(0, 0)] * (values.ndim - 1) + [(0, slab_len - block)])
    vrow = vp[..., None, :]  # (..., 1, W+pad): every position reads one row
    slab = jnp.zeros(coords.shape + (slab_len,), values.dtype)
    for bi in range(nb):
        m = c == bi
        slab = jnp.where(
            m, jax.lax.slice_in_dim(vrow, bi * block, bi * block + slab_len, axis=-1), slab
        )
    local = pos - c.astype(jnp.float32) * block
    j = jnp.arange(slab_len, dtype=jnp.float32)
    wgt = jnp.maximum(1.0 - jnp.abs(j - local), 0.0).astype(values.dtype)
    return jnp.sum(slab * wgt, axis=-1, dtype=jnp.float32).astype(values.dtype)
