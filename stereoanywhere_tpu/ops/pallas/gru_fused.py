"""Fused ConvGRU update kernels (the GRU half of the refinement step).

The 1024² GRU loop spends ~2.6 ms/iter OUTSIDE its matmuls (device trace,
v5e): hx-concat copies, per-conv zero pads, sigmoid/tanh gate fusions and
scan bookkeeping — while XLA runs the convs themselves at MXU peak.  These
two kernels keep the convs as 9 shifted MXU dots and absorb everything
around them:

  gru_zr:  z  = sigmoid(conv3x3([h, x]) + cz)        (z and r in one pass)
           rh = sigmoid(conv3x3([h, x]) + cr) * h
  gru_q:   h' = (1-z) h + z tanh(conv3x3([rh, x]) + cq)

The concat never materializes (h and x get separate weight slices, summed
in the accumulator), the conv zero-padding lives in an 8-col-aligned VMEM scratch border,
and the gates run on the accumulator before it leaves VMEM.  The rh/z
intermediates round-trip HBM once (bf16) so each kernel only needs a
1-row halo; the q conv reads rh produced by neighboring bands.

Halo handling: each band DMAs a fixed (BR+2)-row window with a clamped
start; the first/last bands roll the scratch by one row and zero the
out-of-image border row (conv zero-padding semantics).

STATUS — NEGATIVE RESULT (round 4, final): standalone the fused pair is
2.2x the XLA step (0.97 vs 2.14 ms at the 1024² level-0 shapes), but
in-scan the custom-call layout boundary makes XLA re-lay-out every
neighboring conv (loop 138 -> 154.5/194.4 ms at 1024², device traces
2026-08-20).  No shipped path isolates the GRU from the scan — the serve
pipeline jits the whole forward — so there is no consumer for the
standalone win; `fused=False` everywhere.  Kept only as a documented,
exactness-tested negative like the five lookup kernels (ARCHITECTURE.md
negative-kernel index).  Reference ConvGRU: update.py:46-62.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_load(ref, scratch, sem, b, i, br, h_total):
    """DMA the rows [i*br-1, i*br+br+1) of ref[b] into scratch[:, 1:W+1, :]
    (scratch row j holds image row i*br-1+j).  Edge bands copy one row fewer
    (fixed per-branch sizes) and zero the out-of-image border row — the
    conv's zero-padding semantics.  Returns nothing (scratch mutated)."""
    w = ref.shape[2]
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        scratch[0, pl.ds(8, w), :] = jnp.zeros_like(scratch[0, pl.ds(8, w), :])
        dma = pltpu.make_async_copy(
            ref.at[b, pl.ds(0, br + 1), :, :],
            scratch.at[pl.ds(1, br + 1), pl.ds(8, w), :],
            sem,
        )
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(i == nb - 1, i != 0))
    def _():
        scratch[br + 1, pl.ds(8, w), :] = jnp.zeros_like(
            scratch[br + 1, pl.ds(8, w), :]
        )
        dma = pltpu.make_async_copy(
            ref.at[b, pl.ds(h_total - (br + 1), br + 1), :, :],
            scratch.at[pl.ds(0, br + 1), pl.ds(8, w), :],
            sem,
        )
        dma.start()
        dma.wait()

    @pl.when(jnp.logical_and(i > 0, i < nb - 1))
    def _():
        dma = pltpu.make_async_copy(
            ref.at[b, pl.ds(i * br - 1, br + 2), :, :],
            scratch.at[:, pl.ds(8, w), :],
            sem,
        )
        dma.start()
        dma.wait()


def _conv9(hs, xs, wh_ref, wx_ref, br, w):
    """Sum of 9 shifted dots over the haloed bands hs (br+2, w+16, ch) and
    xs (br+2, w+16, cx) — image columns live at offset 8 (sublane-aligned),
    taps slice offsets 7/8/9 — with weights (3, 3, c, co). f32 accumulator."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            a = hs[dy : dy + br, dx + 7 : dx + 7 + w, :].reshape(br * w, hs.shape[-1])
            term = jax.lax.dot_general(
                a, wh_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            b = xs[dy : dy + br, dx + 7 : dx + 7 + w, :].reshape(br * w, xs.shape[-1])
            term = term + jax.lax.dot_general(
                b, wx_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
    return acc  # (br*w, co)


def _zr_kernel(
    h_hbm, x_hbm, cz_ref, cr_ref, wh_ref, wx_ref, b_ref,
    z_ref, rh_ref, hs, xs, sems, *, br: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    htot, w = h_hbm.shape[1], h_hbm.shape[2]
    ch = h_hbm.shape[-1]

    @pl.when(i == 0)
    def _():
        hs[:, pl.ds(0, 8), :] = jnp.zeros_like(hs[:, pl.ds(0, 8), :])
        hs[:, pl.ds(w + 8, 8), :] = jnp.zeros_like(hs[:, pl.ds(w + 8, 8), :])
        xs[:, pl.ds(0, 8), :] = jnp.zeros_like(xs[:, pl.ds(0, 8), :])
        xs[:, pl.ds(w + 8, 8), :] = jnp.zeros_like(xs[:, pl.ds(w + 8, 8), :])

    _band_load(h_hbm, hs, sems.at[0], bi, i, br, htot)
    _band_load(x_hbm, xs, sems.at[1], bi, i, br, htot)

    acc = _conv9(hs, xs, wh_ref, wx_ref, br, w) + b_ref[0].astype(jnp.float32)
    acc = acc.reshape(br, w, 2 * ch)
    z = jax.nn.sigmoid(acc[..., :ch] + cz_ref[0].astype(jnp.float32))
    r = jax.nn.sigmoid(acc[..., ch:] + cr_ref[0].astype(jnp.float32))
    h_int = hs[1 : 1 + br, 8 : 8 + w, :].astype(jnp.float32)
    z_ref[0] = z.astype(z_ref.dtype)
    rh_ref[0] = (r * h_int).astype(rh_ref.dtype)


def _q_kernel(
    rh_hbm, x_hbm, cq_ref, h_ref, z_ref, wh_ref, wx_ref, b_ref,
    out_ref, rhs, xs, sems, *, br: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    htot, w = rh_hbm.shape[1], rh_hbm.shape[2]

    @pl.when(i == 0)
    def _():
        rhs[:, pl.ds(0, 8), :] = jnp.zeros_like(rhs[:, pl.ds(0, 8), :])
        rhs[:, pl.ds(w + 8, 8), :] = jnp.zeros_like(rhs[:, pl.ds(w + 8, 8), :])
        xs[:, pl.ds(0, 8), :] = jnp.zeros_like(xs[:, pl.ds(0, 8), :])
        xs[:, pl.ds(w + 8, 8), :] = jnp.zeros_like(xs[:, pl.ds(w + 8, 8), :])

    _band_load(rh_hbm, rhs, sems.at[0], bi, i, br, htot)
    _band_load(x_hbm, xs, sems.at[1], bi, i, br, htot)

    acc = _conv9(rhs, xs, wh_ref, wx_ref, br, w) + b_ref[0].astype(jnp.float32)
    ch = rh_hbm.shape[-1]
    q = jnp.tanh(acc.reshape(br, w, ch) + cq_ref[0].astype(jnp.float32))
    z = z_ref[0].astype(jnp.float32)
    h = h_ref[0].astype(jnp.float32)
    out_ref[0] = ((1.0 - z) * h + z * q).astype(out_ref.dtype)


def gru_fused_supported(h) -> bool:
    """Shape gate: W must be sublane-aligned (the scratch border zeroing
    slices at multiples of 8) and H must split into >=2 bands."""
    _, ht, w, _ = h.shape
    return w % 8 == 0 and ht % 2 == 0 and ht >= 4


def _pick_br(h: int) -> int:
    # br=8 keeps the largest level (256x256, ch+cx=384) under the 16 MB
    # VMEM budget (br=16 OOMs at 19.5 MB); smaller levels gain nothing
    # from larger bands (they are launch/DMA-bound either way)
    for br in (8, 4, 2):
        if h % br == 0 and h // br >= 2:
            return br
    return h


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_fused(h, x, cz, cr, cq, wzr, bzr, wq, bq, interpret: bool = False):
    """Fused ConvGRU step.

    h (B,H,W,Ch), x (B,H,W,Cx): hidden state and concatenated inputs.
    wzr (3,3,Ch+Cx,2Ch), wq (3,3,Ch+Cx,Ch): torch-layout-converted conv
    kernels over the [h, x] concatenation (h channels first — reference
    update.py:53-56); split here so the concat never materializes.
    Returns the new hidden state, same shape/dtype as h.
    """
    bsz, htot, w, ch = h.shape
    cx = x.shape[-1]
    br = _pick_br(htot)
    nb = htot // br
    dt = h.dtype

    wzr_h, wzr_x = wzr[:, :, :ch], wzr[:, :, ch:]
    wq_h, wq_x = wq[:, :, :ch], wq[:, :, ch:]

    int_spec = lambda c: pl.BlockSpec(  # noqa: E731 — interior row band
        (1, br, w, c), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.ANY)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    z, rh = pl.pallas_call(
        functools.partial(_zr_kernel, br=br),
        out_shape=(
            jax.ShapeDtypeStruct(h.shape, dt),
            jax.ShapeDtypeStruct(h.shape, dt),
        ),
        grid=(bsz, nb),
        in_specs=[full, full, int_spec(ch), int_spec(ch), wspec, wspec, wspec],
        out_specs=(int_spec(ch), int_spec(ch)),
        scratch_shapes=[
            pltpu.VMEM((br + 2, w + 16, ch), dt),
            pltpu.VMEM((br + 2, w + 16, cx), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * htot * w * 9 * (ch + cx) * 2 * ch,
            bytes_accessed=(h.size + x.size) * 2 * h.dtype.itemsize,
            transcendentals=2 * bsz * htot * w * ch,
        ),
        interpret=interpret,
    )(
        h, x, cz, cr,
        wzr_h.astype(dt), wzr_x.astype(dt), bzr.reshape(1, -1).astype(dt),
    )

    return pl.pallas_call(
        functools.partial(_q_kernel, br=br),
        out_shape=jax.ShapeDtypeStruct(h.shape, dt),
        grid=(bsz, nb),
        in_specs=[
            full, full, int_spec(ch), int_spec(ch), int_spec(ch),
            wspec, wspec, wspec,
        ],
        out_specs=int_spec(ch),
        scratch_shapes=[
            pltpu.VMEM((br + 2, w + 16, ch), dt),
            pltpu.VMEM((br + 2, w + 16, cx), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * htot * w * 9 * (ch + cx) * ch,
            bytes_accessed=(h.size * 3 + x.size) * 2 * h.dtype.itemsize,
            transcendentals=bsz * htot * w * ch,
        ),
        interpret=interpret,
    )(
        rh, x, cq, h, z,
        wq_h.astype(dt), wq_x.astype(dt), bq.reshape(1, -1).astype(dt),
    )
