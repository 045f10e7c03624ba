"""Fused level-0 refinement-step kernels (the round-5 perf plan).

The 1024² GRU loop spends ~2.1 of its 3.71 ms/iter OUTSIDE its matmuls —
emitter staging, scan glue and lookup fusions that four rounds of XLA-level
formulations could not reach (ARCHITECTURE.md "Round-5 plan").  The
gru_fused negative taught the boundary rule: a Pallas custom call in-scan
loses unless it owns EVERYTHING between the carries at its scale, so no
quarter-res XLA conv is left adjacent to re-lay out.  These kernels own the
whole level-0 plane via an EXACT loop rotation of the reference body
(reference stereoanywhere.py:267-294):

    original body:  lookup(c) -> motion -> gru -> delta=fh(h') -> c+=delta
    rotated body:   delta=fh(h) -> c+=delta -> lookup(c) -> motion -> gru

(plus one un-rotated pre-step and a flow-head/mask tail — identical math,
see models/stereoanywhere.py).  The rotation shortens the halo chains so
each kernel computes with <=1.5x row recompute at 8-row bands:

  * kernel L  (`fused_step_head`):  flow-head conv pair + coordinate update
    + BOTH correlation-pyramid lookups (reference update.py:6-14,
    corr.py:93-115).  The lookup is the lagged-product tent contraction
    evaluated entirely in VMEM with MXU ones-matmul tap reductions (the
    corr_mxu.py formulation, which standalone lost to XLA on launch/fill
    overhead but wins here by amortizing both across the fused flow-head).
  * kernel F1 (`fused_step_motion`): the motion encoder
    (reference update.py:64-90) — shared-weight convc1/convc2 on both
    correlation streams, convf1/convf2 on flow, the 192->126 merge conv,
    and the [out | flow] concat.
  * kernel F2 (`fused_step_gru`): the level-0 ConvGRU (reference
    update.py:46-62) — z/r/q convs as shifted MXU dots with the [h, x]
    concat never materialized, gates fused on the f32 accumulator.

Slab convention: every activation band lives in a (rows, W2+32, C) VMEM
scratch with the image columns at offset 16 and stage outputs written at
columns [8, W2+24).  The outer 8-column borders are zeroed once and never
written, so any 3x3/7x7 read past a stage's written region lands on zeros
— exactly the XLA convs' zero padding.  Out-of-image rows and the [8,16)
fringe are zeroed by per-stage iota validity masks.

In f32 the kernels are bit-comparable to the XLA path (same sums, modulo
dot reassociation); in bf16 the f32 accumulator chains are *more* precise
than the XLA path's bf16 intermediate adds (exactness-tested with
tolerances; golden suites gate the landing).

No VJP: the fused path is inference-only (gated to test_mode), like the
barrel kernel; training keeps the fully-differentiable XLA formulations.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8  # rows per grid band (VMEM budget; H/4 must be a multiple)


def _dot(a, b, prec=None):
    """2D dot with f32 accumulation.  In f32 the MXU's default precision
    decomposes inputs into bf16 passes (~1e-3 rel error vs the XLA VPU
    reference); HIGHEST restores full f32 products — the f32 path only runs
    in tests, so the 3x pass cost is irrelevant.  bf16 stays on the fast
    single-pass path."""
    import os

    mode = os.environ.get("SA_SF_PREC", "highest")
    if prec is None and mode != "none" and a.dtype == jnp.float32:
        prec = (
            jax.lax.Precision.HIGHEST if mode == "highest" else jax.lax.Precision.DEFAULT
        )
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def fused_step_supported(h) -> bool:
    """Shape gate: 8-row bands (>=2 of them) and 8-aligned widths."""
    _, ht, w2, ch = h.shape
    return ht % R == 0 and ht // R >= 2 and w2 % 8 == 0 and ch == 128


# ---------------------------------------------------------------------------
# weight packing


class HeadWeights(NamedTuple):
    """Flow-head weights for kernel L (UpdateHead conv1 + conv2[..., :1])."""

    kf1: jax.Array  # (3, 3, 128, 256)
    bf1: jax.Array  # (1, 256) f32
    k9: jax.Array  # (256, 9) — conv2 taps as output columns
    bf2: jax.Array  # (1, 1) f32


class MotionWeights(NamedTuple):
    """Motion-encoder weights for kernel F1 (packed/permuted on host)."""

    w_c1: jax.Array  # (128, 128) — convc1 permuted to the interleaved
    # corrfeat layout, block-diagonal over the two streams, input rows
    # padded 2K*L -> 128 (kernel L zero-fills the padding lanes)
    b_c1: jax.Array  # (1, 128) f32
    w_c2: jax.Array  # (3, 3, 128, 128) — convc2 block-diagonal
    b_c2: jax.Array  # (1, 128) f32
    w_f1: jax.Array  # (7, 128, 64) — convf1 row taps; lane dx of the
    # caller-built flowcols128 input carries the column tap flow[w+dx-3]
    # (flow-y channel dropped: structurally zero, stereoanywhere.py:277)
    b_f1: jax.Array  # (1, 64) f32
    w_f2: jax.Array  # (3, 3, 64, 64)
    b_f2: jax.Array  # (1, 64) f32
    w_mc_c: jax.Array  # (3, 3, 128, 128) — _conv corr-half, out padded 126->128
    w_mc_f: jax.Array  # (3, 3, 64, 128) — _conv flow-half
    b_mc: jax.Array  # (1, 128) f32 — padded; lane 126 gets flow, lane 127 zero


class GruWeights(NamedTuple):
    """Level-0 ConvGRU weights for kernel F2, pre-split by input stream."""

    kh_zr: jax.Array  # (3, 3, 128, 256) — [convz|convr] h-slice
    km_zr: jax.Array  # (3, 3, 128, 256) — motion slice
    ku_zr: jax.Array  # (3, 3, 128, 256) — upsampled-net1 slice
    b_zr: jax.Array  # (1, 256) f32
    kh_q: jax.Array  # (3, 3, 128, 128) — convq rh-slice
    km_q: jax.Array  # (3, 3, 128, 128)
    ku_q: jax.Array  # (3, 3, 128, 128)
    b_q: jax.Array  # (1, 128) f32


def pack_head_weights(kf1, bf1, k2, b2, dt) -> HeadWeights:
    """kf1/bf1: flow_head conv1; k2/b2: flow_head conv2 (3,3,256,out>=1)."""
    k9 = k2[..., :1].reshape(9, k2.shape[2]).T  # (256, 9), col t = tap t
    return HeadWeights(
        kf1=kf1.astype(dt),
        bf1=bf1.reshape(1, -1).astype(jnp.float32),
        k9=k9.astype(dt),
        bf2=b2[:1].reshape(1, 1).astype(jnp.float32),
    )


def pack_motion_weights(
    k1, b1, k2c, b2c, kf1, bf1, kf2, bf2, kmc, bmc, num_levels, radius, dt
) -> MotionWeights:
    """Pack MotionEncoder params (reference update.py:64-90).

    k1 (1,1,36,64) convc1 — permuted to consume kernel L's interleaved
    corrfeat channel layout ([lvl0: stereo taps, mono taps][lvl1: ...]) and
    made block-diagonal over the two streams (shared weights, reference
    update.py:81-85).  kmc (3,3,192,126) is split into its corr(128) and
    flow(64) input halves and padded to 128 outputs (lane 126 is later
    overwritten with flow-x, lane 127 stays zero — the reference's
    [out, flow] concat with flow-y == 0).
    """
    k = 2 * radius + 1
    w1 = k1.reshape(num_levels * k, -1)  # (36, 64) level-major taps
    co = w1.shape[-1]
    w1r = w1.reshape(num_levels, k, co)
    z = jnp.zeros_like(w1r)
    blk_a = jnp.concatenate([w1r, z], axis=-1)  # (L, K, 128)
    blk_b = jnp.concatenate([z, w1r], axis=-1)
    w_c1 = jnp.stack([blk_a, blk_b], axis=1).reshape(num_levels * 2 * k, 2 * co)
    w_c1 = jnp.pad(w_c1, ((0, 128 - w_c1.shape[0]), (0, 0)))
    b_c1 = jnp.concatenate([b1, b1])

    z2 = jnp.zeros_like(k2c)
    w_c2 = jnp.concatenate(
        [jnp.concatenate([k2c, z2], axis=3), jnp.concatenate([z2, k2c], axis=3)],
        axis=2,
    )
    b_c2 = jnp.concatenate([b2c, b2c])

    # convf1 row taps (7, 128, 64): row dy, input lane dx -> kf1[dy, dx];
    # lanes 7..127 of flowcols128 are zero padding (zero weight rows)
    w_f1 = jnp.pad(kf1[:, :, 0, :], ((0, 0), (0, 121), (0, 0)))

    pad = jnp.zeros((3, 3, kmc.shape[2], 2), kmc.dtype)
    kmc_p = jnp.concatenate([kmc, pad], axis=-1)  # (3,3,192,128)
    b_mc = jnp.concatenate([bmc, jnp.zeros((2,), bmc.dtype)])
    return MotionWeights(
        w_c1=w_c1.astype(dt),
        b_c1=b_c1.reshape(1, -1).astype(jnp.float32),
        w_c2=w_c2.astype(dt),
        b_c2=b_c2.reshape(1, -1).astype(jnp.float32),
        w_f1=w_f1.astype(dt),
        b_f1=bf1.reshape(1, -1).astype(jnp.float32),
        w_f2=kf2.astype(dt),
        b_f2=bf2.reshape(1, -1).astype(jnp.float32),
        w_mc_c=kmc_p[:, :, :128].astype(dt),
        w_mc_f=kmc_p[:, :, 128:].astype(dt),
        b_mc=b_mc.reshape(1, -1).astype(jnp.float32),
    )


def pack_gru_weights(kz, bz, kr, br_, kq, bq, dt) -> GruWeights:
    """kz/kr/kq: (3,3,(1+nx)*128,128) ConvGRU convs over [h(128), then nx
    128-ch x streams] (reference update.py:53-56).  With nx == 1 the ku_*
    fields alias km_* and are never used."""
    ch = 128
    nx = kz.shape[2] // ch - 1
    kzr = jnp.concatenate([kz, kr], axis=-1)  # (3,3,(1+nx)*128,256)
    km_zr = kzr[:, :, ch : 2 * ch]
    ku_zr = kzr[:, :, 2 * ch :] if nx == 2 else km_zr
    km_q = kq[:, :, ch : 2 * ch]
    ku_q = kq[:, :, 2 * ch :] if nx == 2 else km_q
    return GruWeights(
        kh_zr=kzr[:, :, :ch].astype(dt),
        km_zr=km_zr.astype(dt),
        ku_zr=ku_zr.astype(dt),
        b_zr=jnp.concatenate([bz, br_]).reshape(1, -1).astype(jnp.float32),
        kh_q=kq[:, :, :ch].astype(dt),
        km_q=km_q.astype(dt),
        ku_q=ku_q.astype(dt),
        b_q=bq.reshape(1, -1).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# kernel helpers


def _halo_load(ref, scratch, sem, b, i, hal, htot, w2, col_off=16,
               phase="both"):
    """DMA image rows [i*R - hal, i*R + R + hal) of ref[b] into scratch
    (image columns at `col_off`), clamped at the image edges; out-of-image
    rows zeroed (conv zero-padding).  Scratch row j holds image row
    i*R - hal + j.  Requires >= 2 bands.  phase: "start" issues the copy
    (and edge zeroing), "wait" blocks on it, "both" does both — callers
    with several input slabs start them all, then wait, overlapping the
    DMAs with each other."""
    nb = pl.num_programs(1)
    rank3 = ref.ndim == 3  # (B, H, W2): rank-2 rows (coords)

    def run(src_row0, dst_row0, n):
        if rank3:
            dma = pltpu.make_async_copy(
                ref.at[b, pl.ds(src_row0, n), :],
                scratch.at[pl.ds(dst_row0, n), pl.ds(col_off, w2)],
                sem,
            )
        else:
            dma = pltpu.make_async_copy(
                ref.at[b, pl.ds(src_row0, n), :, :],
                scratch.at[pl.ds(dst_row0, n), pl.ds(col_off, w2), :],
                sem,
            )
        if phase in ("both", "start"):
            dma.start()
        if phase in ("both", "wait"):
            dma.wait()

    zero = phase in ("both", "start")

    @pl.when(i == 0)
    def _():
        if zero:
            scratch[pl.ds(0, hal)] = jnp.zeros_like(scratch[pl.ds(0, hal)])
        run(0, hal, R + hal)

    @pl.when(jnp.logical_and(i == nb - 1, i != 0))
    def _():
        if zero:
            scratch[pl.ds(R + hal, hal)] = jnp.zeros_like(
                scratch[pl.ds(R + hal, hal)]
            )
        run(htot - (R + hal), 0, R + hal)

    if htot >= R + 2 * hal:  # interior bands exist only when >2 fit
        @pl.when(jnp.logical_and(i > 0, i < nb - 1))
        def _():
            run(i * R - hal, 0, R + 2 * hal)


def _stage_mask(i, hal, htot, w2, rows, width, col_img, dt):
    """(rows, width, 1) validity mask over a stage's computed region: row j
    holds image row i*R - hal + j; image columns start at `col_img` within
    the computed region."""
    gr = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) + (i * R - hal)
    gc = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1) - col_img
    ok = (gr >= 0) & (gr < htot) & (gc >= 0) & (gc < w2)
    # minor-dim insertion must happen on a 32-bit type (Mosaic bf16 limit)
    return ok.astype(jnp.float32)[..., None].astype(dt)


def _conv3x3(slabs_ws, rows_out, row0, wc, col0=8, chunk=4, sink=None):
    """3x3 conv as 9 shifted MXU dots, summed over one or more
    (slab, (3,3,Cin,Co) weight-ref) input streams (the split-operand form
    of a conv over a channel concat).  Output value row r corresponds to
    slab row row0+r (row0 = slab_halo - out_extent); reads slab rows
    [row0-1+dy+r] and cols [col0-1+dx, col0-1+dx+wc); returns an f32
    (rows_out, wc, Co) value, accumulated in `chunk`-row chunks to bound
    the f32 accumulator footprint.  With `sink(chunk_f32, r0, n)` the chunks
    are handed off instead (no full-size f32 value ever materializes)."""
    co = slabs_ws[0][1].shape[-1]
    outs = []
    for r0 in range(0, rows_out, chunk):
        n = min(chunk, rows_out - r0)
        acc = None
        for slab, w9 in slabs_ws:
            cin = slab.shape[-1]
            for dy in range(3):
                for dx in range(3):
                    a = slab[
                        row0 - 1 + dy + r0 : row0 - 1 + dy + r0 + n,
                        col0 - 1 + dx : col0 - 1 + dx + wc,
                        :,
                    ].reshape(n * wc, cin)
                    t = _dot(a, w9[dy, dx])
                    acc = t if acc is None else acc + t
        if sink is not None:
            sink(acc.reshape(n, wc, co), r0, n)
        else:
            outs.append(acc.reshape(n, wc, co))
    if sink is not None:
        return None
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _zero_once(b, i, *slabs_borders):
    """Zero each slab's never-written column borders once (first program).
    slabs_borders: (slab, lo, hi) — zero cols [0, lo) and [hi, end).  Rows
    and the written interior are covered by _halo_load / stage writes."""

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        for s, lo, hi in slabs_borders:
            s[:, pl.ds(0, lo)] = jnp.zeros_like(s[:, pl.ds(0, lo)])
            n = s.shape[1] - hi
            s[:, pl.ds(hi, n)] = jnp.zeros_like(s[:, pl.ds(hi, n)])


# ---------------------------------------------------------------------------
# kernel L: flow head + coordinate update + dual pyramid lookup


def _fh_kernel(htot, w2, coords_ref, h_hbm, kf1_ref, bf1_ref, k9_ref,
               bf2_ref, cnew_ref, h_slab, fh1_slab, z9_slab, sems):
    b, i = pl.program_id(0), pl.program_id(1)
    wc = w2 + 16
    dt = h_slab.dtype

    _zero_once(b, i, (h_slab, 16, 16 + w2))
    _halo_load(h_hbm, h_slab, sems.at[0], b, i, 2, htot, w2)

    # flow head conv1: fh1 rows [-1, R+1) (slab row r <-> image i*R-1+r)
    m1 = _stage_mask(i, 1, htot, w2, R + 2, wc, 8, dt)

    def fh1_sink(acc, r0, n):
        fh1_slab[r0 : r0 + n, 8 : 8 + wc, :] = (
            jnp.maximum(acc + bf1_ref[0], 0.0).astype(dt) * m1[r0 : r0 + n]
        )

    _conv3x3([(h_slab, kf1_ref)], R + 2, 1, wc, sink=fh1_sink, chunk=10)

    # flow head conv2 via tap columns: z9 = fh1 @ K9, then 9 shifted adds
    # (exact same sums as the conv; reference update.py:6-14 + the
    # out_slice=1 x-delta-only projection, stereoanywhere.py:277)
    for r0 in range(0, R + 2, 10):
        n = min(10, R + 2 - r0)
        z9 = _dot(
            fh1_slab[r0 : r0 + n, 8 : 8 + wc, :].reshape(n * wc, -1),
            k9_ref[...],
        ).reshape(n, wc, 9)
        z9_slab[r0 : r0 + n, 8 : 8 + wc, :] = z9

    delta = None
    for t in range(9):
        dy, dx = t // 3, t % 3
        # out image row r = z9 slab-row r+1+(dy-1); image col c = slab col
        # c+16, read at c+(dx-1)
        term = z9_slab[dy : dy + R, 15 + dx : 15 + dx + w2, t]
        delta = term if delta is None else delta + term
    cnew_ref[0] = coords_ref[0] + (delta + bf2_ref[0, 0])


def _lookup_kernel(radius, htot, w2, wl, nb, coords_ref, la_ref, lb_ref, corr_ref):
    """One pyramid level's windowed-slab tent lookup (both volumes).

    Each level runs as its OWN pallas_call: Mosaic's stack allocator does
    not reuse buffers across an unrolled multi-level loop (measured 21-31 MB
    OOMs), while per-level programs reuse the same allocation across the
    grid.  The windowed slab evaluates the tent only on an L-lane band
    around each row's coordinate (exact — the removed products are
    structural zeros; XLA _lookup_level_window_pair math)."""
    k = 2 * radius + 1
    kk = 2 * k
    rr = radius + 1
    la = la_ref[0]
    lb = lb_ref[0]
    dt = la.dtype
    block = wl // nb
    sl = block + 2 * rr
    wg = sl + 2 * rr

    li = 0  # scale handled by caller (coords pre-divided)
    pos = coords_ref[0]
    del li
    if nb > 1:
        # max/min instead of jnp.clip: clip is a custom_jvp whose nested
        # closed_call trips a JAX lowering-cache bug under interpreted
        # pallas in a scan (KeyError in cached_primitive_lowerings)
        c = jnp.minimum(
            jnp.maximum(jnp.floor((pos - rr) * (1.0 / block)), 0.0),
            float(nb - 1),
        )
        lap = jnp.pad(la, ((0, 0), (0, 0), (0, sl - block)))
        lbp = jnp.pad(lb, ((0, 0), (0, 0), (0, sl - block)))
        slab_a = jnp.zeros((R, w2, sl), dt)
        slab_b = jnp.zeros((R, w2, sl), dt)
        c3 = c[..., None]  # f32 minor-dim insert (Mosaic bf16 limit)
        for bi in range(nb):
            m = c3 == bi
            slab_a = jnp.where(
                m, jax.lax.slice_in_dim(lap, bi * block, bi * block + sl, axis=-1), slab_a
            )
            slab_b = jnp.where(
                m, jax.lax.slice_in_dim(lbp, bi * block, bi * block + sl, axis=-1), slab_b
            )
        local = pos - c * block
    else:
        slab_a = jnp.pad(la, ((0, 0), (0, 0), (0, sl - wl)))
        slab_b = jnp.pad(lb, ((0, 0), (0, 0), (0, sl - wl)))
        local = pos

    import os

    rc = int(os.environ.get("SA_LOOKUP_RC", "2"))
    tap_cols = jax.lax.broadcasted_iota(jnp.int32, (kk * sl, kk), 1)
    tap_rows = jax.lax.broadcasted_iota(jnp.int32, (kk * sl, kk), 0)
    ones_bd = (tap_rows // sl == tap_cols).astype(dt)
    # lane-concatenated tap products -> ONE ones-matmul per chunk whose
    # output has taps on LANES (per-lane writes measured ~1.2 ms/iter;
    # order: [stereo taps | mono taps]).  Everything is computed per
    # rc-row chunk to bound Mosaic's stack allocation.
    for r0 in range(0, R, rc):
        m = (
            jax.lax.broadcasted_iota(jnp.int32, (rc, w2, wg), 2).astype(
                jnp.float32
            )
            - rr
        )
        g = jnp.maximum(
            1.0 - jnp.abs(m - local[r0 : r0 + rc][..., None]), 0.0
        ).astype(dt)
        prods = []
        for slab in (slab_a, slab_b):
            for t in range(-radius, radius + 1):
                gs = jax.lax.slice_in_dim(g, rr - t, rr - t + sl, axis=-1)
                prods.append(slab[r0 : r0 + rc] * gs)
        stacked = jnp.concatenate(prods, axis=-1).reshape(rc * w2, kk * sl)
        sums = _dot(stacked, ones_bd).reshape(rc, w2, kk)
        corr_ref[0, r0 : r0 + rc] = sums.astype(corr_ref.dtype)


def _lookup_level_call(la, lb, pos, radius, interpret):
    bsz, htot, w2, wl = la.shape
    nb = min(8, wl // 32)
    if nb < 2 or wl % nb or (wl // nb) + 2 * (radius + 1) >= wl:
        nb = 1
    kk = 2 * (2 * radius + 1)
    return pl.pallas_call(
        functools.partial(_lookup_kernel, radius, htot, w2, wl, nb),
        out_shape=jax.ShapeDtypeStruct((bsz, htot, w2, kk), la.dtype),
        grid=(bsz, htot // R),
        in_specs=[
            pl.BlockSpec((1, R, w2), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, R, w2, wl), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, R, w2, wl), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, w2, kk), lambda b, i: (b, i, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * htot * w2 * wl * (2 * radius + 1),
            bytes_accessed=2 * (la.size + lb.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pos, la, lb)


def fused_step_head(
    h, coords, levels_a, levels_b, w: HeadWeights, radius=4, interpret=False
):
    """Kernel L: delta = flow_head(h); coords += delta; corrfeat = lookup.

    Implemented as TWO pallas calls (flow head / dual lookup) — one fused
    kernel OOMs VMEM at 1024² (the level double-buffers + tap products +
    fh value chain sum past 16 MB); the split halves each kernel's
    footprint at the cost of one extra launch and a (B,H4,W4) f32
    round-trip.

    h (B,H4,W4,128); coords (B,H4,W4) f32 (x-coordinate, squeezed).
    Returns (coords_new (B,H4,W4) f32,
             corrfeat (B,H4,W4,128) in h.dtype: lanes [0, 2*L*K) hold the
             interleaved level-major taps [lvl: stereo, mono], the rest are
             zero padding so downstream DMAs stay 128-lane aligned).
    """
    bsz, htot, w2, ch = h.shape
    num_levels = len(levels_a)
    k = 2 * radius + 1
    dt = h.dtype
    wp = w2 + 32
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    cnew = pl.pallas_call(
        functools.partial(_fh_kernel, htot, w2),
        out_shape=jax.ShapeDtypeStruct((bsz, htot, w2), jnp.float32),
        grid=(bsz, htot // R),
        in_specs=[
            pl.BlockSpec((1, R, w2), lambda b, i: (b, i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, R, w2), lambda b, i: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((R + 4, wp, ch), dt),
            pltpu.VMEM((R + 2, wp, 256), dt),
            pltpu.VMEM((R + 2, wp, 9), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * htot * w2 * (9 * ch * 256 + 256 * 9),
            bytes_accessed=2 * (h.size + 4 * coords.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords, h, w.kf1, w.bf1, w.k9, w.bf2)

    pieces = [
        _lookup_level_call(
            levels_a[li], levels_b[li], cnew * (1.0 / (2.0 ** li)), radius,
            interpret,
        )
        for li in range(num_levels)
    ]
    corr = jnp.concatenate(pieces, axis=-1)
    corr = jnp.pad(corr, ((0, 0),) * 3 + ((0, 128 - corr.shape[-1]),))
    return cnew, corr


# ---------------------------------------------------------------------------
# kernel F1: motion encoder


def _motion_kernel(htot, w2, *refs):
    (corr_hbm, flow_hbm) = refs[:2]
    (wc1, bc1, wc2, bc2, wf1, bf1, wf2, bf2, wmcc, wmcf, bmc) = refs[2:13]
    out_ref = refs[13]
    cf_slab, c1_slab, c2_slab, flow_slab, flo1_slab, flo2_slab, sems = refs[14:]
    b, i = pl.program_id(0), pl.program_id(1)
    wc = w2 + 16
    dt = c1_slab.dtype

    _zero_once(
        b, i,
        (cf_slab, 16, 16 + w2), (flow_slab, 16, 16 + w2),
        (c1_slab, 8, 8 + wc), (c2_slab, 8, 8 + wc),
        (flo1_slab, 8, 8 + wc), (flo2_slab, 8, 8 + wc),
    )
    _halo_load(corr_hbm, cf_slab, sems.at[0], b, i, 2, htot, w2, phase="start")
    _halo_load(flow_hbm, flow_slab, sems.at[1], b, i, 5, htot, w2, phase="start")
    _halo_load(corr_hbm, cf_slab, sems.at[0], b, i, 2, htot, w2, phase="wait")
    _halo_load(flow_hbm, flow_slab, sems.at[1], b, i, 5, htot, w2, phase="wait")

    m2 = _stage_mask(i, 2, htot, w2, R + 4, wc, 8, dt)
    # convf1 (7x7, single live flow channel): the caller pre-shifted the 7
    # column taps into lanes (flowcols128), so the conv is 7 row-shifted
    # MXU dots with no in-kernel column gather at all
    for r0 in range(0, R + 4, 12):
        n = min(12, R + 4 - r0)
        f1 = None
        for dy in range(7):
            a = flow_slab[dy + r0 : dy + r0 + n, 8 : 8 + wc, :].reshape(
                n * wc, flow_slab.shape[-1]
            )
            t = _dot(a, wf1[dy])
            f1 = t if f1 is None else f1 + t
        f1 = f1.reshape(n, wc, -1)
        flo1_slab[r0 : r0 + n, 8 : 8 + wc, :] = (
            jnp.maximum(f1 + bf1[0], 0.0).astype(dt) * m2[r0 : r0 + n]
        )

    # convc1: 1x1, both streams block-diagonally (permuted input layout;
    # corrfeat padding lanes hit zero weight rows)
    for r0 in range(0, R + 4, 12):
        n = min(12, R + 4 - r0)
        c1 = _dot(
            cf_slab[r0 : r0 + n, 8 : 8 + wc, :].reshape(n * wc, cf_slab.shape[-1]),
            wc1[...],
        ).reshape(n, wc, -1)
        c1_slab[r0 : r0 + n, 8 : 8 + wc, :] = (
            jnp.maximum(c1 + bc1[0], 0.0).astype(dt) * m2[r0 : r0 + n]
        )

    m1 = _stage_mask(i, 1, htot, w2, R + 2, wc, 8, dt)
    # convc2 (block-diag 128->128) and convf2 (64->64): out rows [-1, R+1)

    def relu_store(slab, bias, mask):
        def sink(acc, r0, n):
            slab[r0 : r0 + n, 8 : 8 + wc, :] = (
                jnp.maximum(acc + bias, 0.0).astype(dt) * mask[r0 : r0 + n]
            )
        return sink

    _conv3x3([(c1_slab, wc2)], R + 2, 1, wc,
             sink=relu_store(c2_slab, bc2[0], m1), chunk=10)
    _conv3x3([(flo1_slab, wf2)], R + 2, 1, wc,
             sink=relu_store(flo2_slab, bf2[0], m1), chunk=10)

    # merge conv (192 -> 126, padded to 128) + the [out | flow] concat:
    # lane 126 <- flow-x, lane 127 stays zero (reference update.py:88-90)
    m0 = _stage_mask(i, 0, htot, w2, R, wc, 8, dt)

    def mc_sink(acc, r0, n):
        mo = jnp.maximum(acc + bmc[0], 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, mo.shape, 2)
        flow_c = flow_slab[5 + r0 : 5 + r0 + n, 8 : 8 + wc, 3:4].astype(jnp.float32)
        mo = jnp.where(lane == 126, flow_c, mo)
        out_ref[0, r0 : r0 + n] = (mo.astype(dt) * m0[r0 : r0 + n])[:, 8 : 8 + w2, :]

    _conv3x3([(c2_slab, wmcc), (flo2_slab, wmcf)], R, 1, wc, sink=mc_sink, chunk=8)


def make_flowcols(flow):
    """(B,H,W) flow -> (B,H,W,128) with lane dx = flow[w + dx - 3] for
    dx in [0,7) (zero-padded shifts; lanes 7+ zero).  Lane 3 is the flow
    itself.  This bakes convf1's column taps into lanes so kernel F1 needs
    no in-kernel column gather."""
    w2 = flow.shape[-1]
    flp = jnp.pad(flow, ((0, 0), (0, 0), (3, 3)))
    cols = jnp.stack([flp[:, :, dx : dx + w2] for dx in range(7)], axis=-1)
    return jnp.pad(cols, ((0, 0),) * 3 + ((0, 121),))


def fused_step_motion(corrfeat, flowcols, w: MotionWeights, interpret=False):
    """Kernel F1: motion features (B,H4,W4,128) = [126-ch encoder | flow-x | 0].

    corrfeat: kernel L's 128-lane interleaved lookup output; flowcols:
    make_flowcols(coords_new - coords0) — the 7 convf1 column taps in
    lanes, keeping every DMA here 128-lane aligned.
    """
    bsz, htot, w2, _ = corrfeat.shape
    dt = corrfeat.dtype
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    wp = w2 + 32
    return pl.pallas_call(
        functools.partial(_motion_kernel, htot, w2),
        out_shape=jax.ShapeDtypeStruct((bsz, htot, w2, 128), dt),
        grid=(bsz, htot // R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ] + [wspec] * 11,
        out_specs=pl.BlockSpec((1, R, w2, 128), lambda b, i: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R + 4, wp, 128), dt),   # corrfeat slab
            pltpu.VMEM((R + 4, wp, 128), dt),   # c1
            pltpu.VMEM((R + 2, wp, 128), dt),   # c2
            pltpu.VMEM((R + 10, wp, 128), dt),  # flow128
            pltpu.VMEM((R + 4, wp, 64), dt),    # flo1
            pltpu.VMEM((R + 2, wp, 64), dt),    # flo2
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * htot * w2
            * (128 * 128 + 9 * 128 * 128 + 49 * 64 + 9 * 64 * 64 + 9 * 192 * 128),
            bytes_accessed=2 * (corrfeat.size + bsz * htot * w2 * 128),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        corrfeat, flowcols,
        w.w_c1, w.b_c1, w.w_c2, w.b_c2, w.w_f1, w.b_f1, w.w_f2, w.b_f2,
        w.w_mc_c, w.w_mc_f, w.b_mc,
    )


# ---------------------------------------------------------------------------
# kernel F2: level-0 ConvGRU


def _gru_kernel(htot, w2, nx, *refs):
    h_hbm = refs[0]
    x_hbms = refs[1 : 1 + nx]
    czrq_hbm = refs[1 + nx]
    wrefs = refs[2 + nx : 2 + nx + 2 * (nx + 1) + 2]
    khzr, bzr, khq, bq = wrefs[0], wrefs[1 + nx], wrefs[2 + nx], wrefs[3 + 2 * nx]
    kx_zr = wrefs[1 : 1 + nx]
    kx_q = wrefs[3 + nx : 3 + 2 * nx]
    out_ref = refs[2 + nx + 2 * (nx + 1) + 2]
    scratch = refs[3 + nx + 2 * (nx + 1) + 2 :]
    h_slab = scratch[0]
    x_slabs = scratch[1 : 1 + nx]
    czrq_slab, z_slab, rh_slab, sems = scratch[1 + nx :]
    b, i = pl.program_id(0), pl.program_id(1)
    wc = w2 + 16
    dt = h_slab.dtype
    ch = h_slab.shape[-1]

    _zero_once(
        b, i,
        (h_slab, 16, 16 + w2),
        *[(xs, 16, 16 + w2) for xs in x_slabs],
        (czrq_slab, 16, 16 + w2), (z_slab, 8, 8 + wc), (rh_slab, 8, 8 + wc),
    )
    for ph in ("start", "wait"):
        _halo_load(h_hbm, h_slab, sems.at[0], b, i, 2, htot, w2, phase=ph)
        for xi, (xh, xs) in enumerate(zip(x_hbms, x_slabs)):
            _halo_load(xh, xs, sems.at[1 + xi], b, i, 2, htot, w2, phase=ph)
        _halo_load(czrq_hbm, czrq_slab, sems.at[1 + nx], b, i, 1, htot, w2, phase=ph)

    # z/r gates at rows [-1, R+1) (the q conv needs rh with a 1-row halo),
    # chunk-sunk so no full-band f32 accumulator ever materializes
    def zr_sink(acc, r0, n):
        azr = acc + bzr[0]
        azr = azr + czrq_slab[r0 : r0 + n, 8 : 8 + wc, : 2 * ch].astype(jnp.float32)
        z = jax.nn.sigmoid(azr[..., :ch])
        r = jax.nn.sigmoid(azr[..., ch:])
        h_c = h_slab[1 + r0 : 1 + r0 + n, 8 : 8 + wc, :].astype(jnp.float32)
        z_slab[r0 : r0 + n, 8 : 8 + wc, :] = z.astype(dt)
        # rh is zero outside the image because h is (no mask needed)
        rh_slab[r0 : r0 + n, 8 : 8 + wc, :] = (r * h_c).astype(dt)

    streams = [(h_slab, khzr)] + [
        (xs, kw) for xs, kw in zip(x_slabs, kx_zr)
    ]
    _conv3x3(streams, R + 2, 1, wc, sink=zr_sink, chunk=10)

    # q gate + blend at the R output rows.  rh slab row j holds image row
    # i*R - 1 + j while the x slabs hold i*R - 2 + j (two row origins).
    for r0 in range(0, R, 8):
        n = min(8, R - r0)
        aq = _conv3x3([(rh_slab, khq)], n, 1 + r0, wc, chunk=8)
        aq = aq + _conv3x3(
            [(xs, kw) for xs, kw in zip(x_slabs, kx_q)], n, 2 + r0, wc, chunk=8
        )
        aq = aq + bq[0] + czrq_slab[
            1 + r0 : 1 + r0 + n, 8 : 8 + wc, 2 * ch :
        ].astype(jnp.float32)
        q = jnp.tanh(aq)
        z_c = z_slab[1 + r0 : 1 + r0 + n, 8 : 8 + wc, :].astype(jnp.float32)
        h_cc = h_slab[2 + r0 : 2 + r0 + n, 8 : 8 + wc, :].astype(jnp.float32)
        out = (1.0 - z_c) * h_cc + z_c * q
        out_ref[0, r0 : r0 + n] = out.astype(dt)[:, 8 : 8 + w2, :]


def fused_step_gru(h, xs, czrq, w: GruWeights, interpret=False):
    """Kernel F2: a ConvGRU update (reference update.py:46-62) at any of
    the cascade's scales.

    h: (B,Hl,Wl,128) hidden state; xs: list of 1 or 2 (B,Hl,Wl,128) input
    streams (level 0: [motion, interp(net1)]; level 1: [pool2x(net0),
    interp(net2)]; level 2: [pool2x(net1)]); czrq: (B,Hl,Wl,384) context
    injections pre-concatenated [cz|cr|cq].  Returns the new hidden state.
    """
    bsz, htot, w2, ch = h.shape
    nx = len(xs)
    dt = h.dtype
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    wp = w2 + 32
    kx_zr = [w.km_zr, w.ku_zr][:nx]
    kx_q = [w.km_q, w.ku_q][:nx]
    return pl.pallas_call(
        functools.partial(_gru_kernel, htot, w2, nx),
        out_shape=jax.ShapeDtypeStruct(h.shape, dt),
        grid=(bsz, htot // R),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 + nx)
        + [wspec] * (2 * (nx + 1) + 2),
        out_specs=pl.BlockSpec((1, R, w2, ch), lambda b, i: (b, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R + 4, wp, ch), dt),        # h
            *[pltpu.VMEM((R + 4, wp, ch), dt) for _ in range(nx)],
            pltpu.VMEM((R + 2, wp, 3 * ch), dt),    # czrq
            pltpu.VMEM((R + 2, wp, ch), dt),        # z
            pltpu.VMEM((R + 2, wp, ch), dt),        # rh
            pltpu.SemaphoreType.DMA((2 + nx,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * htot * w2 * 9 * ((1 + nx) * ch * 3 * ch),
            bytes_accessed=2 * (h.size * 2 + nx * h.size + czrq.size),
            transcendentals=3 * bsz * htot * w2 * ch,
        ),
        interpret=interpret,
    )(
        h, *xs, czrq,
        w.kh_zr, *kx_zr, w.b_zr, w.kh_q, *kx_q, w.b_q,
    )


# ---------------------------------------------------------------------------
# pure-XLA references (exactness oracles for the kernels; also document the
# exact math each kernel owns)


def _conv_ref(x, k, b=None, pad=1):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b.astype(y.dtype)


def step_head_ref(h, coords, levels_a, levels_b, kf1, bf1, k2, b2, radius=4):
    """XLA reference of kernel L (UpdateHead + coords + dual lookup)."""
    from stereoanywhere_tpu.ops.corr_lookup import (
        CorrPyramid,
        lookup_corr_pyramid_pair,
    )

    fh1 = jax.nn.relu(_conv_ref(h, kf1, bf1))
    delta = _conv_ref(fh1, k2[..., :1], b2[:1])
    coords_new = coords + delta[..., 0].astype(jnp.float32)
    ca, cb = lookup_corr_pyramid_pair(
        CorrPyramid(tuple(levels_a), radius),
        CorrPyramid(tuple(levels_b), radius),
        coords_new,
        impl="lagged" if jax.default_backend() != "cpu" else "lagged",
    )
    k = 2 * radius + 1
    parts = []
    for li in range(len(levels_a)):
        parts.append(ca[..., li * k : (li + 1) * k])
        parts.append(cb[..., li * k : (li + 1) * k])
    cf = jnp.concatenate(parts, axis=-1)
    return coords_new, jnp.pad(cf, ((0, 0),) * 3 + ((0, 128 - cf.shape[-1]),))


def step_motion_ref(corrfeat, coords, k1, b1, k2c, b2c, kf1, bf1, kf2, bf2,
                    kmc, bmc, num_levels=4, radius=4):
    """XLA reference of kernel F1 (MotionEncoder, reference update.py:64-90)
    consuming the interleaved (possibly 128-padded) corrfeat layout."""
    k = 2 * radius + 1
    corrfeat = corrfeat[..., : 2 * num_levels * k]
    ca = jnp.concatenate(
        [corrfeat[..., li * 2 * k : li * 2 * k + k] for li in range(num_levels)],
        axis=-1,
    )
    cb = jnp.concatenate(
        [corrfeat[..., li * 2 * k + k : (li + 1) * 2 * k] for li in range(num_levels)],
        axis=-1,
    )
    w2 = corrfeat.shape[2]
    coords0 = jnp.arange(w2, dtype=jnp.float32)[None, None, :]
    flow_x = (coords - coords0)[..., None].astype(corrfeat.dtype)
    flow2 = jnp.concatenate([flow_x, jnp.zeros_like(flow_x)], axis=-1)

    def c12(x):
        y = jax.nn.relu(_conv_ref(x, k1, b1, pad=0))
        return jax.nn.relu(_conv_ref(y, k2c, b2c))

    cor, cor_mono = c12(ca), c12(cb)
    flo = jax.nn.relu(
        jax.lax.conv_general_dilated(
            flow2, kf1.astype(flow2.dtype), (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bf1.astype(flow2.dtype)
    )
    flo = jax.nn.relu(_conv_ref(flo, kf2, bf2))
    out = jax.nn.relu(
        _conv_ref(jnp.concatenate([cor, cor_mono, flo], axis=-1), kmc, bmc)
    )
    return jnp.concatenate([out, flow2], axis=-1)


def step_gru_ref(h, motion, xup, czrq, kz, bz, kr, br_, kq, bq):
    """XLA reference of kernel F2 (ConvGRU math, reference update.py:46-62)."""
    ch = h.shape[-1]
    cz, cr, cq = czrq[..., :ch], czrq[..., ch : 2 * ch], czrq[..., 2 * ch :]
    hx = jnp.concatenate([h, motion, xup], axis=-1)
    z = jax.nn.sigmoid(_conv_ref(hx, kz, bz) + cz)
    r = jax.nn.sigmoid(_conv_ref(hx, kr, br_) + cr)
    rhx = jnp.concatenate([r * h, motion, xup], axis=-1)
    q = jnp.tanh(_conv_ref(rhx, kq, bq) + cq)
    return (1 - z) * h + z * q
