"""Pallas TPU attention for the DAv2 ViT — natural-layout, unpadded.

Replaces the stock jax flash-attention kernel on the mono branch
(reference's xformers memory_efficient_attention,
models/depth_anything_v2/dinov2_layers/attention.py:65-82).  Why a custom
kernel beats it here (device traces, v5e, ViT-L 518^2, T=1370, hd=64):

- the stock kernel wants (B, H, T, hd) with T a block multiple, which cost
  3.2 ms/forward of pad/unpad to 1536 (12% pad at 512-blocks) plus
  3.2 ms/forward of qkv split+transpose relayouts — both pure HBM traffic;
- at T=1370 the whole K/V row set for one (batch, head) is 171 KB bf16, so
  FLASH-style streaming is unnecessary: one program computes full-row
  softmax attention for a q block with the scores tile (BQ, T) resident in
  VMEM (~2.9 MB at BQ=512) — no running-max renormalization passes;
- q/k/v are read straight out of the fused QKV projection's output
  (B, T, 3*D) — column blocks [2h*hd], [D + 2h*hd], [2D + 2h*hd] — so the
  matmul's natural layout IS the kernel's input layout.  The output lands
  in (B, T, D), the layout the proj matmul wants.  Zero HBM relayouts.

Pallas TPU requires 128-divisible lane blocks, so each program fetches a
HEAD PAIR (2*hd = 128 lanes) and lane-slices the two hd=64 halves in VMEM.

The q-row tail of the last block (rows beyond T) reads out-of-bounds
garbage; softmax is row-independent and Pallas masks out-of-bounds writes,
so garbage never leaks into valid rows.

Used on the TPU forward path only (the VFM is frozen — reference
train.py:262-266 runs it under no_grad; nothing differentiates through
this).  CPU keeps XLA attention (golden tests compare against torch there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, hd: int):
    heads_per_block = q_ref.shape[-1] // hd
    t = k_ref.shape[1]
    for sub in range(heads_per_block):
        sl = slice(sub * hd, (sub + 1) * hd)
        q = q_ref[0, :, sl]  # (BQ, hd)
        k = k_ref[0, :, sl]  # (T, hd)
        v = v_ref[0, :, sl]  # (T, hd)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, T)
        s = s * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(v.dtype)
        # fold the softmax denominator into the PV matmul: a ones-column
        # appended to v (hd=64 pads to 128 lanes anyway, so it is free on
        # the MXU) yields [P@v | rowsum(P)] in one dot — no VPU sum pass,
        # and the divide shrinks from (BQ, T) to (BQ, hd).
        v_ext = jnp.concatenate([v, jnp.ones((t, 1), v.dtype)], axis=1)
        o_ext = jax.lax.dot_general(
            p, v_ext, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, hd+1)
        o = o_ext[:, :hd] / o_ext[:, hd : hd + 1]
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q", "interpret"))
def vit_attention(
    qkv: jax.Array, num_heads: int, block_q: int | None = None, interpret: bool = False
) -> jax.Array:
    """Multi-head attention on a fused-QKV array.

    qkv: (B, T, 3*D) with columns ordered [q heads | k heads | v heads]
         (the reshape-(3, H, hd) order of the reference qkv projection,
         dinov2_layers/attention.py:72-75).
    block_q: query rows per program; None auto-selects the whole sequence
         when the (BQ, T) scores tile fits VMEM (0.198 vs 0.238 ms/layer at
         ViT-L 518², device trace) and falls back to smaller blocks for the
         larger per-dataset DAv2 input sizes (KITTI 1372x518 -> T=3627).
    Returns (B, T, D) attention output in head-concatenated layout.
    """
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    sm_scale = 1.0 / (hd ** 0.5)
    if block_q is None:
        block_q = t
        while block_q > 256 and block_q * t * 6 > 12 * 1024 * 1024:
            block_q = -(-block_q // 2)
    nq = pl.cdiv(t, block_q)
    # head pairs per block: 128 lanes (the Pallas TPU minimum block width)
    hpb = max(128 // hd, 1)
    lanes = hpb * hd
    assert num_heads % hpb == 0 and d % lanes == 0

    grid = (b, num_heads // hpb, nq)
    nh = num_heads // hpb
    qspec = pl.BlockSpec(
        (1, block_q, lanes), lambda bi, h, i: (bi, i, h), memory_space=pltpu.VMEM
    )
    kspec = pl.BlockSpec(
        (1, t, lanes), lambda bi, h, i: (bi, 0, nh + h), memory_space=pltpu.VMEM
    )
    vspec = pl.BlockSpec(
        (1, t, lanes), lambda bi, h, i: (bi, 0, 2 * nh + h), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (1, block_q, lanes), lambda bi, h, i: (bi, i, h), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale, hd=hd),
        out_shape=jax.ShapeDtypeStruct((b, t, d), qkv.dtype),
        grid=grid,
        in_specs=[qspec, kspec, vspec],
        out_specs=ospec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * t * t * hd,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=b * num_heads * t * t,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
