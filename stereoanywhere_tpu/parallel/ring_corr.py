"""Ring-sharded all-pairs correlation over the image width (ICI ring).

The (B, H, W2, W3) all-pairs cost volume is the quadratic "attention matrix"
of dense stereo (SURVEY.md §2.7/§5): memory grows with W² and dominates HBM
at high resolution (Booster-scale W).  The reference's only recourse is
overlapping-tile map-reduce on one GPU (reference mapreduce_v2/
tiled_inference.py) or trilinear volume downsampling (reference
stereoanywhere.py:141-145) — both lossy.  The TPU-native answer is the exact
blockwise decomposition used by ring attention:

  * left features are sharded over the mesh axis in W2 (volume rows),
  * right features are sharded in W3 (volume columns),
  * each of the N devices computes its (W2/N, W3/N) block against the right
    block it currently holds, then `ppermute`s the right block to its ring
    neighbor over ICI; after N steps every device owns the FULL disparity
    row-band (B, H, W2/N, W3) of the volume — exactly the slice the
    downstream pyramid/lookup/GRU needs under W2 (image-column) sharding.

Peak per-device memory is O(W²/N) for the volume plus one in-flight right
block O(W/N); compute and communication overlap across ring steps (XLA
pipelines the ppermute with the next block matmul).

`ring_all_pairs_correlation` is the shard_map-callable collective op;
`sharded_correlation_volume` is the host-level convenience wrapper that
builds the mesh ring over an existing axis.

STATUS — demoted to a standalone primitive (kept exact + tested, not on the
model path).  For THIS model, H(row)-sharding strictly dominates
W-sharding for every benchmark shape, so no end-to-end W-sharded inference
consumes the ring: every data-dependent operation in the network (GRU
correlation lookups at arbitrary coords, LRC disparity warps, soft-argmax,
mirror truncation) addresses along the W axes, which stay DEVICE-LOCAL
under H-sharding (volume memory is O(1/N) either way, and H/4 row counts
exceed any slice size on all nine benchmarks) — while under W2-sharding
the warps and lookups need data-dependent cross-device addressing every
GRU iteration.  Full byte-level analysis: ARCHITECTURE.md "Why row
sharding (and not the W axes)".  The ring remains the right primitive for
a hypothetical W-dominant workload (panoramic strips, H/4 < N).
"""
from __future__ import annotations

import functools

import jax

from stereoanywhere_tpu.utils.jit import tpu_jit
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_all_pairs_correlation(
    feat_left: jax.Array, feat_right: jax.Array, axis_name: str
) -> jax.Array:
    """Per-shard body (call inside shard_map over `axis_name`).

    feat_left  (B, H, W2/N, C)  — this device's band of volume rows
    feat_right (B, H, W3/N, C)  — this device's starting right block
    returns    (B, H, W2/N, W3) — full disparity rows for the band, scaled
                                  1/sqrt(C) (reference corr.py:117-132).

    Ring step s: every device computes against the right block that
    originated on device (i - s) mod N and forwards it to device i + 1.
    """
    n = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    b, h, w2_blk, c = feat_left.shape
    w3_blk = feat_right.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.float32(c))

    fwd = [(i, (i + 1) % n) for i in range(n)]

    def block_corr(right_blk):
        vol = jnp.einsum(
            "bhwc,bhvc->bhwv", feat_left, right_blk,
            preferred_element_type=jnp.float32,
        )
        return (vol * scale).astype(feat_left.dtype)

    # mark the accumulator as varying over the ring axis (its contents depend
    # on axis_index), so the fori_loop carry types match
    out = lax.pcast(
        jnp.zeros((b, h, w2_blk, n * w3_blk), feat_left.dtype),
        (axis_name,), to="varying",
    )

    def body(s, carry):
        out, right_blk = carry
        src = (my - s) % n  # origin of the block currently held
        out = lax.dynamic_update_slice(
            out, block_corr(right_blk), (0, 0, 0, src * w3_blk)
        )
        right_blk = lax.ppermute(right_blk, axis_name, fwd)
        return out, right_blk

    # N-1 ring hops; the last block needs no forward.
    out, right_blk = lax.fori_loop(0, n - 1, body, (out, feat_right))
    src = (my - (n - 1)) % n
    out = lax.dynamic_update_slice(out, block_corr(right_blk), (0, 0, 0, src * w3_blk))
    return out


def sharded_correlation_volume(
    feat_left: jax.Array,
    feat_right: jax.Array,
    mesh: Mesh,
    axis: str = "tile",
) -> jax.Array:
    """Build the all-pairs volume with W2 sharded over `axis` via the ICI
    ring.  Inputs are full (replicated or host) arrays (B, H, W, C) with
    W % mesh.shape[axis] == 0; the result is (B, H, W2, W3) sharded over W2.
    """
    n = mesh.shape[axis]
    w = feat_left.shape[2]
    assert w % n == 0, (w, n)

    in_spec = P(None, None, axis, None)
    out_spec = P(None, None, axis, None)

    fn = tpu_jit(
        jax.shard_map(
            functools.partial(ring_all_pairs_correlation, axis_name=axis),
            mesh=mesh,
            in_specs=(in_spec, in_spec),
            out_specs=out_spec,
        ),
        in_shardings=(NamedSharding(mesh, in_spec), NamedSharding(mesh, in_spec)),
        out_shardings=NamedSharding(mesh, out_spec),
    )
    return fn(feat_left, feat_right)
