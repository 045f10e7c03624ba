"""Exact row-sharded (GSPMD) full-model inference.

The third leg of the scaling story, alongside batch DP and the sin²-blend
tile path (parallel/tiles.py):

- `parallel/tiles.py` reproduces the reference's overlapping-tile map-reduce
  semantics (reference mapreduce_v2/tile_wrapper.py:101-186) — approximate at
  tile seams by construction, because each tile is an independent model call
  and overlaps are sin²-blended.
- THIS path is the TPU-native exact answer (SURVEY.md §2.7/§7: "row-shard H
  with halo exchange — exact, unlike sin²-blend tiles"): the image-row axis
  of every activation, the (B,H/4,W2,W3) cost volumes included, is sharded
  over the mesh, and the model runs as ONE partitioned XLA program.  We do
  not hand-write the halos — the inputs carry a NamedSharding over H and
  XLA's SPMD partitioner propagates it through the whole graph, inserting
  halo exchanges for the 3×3/3-D convolutions and psums for the global
  reductions (weighted LSQ, normalizations) automatically.  That is the
  "pick a mesh, annotate shardings, let XLA insert collectives" recipe, and
  it produces the same numerics as the single-device program up to float
  reduction order (tested to ~1e-4 on the 8-device CPU mesh).

Per-device cost-volume memory is O(H·W²/N): Booster-scale images that blow
single-chip HBM (ARCHITECTURE.md "High resolution") fit at N chips with no
seams and no disparity-range cap.  Cross-scale bilinear resizes contract the
sharded H axis with a constant interpolation matrix (ops/interp.py), so XLA
resolves them with small all-gathers at 1/8–1/16 resolution — negligible
traffic next to the volume itself.

Why rows and not columns: the all-pairs correlation and every disparity-axis
reduction are per-row independent, so H-sharding needs halos only for conv
receptive fields; W-sharding would split the epipolar line itself (that
decomposition exists too, as the explicit ring in parallel/ring_corr.py).
"""
from __future__ import annotations

from typing import Any, Callable

import jax

from stereoanywhere_tpu.utils.jit import tpu_jit
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class RowShardedInference:
    """High-/full-res stereo inference with image rows sharded over `axis`.

    apply_fn(variables, im2, im3, mde2, mde3, iters) -> {'disparity': ...}
    (typically StereoAnywhere.apply with test_mode=True).

    Unlike TileParallelInference there is no tile geometry, no overlap and no
    blend window: the result is bitwise the single-device program's up to
    float reduction order.
    """

    def __init__(
        self,
        apply_fn: Callable,
        variables: Any,
        mesh: Mesh,
        axis: str = "tile",
        iters: int = 32,
    ):
        self.apply_fn = apply_fn
        self.variables = variables
        self.mesh = mesh
        self.axis = axis
        self.iters = iters
        rows = NamedSharding(mesh, P(None, axis))  # (B, H, W, C): shard H
        repl = NamedSharding(mesh, P())
        iters_ = iters
        apply = apply_fn

        def run(v, im2, im3, mde2, mde3):
            return apply(v, im2, im3, mde2, mde3, iters_)["disparity"]

        self._jitted = tpu_jit(
            run,
            in_shardings=(repl, rows, rows, rows, rows),
            out_shardings=rows,
        )

    def infer(self, im2: jax.Array, im3: jax.Array, mde2: jax.Array, mde3: jax.Array):
        """im* (B,H,W,3), mde* (B,H,W,1), H a multiple of 32.
        Returns (B,H,W,1) positive disparity, row-sharded over the mesh."""
        return self._jitted(self.variables, im2, im3, mde2, mde3)
