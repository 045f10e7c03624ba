"""Tile-parallel high-resolution inference — the multi-chip replacement for
the reference's sequential overlapping-tile map-reduce (reference
mapreduce_v2/tile_wrapper.py, tiled_inference.py).

Differences by design (TPU-first):

- Tiles are ROWS (full image width per tile).  The all-pairs correlation is
  per-row independent, so row tiles keep the full disparity range and the
  exact epipolar geometry; the reference's W-tiling silently caps disparity
  at the tile width (its "global guidance" second pass exists to patch that,
  reference tiled_inference.py:145-228 — unnecessary here).
- All tiles execute concurrently as ONE SPMD program: the tile stack is a
  batch axis sharded over the mesh's 'tile' axis; XLA partitions the whole
  model.  The reference loops tiles sequentially on one GPU
  (reference tile_wrapper.py:208-247).
- Stitching uses the same sin^2 blend window (reference tile_wrapper.py:36-49)
  over the overlap bands, computed exactly.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import numpy as np

import jax

from stereoanywhere_tpu.utils.jit import tpu_jit
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class TilePlan:
    """Row-tile geometry: n_tiles tiles of tile_h rows, stride = tile_h - overlap."""

    image_h: int
    tile_h: int
    overlap: int
    starts: tuple[int, ...]

    @property
    def n_tiles(self) -> int:
        return len(self.starts)


def plan_row_tiles(image_h: int, n_tiles: int, overlap: int, multiple: int = 32) -> TilePlan:
    """Split H into n_tiles overlapping row bands, tile_h a multiple of 32
    (model constraint, reference test.py:204-213), edge-clamped like
    reference _enumerate_tiles (tile_wrapper.py:101-120)."""
    if n_tiles == 1:
        return TilePlan(image_h, image_h, 0, (0,))
    # minimal tile_h covering image with given overlap, rounded up to multiple
    raw = math.ceil((image_h + (n_tiles - 1) * overlap) / n_tiles)
    tile_h = min(image_h, math.ceil(raw / multiple) * multiple)
    stride = (image_h - tile_h) / max(n_tiles - 1, 1)
    starts = tuple(int(round(i * stride)) for i in range(n_tiles))
    return TilePlan(image_h, tile_h, tile_h - int(math.ceil(stride)), starts)


def blend_window(tile_h: int) -> np.ndarray:
    """sin^2 row weight (reference _make_blend_weight, tile_wrapper.py:36-49),
    clamped away from zero so every pixel keeps support."""
    w = np.sin(np.pi * (np.arange(tile_h) + 0.5) / tile_h) ** 2
    return np.maximum(w, 1e-3).astype(np.float32)


def extract_row_tiles(x: jax.Array, plan: TilePlan) -> jax.Array:
    """(B=1,H,W,C) -> (T, tile_h, W, C) stacked overlapping tiles."""
    tiles = [jax.lax.dynamic_slice_in_dim(x[0], s, plan.tile_h, axis=0) for s in plan.starts]
    return jnp.stack(tiles, axis=0)


def stitch_row_tiles(tiles: jax.Array, plan: TilePlan) -> jax.Array:
    """(T, tile_h, W, C) -> (1, H, W, C) sin^2-blended accumulation."""
    t, th, w, c = tiles.shape
    win = jnp.asarray(blend_window(th))[None, :, None, None]
    acc = jnp.zeros((plan.image_h, w, c), tiles.dtype)
    wacc = jnp.zeros((plan.image_h, 1, 1), tiles.dtype)
    for i, s in enumerate(plan.starts):
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc, jax.lax.dynamic_slice_in_dim(acc, s, th, 0) + tiles[i] * win[0], s, 0
        )
        wacc = jax.lax.dynamic_update_slice_in_dim(
            wacc, jax.lax.dynamic_slice_in_dim(wacc, s, th, 0) + win[0, :, :1, :1], s, 0
        )
    return (acc / wacc)[None]


class TileParallelInference:
    """High-res stereo inference over a device mesh.

    apply_fn(variables, im2, im3, mde2, mde3, iters) -> {'disparity': ...}
    (typically StereoAnywhere.apply with test_mode=True).

    All tiles run as one jitted SPMD program with the tile-batch axis sharded
    over mesh axis 'tile'.
    """

    def __init__(
        self,
        apply_fn: Callable,
        variables: Any,
        mesh: Mesh,
        n_tiles: int | None = None,
        overlap: int = 64,
        iters: int = 32,
        sequential: bool = False,
    ):
        """`sequential=True` runs tiles one-at-a-time via `lax.map` instead of
        as a sharded batch: peak HBM is bounded by ONE tile — the
        single-chip answer for resolutions whose full cost volume exceeds
        HBM (the reference's sequential map-reduce memory behavior, without
        its host round-trips)."""
        self.apply_fn = apply_fn
        self.variables = variables
        self.mesh = mesh
        self.n_tiles = n_tiles or mesh.shape["tile"]
        self.overlap = overlap
        self.iters = iters
        self.sequential = sequential
        self._jitted = {}

    def _build(self, plan: TilePlan, w: int):
        key = (plan.tile_h, plan.n_tiles, w)
        if key in self._jitted:
            return self._jitted[key]

        tile_sharding = NamedSharding(self.mesh, P("tile"))
        repl = NamedSharding(self.mesh, P())

        @tpu_jit
        def run(variables, im2, im3, mde2, mde3):
            t2 = extract_row_tiles(im2, plan)
            t3 = extract_row_tiles(im3, plan)
            m2 = extract_row_tiles(mde2, plan)
            m3 = extract_row_tiles(mde3, plan)
            if self.sequential:
                # one tile at a time: scan bounds peak memory to a single tile
                def one(tile):
                    a, b_, c, d = tile
                    out = self.apply_fn(
                        variables, a[None], b_[None], c[None], d[None], self.iters
                    )
                    return out["disparity"][0]

                disp = jax.lax.map(one, (t2, t3, m2, m3))
            else:
                t2 = jax.lax.with_sharding_constraint(t2, tile_sharding)
                t3 = jax.lax.with_sharding_constraint(t3, tile_sharding)
                m2 = jax.lax.with_sharding_constraint(m2, tile_sharding)
                m3 = jax.lax.with_sharding_constraint(m3, tile_sharding)
                disp = self.apply_fn(variables, t2, t3, m2, m3, self.iters)["disparity"]
            return stitch_row_tiles(disp, plan)

        self._jitted[key] = run
        return run

    def infer(self, im2: jax.Array, im3: jax.Array, mde2: jax.Array, mde3: jax.Array) -> jax.Array:
        """im* (1,H,W,3), mde* (1,H,W,1), H a multiple of 32.
        Returns (1,H,W,1) positive disparity."""
        b, h, w, _ = im2.shape
        assert b == 1, "tile-parallel path is single-image (like reference tile_wrapper.py:148-149)"
        plan = plan_row_tiles(h, self.n_tiles, self.overlap)
        run = self._build(plan, w)
        return run(self.variables, im2, im3, mde2, mde3)
