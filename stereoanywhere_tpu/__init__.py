"""StereoAnywhere-TPU: a TPU-native (JAX/XLA/Pallas) zero-shot stereo depth framework.

A from-scratch reimplementation of the capabilities of the StereoAnywhere
reference (CVPR 2025, kei312/stereoanywhere), designed TPU-first:

- NHWC layouts, bf16-friendly compute, static shapes, `lax.scan` iteration.
- All-pairs 1-D correlation volumes built as MXU batched matmuls.
- Multi-chip scaling via `jax.sharding.Mesh` + `shard_map` (data / spatial tile
  axes) instead of the reference's single-GPU overlapping-tile map-reduce.

Public sign convention: disparity is POSITIVE everywhere at API boundaries
(the reference keeps negative "flow" internally and negates at call sites,
e.g. reference test.py:225).
"""

__version__ = "0.1.0"

from stereoanywhere_tpu.config import StereoAnywhereConfig  # noqa: F401
