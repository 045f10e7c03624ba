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


def _pin_xla_dtype_flags() -> None:
    """Append --xla_allow_excess_precision=false to XLA_FLAGS (opt out with
    STEREOANYWHERE_TPU_NO_XLA_FLAGS=1).

    With excess precision allowed (the usual TPU-runtime default), XLA keeps
    whole volume-sized post-matmul chains in f32 when any consumer upcasts
    for statistics, doubling their HBM traffic.  This model pins every
    sensitive reduction to f32 explicitly, so the excess-precision rewrites
    only cost bandwidth.  Measured (v5e, bf16, 32 iters, device traces
    2026-08-18): 512x512 forward 66.8 -> 63.2 ms, 1024x1024 GRU loop
    181.1 -> 171.7 ms.  Takes effect only if set before jax's first import.
    """
    import os
    import sys

    if os.environ.get("STEREOANYWHERE_TPU_NO_XLA_FLAGS") == "1" or "jax" in sys.modules:
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_allow_excess_precision" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_allow_excess_precision=false").strip()


_pin_xla_dtype_flags()

from stereoanywhere_tpu.config import StereoAnywhereConfig  # noqa: F401
