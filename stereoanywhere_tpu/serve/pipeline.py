"""Deployable end-to-end pipeline: mono + pad + stereo in ONE jitted graph.

The TPU-native analog of the reference demo wrapper + TensorRT engine
(reference demo/fast_demo_utils.py:19-148): instead of a separate compiled
engine format, the whole mono->stereo graph is one XLA program per input
shape, cached by JAX's persistent compilation cache.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import numpy as np

import jax

from stereoanywhere_tpu.utils.jit import tpu_jit
import jax.numpy as jnp

from stereoanywhere_tpu.config import MonoConfig, StereoAnywhereConfig
from stereoanywhere_tpu.models import StereoAnywhere
from stereoanywhere_tpu.models.dpt import DepthAnythingV2, dav2_input_size, imagenet_normalize
from stereoanywhere_tpu.ops.geometry import joint_minmax_normalize


def _pad_sizes(h: int, w: int, multiple: int = 32):
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    return ph // 2, ph - ph // 2, pw // 2, pw - pw // 2


class StereoAnywherePipeline:
    """image pair in [0,1] -> positive disparity, one fused graph.

    `mono_variables=None` runs stereo-only with caller-provided mono depth
    (mirrors the reference's injected-mono path, fast_demo_utils.py:26-35).
    """

    def __init__(
        self,
        stereo_variables: Any,
        mono_variables: Any | None = None,
        stereo_cfg: StereoAnywhereConfig = StereoAnywhereConfig(),
        mono_cfg: MonoConfig = MonoConfig(),
        iters: int = 32,
        mono_size: tuple[int, int] = (518, 518),
        two_stage: bool = False,
        mesh=None,
        shard_axis: str = "tile",
    ):
        """`two_stage=True` runs mono and stereo as separate jitted programs
        with a host round-trip between them — the memory-saving analog of the
        reference's CPUOffloadWrapper (reference cpu_offload_wrapper.py:13-83):
        peak HBM holds only one branch's activations at a time.

        `mesh` (a jax.sharding.Mesh with a `shard_axis` axis) shards the
        stereo branch's image rows over the mesh: the exact GSPMD multi-chip
        path (parallel/spatial.py) fused into the serving graph — per-device
        cost-volume memory is O(1/N) with no tile seams."""
        self.stereo = StereoAnywhere(stereo_cfg)
        self.mono = DepthAnythingV2(mono_cfg) if mono_variables is not None else None
        self.stereo_variables = stereo_variables
        self.mono_variables = mono_variables
        self.iters = iters
        self.mono_size = mono_size
        self.two_stage = two_stage
        self._row_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._row_sharding = NamedSharding(mesh, P(None, shard_axis))
        self._cache: dict = {}
        self._raw_cache: dict = {}

    def _constrain_rows(self, x):
        if self._row_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self._row_sharding)

    def _build(self, h: int, w: int) -> Callable:
        key = (h, w)
        if key in self._cache:
            return self._cache[key]
        t, b, l, r = _pad_sizes(h, w)

        if self.mono is not None:
            fh, fw = dav2_input_size(h, w, self.mono_size[0], self.mono_size[1])

        def run_raw(stereo_vars, mono_vars, im2, im3, mde2, mde3):
            if self.mono is not None:
                both = jnp.concatenate([im2, im3], axis=0)
                x = jax.image.resize(both, (2, fh, fw, 3), "cubic")
                depth = self.mono.apply(mono_vars, imagenet_normalize(x))
                depth = jax.image.resize(depth, (2, h, w, 1), "bilinear")
                mde2, mde3 = depth[:1], depth[1:]
            mde2, mde3 = joint_minmax_normalize([mde2, mde3])

            pad = ((0, 0), (t, b), (l, r), (0, 0))
            im2p = self._constrain_rows(jnp.pad(im2, pad, mode="edge"))
            im3p = self._constrain_rows(jnp.pad(im3, pad, mode="edge"))
            m2p = self._constrain_rows(jnp.pad(mde2, pad, mode="edge"))
            m3p = self._constrain_rows(jnp.pad(mde3, pad, mode="edge"))

            out = self.stereo.apply(
                stereo_vars, im2p, im3p, m2p, m3p, iters=self.iters, test_mode=True
            )
            disp = out["disparity"]
            return disp[:, t : t + h, l : l + w]

        run = tpu_jit(run_raw)
        # un-jitted body, for callers that embed the fused graph in a larger
        # jit (bench.py's chained timer — compiler options only apply at the
        # top-level jit)
        self._raw_cache[key] = run_raw
        self._cache[key] = run
        return run

    def _build_two_stage(self, h: int, w: int):
        key = ("2s", h, w)
        if key in self._cache:
            return self._cache[key]
        t, b, l, r = _pad_sizes(h, w)
        fh, fw = dav2_input_size(h, w, self.mono_size[0], self.mono_size[1]) if self.mono else (h, w)

        @tpu_jit
        def mono_stage(mono_vars, im2, im3):
            both = jnp.concatenate([im2, im3], axis=0)
            x = jax.image.resize(both, (2, fh, fw, 3), "cubic")
            depth = self.mono.apply(mono_vars, imagenet_normalize(x))
            return jax.image.resize(depth, (2, h, w, 1), "bilinear")

        @tpu_jit
        def stereo_stage(stereo_vars, im2, im3, mde2, mde3):
            mde2, mde3 = joint_minmax_normalize([mde2, mde3])
            pad = ((0, 0), (t, b), (l, r), (0, 0))
            out = self.stereo.apply(
                stereo_vars,
                self._constrain_rows(jnp.pad(im2, pad, mode="edge")),
                self._constrain_rows(jnp.pad(im3, pad, mode="edge")),
                self._constrain_rows(jnp.pad(mde2, pad, mode="edge")),
                self._constrain_rows(jnp.pad(mde3, pad, mode="edge")),
                iters=self.iters,
                test_mode=True,
            )
            return out["disparity"][:, t : t + h, l : l + w]

        self._cache[key] = (mono_stage, stereo_stage)
        return self._cache[key]

    def __call__(self, im2, im3, mde2=None, mde3=None):
        h, w = im2.shape[1:3]
        if self.two_stage and self.mono is not None and mde2 is None:
            import numpy as _np

            mono_stage, stereo_stage = self._build_two_stage(h, w)
            # host round-trip between stages bounds peak HBM to one branch
            depth = _np.asarray(mono_stage(self.mono_variables, im2, im3))
            return stereo_stage(
                self.stereo_variables, im2, im3,
                jnp.asarray(depth[:1]), jnp.asarray(depth[1:]),
            )
        if mde2 is None:
            zero = jnp.zeros((im2.shape[0], h, w, 1), jnp.float32)
            mde2 = mde3 = zero
        run = self._build(h, w)
        return run(self.stereo_variables, self.mono_variables, im2, im3, mde2, mde3)


def serve_http(pipeline: StereoAnywherePipeline, host: str = "0.0.0.0", port: int = 8008):
    """Minimal HTTP front-end (reference demo/fast_demo_server.py:110-176):
    POST /infer with raw float32 tensors; returns uint16 PNG-scale disparity
    (x256) as bytes.  Uses only the standard library."""
    import io
    import json
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/infer":
                self.send_error(404)
                return
            length = int(self.headers["Content-Length"])
            meta_len = int(self.headers.get("X-Meta-Length", 0))
            raw = self.rfile.read(length)
            meta = json.loads(raw[:meta_len])
            h, w = meta["h"], meta["w"]
            arr = np.frombuffer(raw[meta_len:], np.float32).reshape(2, h, w, 3)
            disp = np.asarray(pipeline(jnp.asarray(arr[:1]), jnp.asarray(arr[1:])))
            out = np.clip(disp[0, ..., 0] * 256.0, 0, 65535).astype(np.uint16).tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    server = HTTPServer((host, port), Handler)
    server.serve_forever()
