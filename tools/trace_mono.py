"""Device-trace breakdown of the mono branch (DAv2 forward, both views).

Same methodology as tools/trace_model.py: warm up a jitted forward, capture
one execution under jax.profiler, print per-op totals with source
attribution.

Usage: python tools/trace_mono.py [--encoder vitl] [--size 518] [--top 40]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.trace_model import summarize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="vitl")
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-source", action="store_true")
    ap.add_argument("--out", default="/tmp/jax_trace_mono")
    ap.add_argument("--dump-hlo", default="")
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.config import MonoConfig
    from stereoanywhere_tpu.models.dpt import DepthAnythingV2, imagenet_normalize
    from stereoanywhere_tpu.utils.jit import TPU_COMPILER_OPTIONS

    print(f"backend={jax.default_backend()}", flush=True)
    model = DepthAnythingV2(MonoConfig.for_encoder(args.encoder))
    init_fn = jax.jit(model.init)
    variables = init_fn(jax.random.PRNGKey(0), jnp.zeros((1, 126, 126, 3), jnp.float32))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 1, (args.batch, args.size, args.size, 3)).astype(np.float32)
    )

    # params passed as an ARGUMENT: closing over the 334M-param tree embeds
    # ~668 MB of constants in the program (the remote compile service
    # rejects the request with HTTP 413)
    @functools.partial(jax.jit, compiler_options=TPU_COMPILER_OPTIONS)
    def fwd(v, img):
        return jnp.mean(model.apply(v, imagenet_normalize(img)).astype(jnp.float32))

    float(fwd(variables, x))
    float(fwd(variables, x))

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        float(fwd(variables, x))

    summarize(args.out, args.top, by_source=args.by_source)

    if args.dump_hlo:
        txt = fwd.lower(variables, x).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO -> {args.dump_hlo} ({len(txt)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
