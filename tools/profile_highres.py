"""High-resolution (1024x1024) single-chip latency measurement.

Baseline: reference paper Table 7 (sterereere.md:1372-1377): 0.61 s stereo
branch at 1024x1024 on 1xA100 (total 0.63 s incl. DAv2), peak 6.31 GB.

Paths measured (all reference-sanctioned semantics, see ARCHITECTURE.md):
  direct          full-resolution forward (expected HBM-bound; may OOM)
  tiles=N         sequential row tiles via lax.map (peak HBM = one tile)
  vol_downsample  the reference's own --vol_downsample flag (8x smaller vols)

Usage: python tools/profile_highres.py [--size 1024] [--iters 32]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--paths", nargs="+", default=["tiles2", "tiles4", "voldown", "direct"])
    ap.add_argument("--n-chain", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import Mesh
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere
    from stereoanywhere_tpu.parallel.tiles import TileParallelInference, plan_row_tiles
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()}", flush=True)
    h = w = args.size
    rng = np.random.default_rng(0)
    xs = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, h, w, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    tiny = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 96, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )

    def build(cfg):
        model = StereoAnywhere(cfg)
        init_fn = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))
        variables = init_fn(jax.random.PRNGKey(0), *tiny)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
        )
        return model, variables

    results = {}

    def report(name, t):
        results[name] = t
        print(f"{name}: {t * 1e3:.1f} ms  (A100 baseline 610 ms -> {0.61 / t:.2f}x)", flush=True)

    for path in args.paths:
        try:
            if path == "direct" or path == "voldown":
                cfg = StereoAnywhereConfig(
                    compute_dtype="bfloat16",
                    vol_downsample=1 if path == "voldown" else 0,
                )
                model, variables = build(cfg)

                def fwd(v, im2, im3, m2, m3):
                    return model.apply(
                        v, im2, im3, m2, m3, iters=args.iters, test_mode=True
                    )["disparity"]

                t = chained_timer(
                    fwd, *xs, n_chain=args.n_chain, repeats=3, const_args=(variables,)
                )
                report(path, t)
            elif path.startswith("tiles"):
                n_tiles = int(path[len("tiles"):])
                cfg = StereoAnywhereConfig(compute_dtype="bfloat16")
                model, variables = build(cfg)

                def apply_fn(v, a, b, c, d, iters):
                    return model.apply(v, a, b, c, d, iters=iters, test_mode=True)

                mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("tile",))
                tp = TileParallelInference(
                    apply_fn, variables, mesh, n_tiles=n_tiles, overlap=64,
                    iters=args.iters, sequential=True,
                )
                plan = plan_row_tiles(h, n_tiles, 64)
                print(f"{path}: tile_h={plan.tile_h} starts={plan.starts}", flush=True)
                run = tp._build(plan, w)
                t = chained_timer(
                    run, *xs, n_chain=args.n_chain, repeats=3, const_args=(variables,)
                )
                report(path, t)
        except Exception as e:  # OOM etc. — report and continue
            msg = str(e).splitlines()[0][:200]
            print(f"{path}: FAILED: {type(e).__name__}: {msg}", flush=True)

    print({k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
