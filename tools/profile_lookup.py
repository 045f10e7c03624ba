"""Compare correlation-lookup formulations on the real chip.

The GRU loop indexes two same-shape pyramids at shared coords every
iteration (ops/corr_lookup.py).  Formulations (all exactly the reference
bilinear_sampler math):

  lagged   shared materialized tent array g, 2r+1 static slices
           (current TPU default)
  inline   per-tap tent recomputed from (iota, pos) inside each tap's
           fusion — no materialized g, floor traffic = K x levels
  pl-lag   Pallas single-pass lagged-product (shared g in VMEM, static
           lane-shifted slices; ops/pallas/corr_lagged.py)
  pl-tent  Pallas single-pass dense-tent (ops/pallas/corr_tent.py;
           documented VPU-bound negative result)

Usage: python tools/profile_lookup.py [--size 512]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--n-chain", type=int, default=128)
    ap.add_argument("--xla-only", action="store_true")
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401 — XLA dtype flags (no-op if jax preloaded; tpu_jit carries them per-compile)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.ops.corr_lookup import (
        _lookup_level_inline_tent_pair,
        _lookup_level_lagged_pair,
        _lookup_level_window_pair,
    )
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()}")
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h4 = w4 = args.size // 4
    b = 1
    rng = np.random.default_rng(0)
    levels_a = tuple(
        jnp.asarray(rng.standard_normal((b, h4, w4, w4 // 2**i)).astype(np.float32)).astype(cdt)
        for i in range(4)
    )
    levels_b = tuple(
        jnp.asarray(rng.standard_normal((b, h4, w4, w4 // 2**i)).astype(np.float32)).astype(cdt)
        for i in range(4)
    )
    coords = jnp.asarray(
        rng.uniform(0, w4, (b, h4, w4)).astype(np.float32)
    )

    import functools

    for name, pair_fn in [
        ("lagged", _lookup_level_lagged_pair),
        ("inline", _lookup_level_inline_tent_pair),
        ("window", _lookup_level_window_pair),
        ("win-nb4", functools.partial(_lookup_level_window_pair, nb_cap=4)),
        ("win-lag4", functools.partial(_lookup_level_window_pair, inner="lagged")),
        ("win-lag8", functools.partial(_lookup_level_window_pair, nb_cap=8, inner="lagged")),
    ]:
        def lk(coords, *levels):
            la, lb = levels[:4], levels[4:]
            outs = []
            for i in range(4):
                oa, ob = pair_fn(la[i], lb[i], coords / (2**i), 4)
                outs.append(jnp.mean(oa.astype(jnp.float32)) + jnp.mean(ob.astype(jnp.float32)))
            return sum(outs)

        t = chained_timer(lk, coords, *levels_a, *levels_b, n_chain=args.n_chain)
        print(f"{name:10s} {t*1e3:8.3f} ms / iteration-pair")

    if args.xla_only:
        return

    from stereoanywhere_tpu.ops.pallas.corr_barrel import dual_lookup_barrel
    from stereoanywhere_tpu.ops.pallas.corr_lagged import dual_lookup_lagged
    from stereoanywhere_tpu.ops.pallas.corr_mxu import dual_lookup_mxu
    from stereoanywhere_tpu.ops.pallas.corr_tent import dual_lookup_tent

    for name, dual_fn in [
        ("pl-barrel", dual_lookup_barrel),
        ("pl-lag", dual_lookup_lagged),
        ("pl-mxu", dual_lookup_mxu),
        ("pl-tent", dual_lookup_tent),
    ]:
        def lk_pl(coords, *levels):
            oa, ob = dual_fn(levels[:4], levels[4:], coords, 4)
            return jnp.mean(oa.astype(jnp.float32)) + jnp.mean(ob.astype(jnp.float32))

        try:
            t = chained_timer(lk_pl, coords, *levels_a, *levels_b, n_chain=args.n_chain)
        except Exception as e:  # noqa: BLE001 — report and keep comparing
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:10s} {t*1e3:8.3f} ms / iteration-pair")


if __name__ == "__main__":
    main()
