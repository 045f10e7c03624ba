"""Stage-level latency breakdown of the non-loop ("base") part of the
forward pass on the real chip: encoders, volumes, masked-volume build,
hourglass, classifiers, coarse heads, LSQ, pyramids.

Complements tools/profile_gru.py (loop body) and tools/profile_model.py
(total vs iters slope).  Usage: python tools/profile_base.py [--size 512]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models.extractor import ContextEncoder, FeatureEncoder
    from stereoanywhere_tpu.models.hourglass import Hourglass
    from stereoanywhere_tpu.ops import (
        all_pairs_correlation,
        build_corr_pyramid,
        estimate_left_confidence,
        estimate_left_disparity,
        estimate_normals,
        estimate_right_confidence,
        estimate_right_disparity,
        generate_masks,
        softlrc,
        weighted_lsq,
    )
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()}")
    cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h = w = args.size
    h4 = w4 = args.size // 4
    b = 1
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=cdt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    results = {}

    def tmod(name, module, *xs, n_chain=32, **apply_kw):
        variables = jax.jit(lambda k: module.init(k, *xs, **apply_kw))(jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, variables
        )

        def fn(*a):
            return module.apply(variables, *a, **apply_kw)

        t = chained_timer(fn, *xs, n_chain=n_chain)
        results[name] = t
        print(f"{name:44s} {t*1e3:8.3f} ms")

    def tfn(name, fn, *xs, n_chain=32):
        t = chained_timer(fn, *xs, n_chain=n_chain)
        results[name] = t
        print(f"{name:44s} {t*1e3:8.3f} ms")

    images = arr(2 * b, h, w, 3)
    mde = arr(b, h, w, 1)
    mde3 = jnp.concatenate([mde] * 3, axis=-1)
    tmod("fnet (both views)", FeatureEncoder(cfg.fnet_dim), images, train=False)
    tmod("cnet (mono x3)", ContextEncoder(), mde3, train=False)

    fmap = arr(b, h4, w4, 256)
    tfn("all-pairs corr (stereo)", all_pairs_correlation, fmap, fmap)
    mde_low = jnp.abs(arr(b, h4, w4, 1, dtype=jnp.float32))
    tfn("normals + corr (mono vol)",
        lambda m, m2: all_pairs_correlation(
            estimate_normals(m, w4 / 10).astype(cdt), estimate_normals(m2, w4 / 10).astype(cdt)
        ),
        mde_low, mde_low)
    tfn("generate_masks (both)", lambda m: (generate_masks(m, 8), generate_masks(m, 8)), mde_low)

    from stereoanywhere_tpu.ops.folded import build_masked_volume_folded

    vol = arr(b, h4, w4, w4, dtype=jnp.float32)
    masks = jnp.abs(arr(b, h4, w4, 8))
    tfn(
        "masked mono volume build (folded)",
        lambda v, lm, rm: build_masked_volume_folded(v, lm, rm, cdt),
        vol, masks, masks, n_chain=16,
    )

    # folded layout, matching the shipped default (cfg.hourglass_folded)
    masked = arr(b, w4, h4, w4 * 8)
    fmde = [arr(b, h4 // (2 ** i), w4 // (2 ** i), 1) for i in range(4)]
    tmod("hourglass_mono (folded)", Hourglass(8, 8, folded=True), masked, fmde, fmde, n_chain=8)

    # the REAL classifier module (banded-fold path on TPU), shipped channels
    from stereoanywhere_tpu.models.stereoanywhere import Conv3dClassifier

    agg = arr(b, w4, h4, w4 * 8)
    tmod(
        "classifier conv3d x2 (incl conf)", Conv3dClassifier(), agg,
        n_chain=8, folded_w=w4,
    )

    agg_disp = arr(b, h4, w4, w4, dtype=jnp.float32)
    tfn("soft-argmax L+R + conf L+R",
        lambda a: (
            estimate_left_disparity(a), estimate_right_disparity(a),
            estimate_left_confidence(a), estimate_right_confidence(a),
        ),
        agg_disp, n_chain=16)

    d_low = jnp.abs(arr(b, h4, w4, 1, dtype=jnp.float32))
    tfn("softlrc + weighted_lsq",
        lambda d, d2, m, c: weighted_lsq(
            jnp.concatenate([m, m], -1), jnp.concatenate([d, d2], -1),
            jnp.concatenate([softlrc(d, d2, 1.0)[0], softlrc(d, d2, 1.0)[1]], -1) * c,
        ),
        d_low, d_low, mde_low, jnp.abs(arr(b, h4, w4, 2, dtype=jnp.float32)))

    volc = arr(b, h4, w4, w4)
    tfn("build 2 corr pyramids", lambda v, v2: (build_corr_pyramid(v), build_corr_pyramid(v2)),
        volc, volc, n_chain=16)

    print(f"\nsum of stages: {sum(results.values())*1e3:.3f} ms (vs ~23.7 ms base from profile_model)")


if __name__ == "__main__":
    main()
