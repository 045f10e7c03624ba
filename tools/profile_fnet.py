"""Per-stage breakdown of FeatureEncoder (fnet) — it dominates the non-loop
cost (~25 ms of ~24 ms base at 512²; see tools/profile_base.py).

Usage: python tools/profile_fnet.py [--size 512]
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
    from flax import linen as nn

    from stereoanywhere_tpu.models.extractor import FeatureEncoder, ResidualBlock
    from stereoanywhere_tpu.models.layers import Conv, instance_norm
    from stereoanywhere_tpu.utils.profiling import chained_timer

    print(f"backend={jax.default_backend()}")
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    h = w = args.size
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=cdt):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    def tmod(name, module, *xs, n_chain=32, **kw):
        variables = jax.jit(lambda k: module.init(k, *xs, **kw))(jax.random.PRNGKey(0))
        variables = jax.tree.map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, variables
        )

        def fn(*a):
            out = module.apply(variables, *a, **kw)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in jax.tree.leaves(out))

        t = chained_timer(fn, *xs, n_chain=n_chain)
        print(f"{name:44s} {t*1e3:8.3f} ms")

    def tfn(name, fn, *xs, n_chain=32):
        def wrapped(*a):
            out = fn(*a)
            return sum(jnp.mean(l.astype(jnp.float32)) for l in jax.tree.leaves(out))

        t = chained_timer(wrapped, *xs, n_chain=n_chain)
        print(f"{name:44s} {t*1e3:8.3f} ms")

    imgs = arr(2, h, w, 3)
    x64 = arr(2, h, w, 64)
    x64h = arr(2, h // 2, w // 2, 96)

    class Conv1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv(64, 7, 1, 3, name="conv1")(x)

    tmod("conv1 7x7x3->64 @full", Conv1(), imgs)
    tfn("instance_norm @full 64ch", lambda x: instance_norm(x), x64)

    class IN_relu(nn.Module):
        @nn.compact
        def __call__(self, x):
            return jax.nn.relu(instance_norm(Conv(64, 3, 1, 1)(x)))

    tmod("conv3x3 64->64 + IN + relu @full", IN_relu(), x64)

    class BareConv(nn.Module):
        feats: int = 64

        @nn.compact
        def __call__(self, x):
            return Conv(self.feats, 3, 1, 1)(x)

    tmod("bare conv3x3 64->64 @full", BareConv(), x64)
    tmod("residual block 64 @full", ResidualBlock(64, "instance", 1), x64, train=False)
    tmod("residual block 96s2 @full->half", ResidualBlock(96, "instance", 2), x64, train=False)
    tmod("residual block 96 @half", ResidualBlock(96, "instance", 1), x64h, train=False)
    tmod("full fnet", FeatureEncoder(256), imgs, n_chain=16, train=False)


if __name__ == "__main__":
    main()
