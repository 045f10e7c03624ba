"""Device-trace breakdown of one full training step (fwd + bwd through the
12-iteration scan + loss stack + AdamW) at the reference's canonical config
(run_train.sh: batch 2, 320x640 crops, 12 iters).

Same methodology as tools/trace_model.py; the forward and backward GRU scans
show up as separate while loops.

Usage: python tools/trace_train.py [--top 40] [--by-source]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.trace_model import summarize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-source", action="store_true")
    ap.add_argument("--out", default="/tmp/jax_trace_train")
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.config import StereoAnywhereConfig, TrainConfig
    from stereoanywhere_tpu.train.trainer import Trainer

    print(f"backend={jax.default_backend()}", flush=True)
    b, h, w = args.batch, args.height, args.width
    model_cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
    train_cfg = TrainConfig(batch_size=b, crop_h=h, crop_w=w, gt_mono_prob=0.0)
    trainer = Trainer(model_cfg, train_cfg, total_steps=1000, sample_shape=(h, w))

    rng = np.random.default_rng(0)

    def mk(c, lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, (b, h, w, c)).astype(np.float32))

    batch = {
        "im2_aug": mk(3),
        "im3_aug": mk(3),
        "mono2": mk(1),
        "mono3": mk(1),
        "gt": mk(1, 1.0, 64.0),
        "validgt": jnp.ones((b, h, w, 1), jnp.float32),
        "gt_right": mk(1, 1.0, 64.0),
        "validgt_right": jnp.ones((b, h, w, 1), jnp.float32),
    }
    logs = trainer.step(batch)  # compile
    assert np.isfinite(float(logs["loss/total"]))
    logs = trainer.step(batch)  # warm
    float(logs["loss/total"])

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        logs = trainer.step(batch)
        float(logs["loss/total"])

    summarize(args.out, args.top, by_source=args.by_source)


if __name__ == "__main__":
    main()
