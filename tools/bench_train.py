"""Train-step latency on the real chip at the reference's canonical config.

Reference training (run_train.sh, sterereere.md:394-397): SceneFlow, batch 2,
320x640 crops, 12 GRU iterations, AdamW + OneCycle, fnet frozen, ~39k pairs x
3 epochs on one A100.  This tool times our full jitted train step (forward +
backward through the 12-iteration scan + hourglass, loss stack, AdamW update)
at exactly that shape.

Usage: python tools/bench_train.py [--dtype bfloat16] [--steps 6]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    import stereoanywhere_tpu  # noqa: F401 — XLA dtype flags (no-op if jax preloaded)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stereoanywhere_tpu.config import StereoAnywhereConfig, TrainConfig
    from stereoanywhere_tpu.train.trainer import Trainer

    print(f"backend={jax.default_backend()}", flush=True)
    b, h, w = args.batch, args.height, args.width
    model_cfg = StereoAnywhereConfig(compute_dtype=args.dtype)
    # gt_mono_prob 0 so every timed step runs the same graph
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

    t0 = time.perf_counter()
    logs = trainer.step(batch)
    loss = float(logs["loss/total"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s, loss={loss:.4f}", flush=True)
    assert np.isfinite(loss), "non-finite training loss"

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        logs = trainer.step(batch)
        float(logs["loss/total"])  # sync
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(
        f"train step ({b}x{h}x{w}, iters={train_cfg.train_iters}, {args.dtype}): "
        f"{med*1e3:.1f} ms/step (median of {args.steps}; min {min(times)*1e3:.1f})"
    )


if __name__ == "__main__":
    main()
