"""The reference's canonical smoke test: overfit a single synthetic pair
(reference --overfit flag, base_dataset.py:28-30 — "can it memorize one
pair").  Training on one constant-disparity scene must reduce the loss and
the end-point error."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (fast tier: -m 'not slow')

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.config import StereoAnywhereConfig, TrainConfig
from stereoanywhere_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_overfit_single_pair():
    rng = np.random.default_rng(0)
    h, w, d_true = 32, 64, 4.0
    tex = rng.uniform(0.1, 0.9, (h, w + 8, 3)).astype(np.float32)
    im2 = tex[:, 8 : 8 + w]
    im3 = tex[:, 8 - int(d_true) : 8 - int(d_true) + w]
    gt = np.full((h, w, 1), d_true, np.float32)
    mono = np.tile(np.linspace(0.3, 0.7, w, dtype=np.float32)[None, :, None], (h, 1, 1))

    batch = {
        "im2_aug": jnp.asarray(im2[None]),
        "im3_aug": jnp.asarray(im3[None]),
        "mono2": jnp.asarray(mono[None]),
        "mono3": jnp.asarray(mono[None]),
        "gt": jnp.asarray(gt[None]),
        "validgt": jnp.ones((1, h, w, 1), jnp.float32),
        "gt_right": jnp.asarray(gt[None]),
        "validgt_right": jnp.ones((1, h, w, 1), jnp.float32),
    }

    cfg = TrainConfig(
        train_iters=2,
        batch_size=1,
        lr=3e-4,
        things_to_freeze=(),  # everything trainable for the fastest overfit
        use_normal_loss_on_coarse=False,
    )
    trainer = Trainer(
        StereoAnywhereConfig(volume_corruption_prob=0.0),
        cfg,
        total_steps=60,
        sample_shape=(h, w),
    )

    epes = []
    for step in range(40):
        logs = trainer.step(batch)
        epes.append(float(logs["epe/final"]))
        assert np.isfinite(epes[-1]), f"non-finite EPE at step {step}"

    first = np.mean(epes[:5])
    last = np.mean(epes[-5:])
    assert last < first * 0.7, (
        f"overfit failed to learn: first5 EPE {first:.3f} -> last5 {last:.3f} ({epes[::8]})"
    )
