"""Worker for the 2-process jax.distributed test (tests/test_multihost.py).

Runs on the CPU backend with 4 virtual devices per process (global mesh of
8 over 2 processes) and exercises the REAL multi-host training path end to
end: distributed rendezvous -> global mesh -> per-host input shards ->
globally-sharded train step -> orbax checkpoint save -> restore (incl.
Trainer.restore's process_count>1 host-local -> global re-wrap) -> step
after restore.  Invoked as:  python multihost_worker.py <pid> <port> <dir>
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid, port, workdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    from stereoanywhere_tpu.parallel import multihost as mh

    mh.initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = mh.make_global_mesh()  # (data=8, tile=1)
    global_batch = 8
    local_b = mh.host_local_batch_size(global_batch)
    assert local_b == 4

    from stereoanywhere_tpu.config import StereoAnywhereConfig, TrainConfig
    from stereoanywhere_tpu.train.trainer import Trainer

    h, w = 32, 64
    tc = TrainConfig(
        batch_size=global_batch, crop_h=h, crop_w=w, train_iters=2, gt_mono_prob=0.0
    )
    trainer = Trainer(
        StereoAnywhereConfig(), tc, total_steps=10, mesh=mesh,
        checkpoint_dir=os.path.join(workdir, "ckpt"), sample_shape=(h, w),
    )

    # per-host input shard: DIFFERENT data per process (shard_index pattern)
    rng = np.random.default_rng(100 + pid)

    def mk(c, lo=0.0, hi=1.0):
        return rng.uniform(lo, hi, (local_b, h, w, c)).astype(np.float32)

    local = {
        "im2_aug": mk(3),
        "im3_aug": mk(3),
        "mono2": mk(1),
        "mono3": mk(1),
        "gt": mk(1, 1.0, 16.0),
        "validgt": np.ones((local_b, h, w, 1), np.float32),
        "gt_right": mk(1, 1.0, 16.0),
        "validgt_right": np.ones((local_b, h, w, 1), np.float32),
    }
    gbatch = mh.global_batch_from_host_shards(local, mesh)
    assert gbatch["im2_aug"].shape == (global_batch, h, w, 3)

    logs = trainer.step(gbatch)
    loss1 = float(logs["loss/total"])
    assert np.isfinite(loss1), loss1
    print(f"LOSS1 {loss1:.6f}", flush=True)

    trainer.save("latest")
    step_saved = int(trainer.state.step)

    trainer.step(gbatch)  # advance past the saved state
    assert int(trainer.state.step) == step_saved + 1

    trainer.restore("latest")  # multi-process re-wrap branch
    assert int(trainer.state.step) == step_saved

    logs = trainer.step(gbatch)  # sharded step on the restored state
    loss3 = float(logs["loss/total"])
    assert np.isfinite(loss3), loss3
    print(f"LOSS3 {loss3:.6f}", flush=True)
    print(f"WORKER {pid} OK", flush=True)


if __name__ == "__main__":
    main()
