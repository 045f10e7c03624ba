"""Multi-host (multi-process) runtime support.

The reference has no multi-node story at all — its only scale-out is
single-process nn.DataParallel (reference train.py:161) and an HTTP
client/server split (reference demo/fast_demo_server.py).  On TPU pods the
idiomatic shape is: one Python process per host, `jax.distributed` for
runtime rendezvous, a global `Mesh` spanning all hosts' devices (collectives
ride ICI within a slice), and per-host input pipelines that each load only
their shard of the global batch (DCN carries nothing but checkpoint I/O and
the rendezvous).

`global_batch_from_host_shards` is the bridge between the host-local data
loader (data/loader.py) and the globally-sharded train step: every process
feeds its local samples and gets back a jax.Array whose addressable shards
are exactly those samples, laid out on the global mesh — no cross-host data
motion.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op when single-process).

    With no arguments, relies on the TPU pod environment's auto-detection
    (JAX reads the pod metadata).  Safe to call unconditionally at program
    start; a second call is ignored.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        # jax raises "distributed.initialize should only be called once."
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def make_global_mesh(data: int | None = None, tile: int = 1) -> Mesh:
    """Mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed.initialize).  data defaults to n_devices // tile."""
    from stereoanywhere_tpu.parallel.mesh import make_mesh

    if data is None:
        data = len(jax.devices()) // tile
    return make_mesh(data=data, tile=tile)


def host_local_batch_size(global_batch: int) -> int:
    """Samples this process must load per step (global batch // n_hosts)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def global_batch_from_host_shards(local_batch: dict, mesh: Mesh) -> dict:
    """Assemble a globally-sharded batch dict from per-host local arrays.

    Each process passes its {key: (local_b, ...) numpy array}; the result's
    jax.Arrays have global shape (local_b * process_count, ...) sharded over
    the mesh's 'data' axis, with this host's shards backed by its own data —
    the standard per-host input-pipeline pattern (no host gathers the global
    batch anywhere).
    """
    sharding = NamedSharding(mesh, P(("data",)))
    n_data = mesh.shape["data"]
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        global_b = v.shape[0] * jax.process_count()
        if global_b % n_data != 0:
            raise ValueError(
                f"global batch {global_b} (local {v.shape[0]} x "
                f"{jax.process_count()} processes) must be divisible by the "
                f"mesh 'data' axis size {n_data}"
            )
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, (global_b,) + v.shape[1:]
        )
    return out
