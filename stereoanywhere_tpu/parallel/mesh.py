"""Device-mesh construction.

The reference's entire scaling story is single-GPU overlapping-tile
map-reduce (reference mapreduce_v2/) plus single-process nn.DataParallel
(reference train.py:161).  Here scaling is expressed on a `jax.sharding.Mesh`
with two axes:

  data: batch parallelism (training + batched eval)
  tile: spatial tile parallelism for high-res inference (replaces
        mapreduce_v2's sequential tile loop with one SPMD program)

ICI collectives (psum/pmax/ppermute) are inserted by XLA via shard_map.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, tile: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = data * tile
    if n > len(devices):
        raise ValueError(f"mesh {data}x{tile} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, tile)
    return Mesh(dev, ("data", "tile"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P(("data",)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
