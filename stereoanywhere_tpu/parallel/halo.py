"""Halo exchange for spatially-sharded convolution.

Inside a `shard_map`-decorated function whose arrays are row-sharded along a
mesh axis, `halo_exchange` swaps boundary rows with ring neighbors via
`ppermute` (ICI point-to-point), letting convs with receptive field <= halo
run exactly on local shards — the exact-math alternative to the reference's
sin^2-window tile blending (reference tile_wrapper.py:158-186).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange(x: jax.Array, halo: int, axis_name: str, spatial_axis: int = 1) -> jax.Array:
    """Pad a sharded array with `halo` rows from ring neighbors.

    x: local shard, e.g. (B, H_local, W, C) with spatial_axis=1.
    Edge shards receive zero padding (same as conv zero-padding at image
    borders).  Returns (B, H_local + 2*halo, W, C).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    def take(a, start, size):
        sl = [slice(None)] * a.ndim
        sl[spatial_axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return a[tuple(sl)]

    top_rows = take(x, 0, halo)          # my first rows -> previous neighbor's bottom halo
    bottom_rows = take(x, -halo, halo)   # my last rows -> next neighbor's top halo

    # send bottom rows forward (to idx+1), receive from idx-1
    fwd = [(i, (i + 1) % n) for i in range(n)]
    from_prev = lax.ppermute(bottom_rows, axis_name, fwd)
    # send top rows backward (to idx-1), receive from idx+1
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_next = lax.ppermute(top_rows, axis_name, bwd)

    zero = jnp.zeros_like(from_prev)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)

    return jnp.concatenate([from_prev, x, from_next], axis=spatial_axis)


def drop_halo(x: jax.Array, halo: int, spatial_axis: int = 1) -> jax.Array:
    sl = [slice(None)] * x.ndim
    sl[spatial_axis] = slice(halo, x.shape[spatial_axis] - halo)
    return x[tuple(sl)]
