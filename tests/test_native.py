"""Native C++ data runtime (native/stereodata.cc) vs the pure-Python oracles:
decoders against PIL round-trips, warps/infill against the numpy forms in
data/warps.py, and the threaded PrefetchLoader's ordering/determinism
contract (the reference's torch DataLoader equivalent, SURVEY §2.6/§3.2)."""
import numpy as np
import pytest
from PIL import Image

from stereoanywhere_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_png_rgb8_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 255, (21, 33, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = native.read_png(str(p))
    np.testing.assert_array_equal(out, arr)


def test_png_gray16_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 65535, (17, 19), dtype=np.uint16)
    p = tmp_path / "x16.png"
    Image.fromarray(arr).save(p)
    out = native.read_png(str(p))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, arr)


def test_jpeg_decode_close_to_pil(tmp_path, rng):
    arr = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    ours = native.read_jpeg(str(p)).astype(np.int32)
    pil = np.asarray(Image.open(p).convert("RGB")).astype(np.int32)
    # both use libjpeg but possibly different DCT methods; allow tiny diffs
    assert np.abs(ours - pil).max() <= 2


def test_pfm_roundtrip_native_and_python(tmp_path, rng):
    from stereoanywhere_tpu.data import frame_utils as fu

    arr = rng.standard_normal((13, 29)).astype(np.float32)
    p = tmp_path / "d.pfm"
    native.write_pfm(str(p), arr)
    np.testing.assert_array_equal(native.read_pfm(str(p)), arr)
    # python writer -> native reader and vice versa
    p2 = tmp_path / "d2.pfm"
    fu.write_pfm(str(p2), arr.copy())
    np.testing.assert_array_equal(native.read_pfm(str(p2)), arr)
    color = rng.standard_normal((7, 9, 3)).astype(np.float32)
    p3 = tmp_path / "c.pfm"
    native.write_pfm(str(p3), color)
    np.testing.assert_array_equal(native.read_pfm(str(p3)), color)


def test_frame_utils_dispatch_matches_pil(tmp_path, rng):
    from stereoanywhere_tpu.data import frame_utils as fu

    rgba = rng.integers(0, 255, (11, 13, 4), dtype=np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(rgba).save(p)
    np.testing.assert_array_equal(
        fu.read_image(str(p)), np.asarray(Image.open(p).convert("RGB"))
    )
    gray = rng.integers(0, 65535, (11, 13), dtype=np.uint16)
    g = tmp_path / "g.png"
    Image.fromarray(gray).save(g)
    np.testing.assert_array_equal(fu.read_gray16(str(g)), gray.astype(np.float32))


def _numpy_warps():
    """The pure-numpy oracles, bypassing the native dispatch."""
    import importlib

    import stereoanywhere_tpu.data.warps as warps

    return warps


def test_warp_disparity_matches_numpy(rng):
    w = _numpy_warps()
    disp = (rng.uniform(0, 1, (40, 60)) > 0.4) * rng.uniform(1, 20, (40, 60))
    disp = disp.astype(np.float32)
    ours = native.warp_disparity(disp)
    # numpy oracle (duplicated from warps.fast_warp_disparity fallback)
    h, ww = disp.shape
    ys, xs = np.nonzero(disp > 0)
    d = disp[ys, xs]
    tx = np.round(xs - d).astype(np.int64)
    keep = (tx >= 0) & (tx < ww)
    ref = np.zeros((h, ww), np.float32)
    np.maximum.at(ref, (ys[keep], tx[keep]), d[keep])
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_warp_depth_matches_numpy(rng):
    depth = (rng.uniform(0, 1, (30, 50)) > 0.3) * rng.uniform(0.5, 10, (30, 50))
    depth = depth.astype(np.float32)
    disp = rng.uniform(0, 15, (30, 50)).astype(np.float32)
    ours = native.warp_depth(depth, disp)
    h, w = depth.shape
    ys, xs = np.nonzero(depth > 0)
    tx = np.round(xs - disp[ys, xs]).astype(np.int64)
    keep = (tx >= 0) & (tx < w)
    ref = np.full((h, w), np.inf, np.float32)
    np.minimum.at(ref, (ys[keep], tx[keep]), depth[ys, xs][keep])
    ref[~np.isfinite(ref)] = 0
    np.testing.assert_allclose(ours, ref)


def test_interpolate_background_matches_numpy(rng):
    disp = (rng.uniform(0, 1, (25, 45)) > 0.5) * rng.uniform(1, 30, (25, 45))
    disp = disp.astype(np.float32)
    ours = native.interpolate_background(disp)
    # numpy oracle: row spans take min(left,right); one-sided copy
    d = disp.copy()
    h, w = d.shape
    for y in range(h):
        row = d[y]
        valid = row > 0
        if not valid.any():
            continue
        idx = np.arange(w)
        prev = np.maximum.accumulate(np.where(valid, idx, -1))
        nxt = np.minimum.accumulate(np.where(valid, idx, w)[::-1])[::-1]
        holes = ~valid
        both = holes & (prev >= 0) & (nxt < w)
        d[y, both] = np.minimum(row[prev[both]], row[nxt[both]])
        lo = holes & (prev >= 0) & (nxt >= w)
        d[y, lo] = row[prev[lo]]
        ro = holes & (prev < 0) & (nxt < w)
        d[y, ro] = row[nxt[ro]]
    np.testing.assert_allclose(ours, d)


def test_otsu_bimodal(rng):
    a = np.concatenate([
        rng.normal(60, 5, 4000), rng.normal(190, 5, 4000)
    ]).clip(0, 255).astype(np.uint8)
    thr, mask = native.otsu_mask(a)
    # sigma_b is flat across the empty gap between the modes, so any t that
    # separates them is a valid maximizer (argmax returns the first).
    assert 73 <= thr <= 180
    assert ((a > thr) == (mask > 0)).all()
    lo, hi = a[a < 120], a[a >= 120]
    assert (lo <= thr).all() and (hi > thr).all()


# --------------------------------------------------------------------------
class _ToyDataset:
    """Deterministic dataset: sample i is constant-valued i."""

    def __init__(self, n=12, h=4, w=6, delay=0.0):
        self.n, self.h, self.w, self.delay = n, h, w, delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            import time

            time.sleep(self.delay)
        v = np.full((self.h, self.w, 1), float(i), np.float32)
        im = np.full((self.h, self.w, 3), float(i), np.float32)
        return {
            "im2_aug": im, "im3_aug": im,
            "gt": v, "validgt": np.ones_like(v),
            "gt_right": v, "validgt_right": np.ones_like(v),
        }


def test_prefetch_loader_matches_synchronous_order():
    from stereoanywhere_tpu.data.loader import PrefetchLoader

    ds = _ToyDataset()
    kw = dict(batch_size=2, total_steps=9, seed=3)
    with PrefetchLoader(ds, num_threads=3, **kw) as par:
        got = [(s, b["gt"][:, 0, 0, 0].tolist()) for s, b in par]
    with PrefetchLoader(ds, num_threads=0, **kw) as seq:
        want = [(s, b["gt"][:, 0, 0, 0].tolist()) for s, b in seq]
    assert got == want
    assert [s for s, _ in got] == list(range(9))


def test_prefetch_loader_resume_start_step():
    from stereoanywhere_tpu.data.loader import PrefetchLoader

    ds = _ToyDataset()
    with PrefetchLoader(ds, batch_size=2, total_steps=8, seed=0, num_threads=2) as full:
        all_batches = dict((s, b["gt"][:, 0, 0, 0].tolist()) for s, b in full)
    with PrefetchLoader(
        ds, batch_size=2, total_steps=8, seed=0, start_step=5, num_threads=2
    ) as tail:
        for s, b in tail:
            assert b["gt"][:, 0, 0, 0].tolist() == all_batches[s]
            assert s >= 5


def test_prefetch_loader_host_shards_partition_global_batch():
    """Multi-host input sharding: the per-host slices, concatenated in
    shard_index order, must equal the single-host global batch at every step."""
    from stereoanywhere_tpu.data.loader import PrefetchLoader

    ds = _ToyDataset()
    kw = dict(batch_size=4, total_steps=6, seed=7, num_threads=0)
    with PrefetchLoader(ds, **kw) as full:
        want = dict((s, b["gt"][:, 0, 0, 0].tolist()) for s, b in full)
    shards = []
    for idx in range(2):
        with PrefetchLoader(ds, shard_index=idx, shard_count=2, **kw) as part:
            shards.append(dict((s, b["gt"][:, 0, 0, 0].tolist()) for s, b in part))
    for s in want:
        assert shards[0][s] + shards[1][s] == want[s]
        assert len(shards[0][s]) == 2


def test_prefetch_loader_propagates_errors():
    from stereoanywhere_tpu.data.loader import PrefetchLoader

    class Bad(_ToyDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    with PrefetchLoader(Bad(), batch_size=1, total_steps=4, num_threads=2) as loader:
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)
