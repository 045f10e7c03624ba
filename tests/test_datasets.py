"""Dataset readers against synthetic on-disk trees with the reference layouts."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from stereoanywhere_tpu.data import fetch_dataset
from stereoanywhere_tpu.data.frame_utils import write_pfm


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _rgb(rng, h=40, w=56):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_kitti_layout(tmp_path, rng):
    root = str(tmp_path)
    _png(f"{root}/image_2/000000_10.png", _rgb(rng))
    _png(f"{root}/image_3/000000_10.png", _rgb(rng))
    disp = (rng.uniform(1, 60, (40, 56)) * 256).astype(np.uint16)
    noc = disp.copy()
    noc[:, :10] = 0
    _png(f"{root}/disp_occ_0/000000_10.png", disp)
    _png(f"{root}/disp_noc_0/000000_10.png", noc)

    ds = fetch_dataset("kitti2015", root, test=True)
    assert len(ds) == 1
    s = ds[0]
    assert s["im2"].shape == (40, 56, 3) and s["im2"].max() <= 1.0
    np.testing.assert_allclose(s["gt"][..., 0], disp / 256.0, rtol=1e-6)
    # occluded = valid in occ but not in noc
    assert s["maskocc"][:, :10].sum() == 10 * 40
    assert s["maskocc"][:, 10:].sum() == 0


def test_booster_layout(tmp_path, rng):
    root = str(tmp_path)
    _png(f"{root}/balanced/scene/camera_00/0000.png", _rgb(rng))
    _png(f"{root}/balanced/scene/camera_02/0000.png", _rgb(rng))
    gt = rng.uniform(0, 80, (40, 56)).astype(np.float32)
    np.save(f"{root}/balanced/scene/disp_00.npy", gt)
    mask = np.full((40, 56), 255, np.uint8)
    mask[:5] = 0  # occluded strip
    _png(f"{root}/balanced/scene/mask_00.png", mask)

    ds = fetch_dataset("booster", root, test=True)
    s = ds[0]
    np.testing.assert_allclose(s["gt"][..., 0], gt, rtol=1e-6)
    assert s["maskocc"][:5].all() and not s["maskocc"][5:].any()


def test_monotrap_layout(tmp_path, rng):
    root = str(tmp_path)
    _png(f"{root}/scene/left_rect/0.png", _rgb(rng))
    _png(f"{root}/scene/right_rect/0.png", _rgb(rng))
    disp = (rng.uniform(1, 50, (40, 56)) * 256).astype(np.uint16)
    depth = (rng.uniform(0.2, 3, (40, 56)) * 1000).astype(np.uint16)
    gmask = np.full((40, 56), 255, np.uint8)
    gmask[-4:] = 0
    _png(f"{root}/scene/gt_disp/0.png", disp)
    _png(f"{root}/scene/gt_depth/0.png", depth)
    _png(f"{root}/scene/gt_mask/0.png", gmask)

    ds = fetch_dataset("monotrap", root, test=True)
    s = ds[0]
    assert s["gt_depth"].shape == (40, 56, 1)
    assert (s["gt"][-4:] == 0).all()  # masked-out region zeroed
    assert s["validgt"][:-4].sum() > 0


def test_layeredflow_layout(tmp_path, rng):
    root = str(tmp_path)
    scene = f"{root}/0"
    _png(f"{scene}/0_0.png", _rgb(rng))
    _png(f"{scene}/0_1.png", _rgb(rng))
    _png(f"{scene}/3_0.png", _rgb(rng))
    _png(f"{scene}/3_1.png", _rgb(rng))
    pts = {
        0: [((0, 0), (1, 1), (10.0, 20.0))],
        1: [((0, 0), (1, 1), (6.0, 21.0))],
        2: [((0, 0), (1, 1), (30.0, 8.0))],
        3: [((0, 0), (1, 1), (25.0, 9.0))],
    }
    # reference format: stereo_points[i] entries are (idx_a, idx_b, (x,y))
    ann = {(0, 0): (None, None, 0)}
    with open(f"{scene}/gt.pickle", "wb") as f:
        pickle.dump({"stereo_points": {
            0: [((0, 0)[0], (0, 0)[1], (10.0, 20.0))],
            1: [((0, 0)[0], (0, 0)[1], (6.0, 20.5))],
            2: [((0, 0)[0], (0, 0)[1], (30.0, 8.0))],
            3: [((0, 0)[0], (0, 0)[1], (25.0, 8.5))],
        }, "annotations": ann}, f)

    ds = fetch_dataset("layeredflow", root, test=True)
    assert len(ds) == 2
    s0 = ds[0]
    # disparity at (y=20, x=10) = ||(6-10, 20.5-20)|| ~ 4.03
    assert abs(s0["gt"][20, 10, 0] - np.hypot(4.0, 0.5)) < 1e-4
    s1 = ds[1]
    assert abs(s1["gt"][8, 30, 0] - np.hypot(5.0, 0.5)) < 1e-4


def test_middlebury_and_eth3d_layout(tmp_path, rng):
    root = str(tmp_path)
    scene = f"{root}/sceneA"
    _png(f"{scene}/im0.png", _rgb(rng))
    _png(f"{scene}/im1.png", _rgb(rng))
    gt = rng.uniform(1, 30, (40, 56)).astype(np.float32)
    write_pfm(f"{scene}/disp0GT.pfm", gt)
    _png(f"{scene}/mask0nocc.png", np.full((40, 56), 128, np.uint8))

    ds = fetch_dataset("middlebury", root, test=True)
    s = ds[0]
    np.testing.assert_allclose(s["gt"][..., 0], gt, rtol=1e-5)
    assert s["maskocc"].all()  # 128 means occluded everywhere in this synthetic


def test_sceneflow_flyingthings_negated_gt(tmp_path, rng):
    root = str(tmp_path)
    _png(f"{root}/image_clean/left/0000000.png", _rgb(rng))
    _png(f"{root}/image_clean/right/0000000.png", _rgb(rng))
    gt = rng.uniform(1, 30, (40, 56)).astype(np.float32)
    os.makedirs(f"{root}/disparity/left", exist_ok=True)
    os.makedirs(f"{root}/disparity/right", exist_ok=True)
    write_pfm(f"{root}/disparity/left/0000000.pfm", -gt)  # FlyingThings stores negative
    write_pfm(f"{root}/disparity/right/0000000.pfm", gt)

    ds = fetch_dataset("flyingthings", root, test=True)
    s = ds[0]
    np.testing.assert_allclose(s["gt"][..., 0], gt, rtol=1e-5)  # negated at load
    assert s["validgt"].sum() == 40 * 56


def test_augmentor_contract(rng):
    from stereoanywhere_tpu.data.augmentor import DisparityAugmentor

    h, w = 96, 128
    data = {
        "im2": rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
        "im3": rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
        "gt": rng.uniform(1, 30, (h, w, 1)).astype(np.float32),
        "validgt": np.ones((h, w, 1), np.float32),
        "gt_right": rng.uniform(1, 30, (h, w, 1)).astype(np.float32),
        "validgt_right": np.ones((h, w, 1), np.float32),
    }
    aug = DisparityAugmentor(crop_size=(64, 96), seed=3)
    out = aug(dict(data))
    for k in ("im2", "im3", "im2_aug", "im3_aug"):
        assert out[k].shape == (64, 96, 3)
        assert 0 <= out[k].min() and out[k].max() <= 1.0
    assert out["gt"].shape == (64, 96, 1)


def test_exr_codec_roundtrip(tmp_path, rng):
    """Built-in EXR scanline codec (data/exr.py): round-trip for every
    supported compression, HALF and FLOAT channels, multi-channel, and the
    depth->disparity conversion (reference frame_utils.py:124-129)."""
    from stereoanywhere_tpu.data import frame_utils as fu
    from stereoanywhere_tpu.data.exr import read_exr, write_exr

    z = rng.uniform(0.5, 10, (33, 50)).astype(np.float32)
    for comp in ("none", "zips", "zip"):
        p = str(tmp_path / f"{comp}.exr")
        write_exr(p, {"Z": z}, compression=comp)
        np.testing.assert_array_equal(read_exr(p)["Z"], z)

    # HALF channel + multi-channel
    p = str(tmp_path / "half.exr")
    write_exr(p, {"Z": z.astype(np.float16), "C": z * 2}, compression="zip")
    back = read_exr(p)
    assert back["Z"].dtype == np.float16
    np.testing.assert_array_equal(back["Z"], z.astype(np.float16))
    np.testing.assert_array_equal(back["C"], z * 2)

    # depth -> disparity with holes
    zh = z.copy()
    zh[0, :5] = 0
    p = str(tmp_path / "d.exr")
    write_exr(p, {"Z": zh})
    disp, valid = fu.read_depth_exr(p, 450.0, 0.075)
    assert disp.shape == (33, 50, 1) and valid.shape == (33, 50, 1)
    assert (valid[0, :5, 0] == 0).all() and disp[0, 0, 0] == 0
    np.testing.assert_allclose(
        disp[zh[..., None] > 0], (450.0 * 0.075 / zh[..., None])[zh[..., None] > 0], rtol=1e-6
    )
    # generic reader dispatch
    np.testing.assert_array_equal(fu.read_gen(p), zh)


def test_photometric_transform_family(rng):
    """Each member of the reference's 15-transform albumentations stack
    (reference augmentor.py:39-56) has a numpy/PIL twin with sane
    invariants; the composed jitter stays bounded in [0, 255]."""
    from stereoanywhere_tpu.data.augmentor import DisparityAugmentor

    a = DisparityAugmentor(seed=0)
    im = rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)

    # box blur vs naive oracle (edge padding)
    p = np.pad(im, ((1, 1), (1, 1), (0, 0)), mode="edge")
    ref = sum(p[i : i + 40, j : j + 56] for i in range(3) for j in range(3)) / 9.0
    np.testing.assert_allclose(a._box_blur(im, 3), ref, atol=1e-2)

    # median blur vs naive oracle
    stack = np.stack(
        [p[i : i + 40, j : j + 56] for i in range(3) for j in range(3)], axis=0
    )
    np.testing.assert_allclose(a._median_blur(im, 3), np.median(stack, axis=0), atol=1e-5)

    # gaussian blur preserves mean (edge padding, normalized kernel)
    gb = a._gaussian_blur(im, 5, 1.1)
    assert abs(gb.mean() - im.mean()) < 2.0

    # HSV round-trip with zero shift is the identity
    np.testing.assert_allclose(
        a._hsv_shift(im, 0, 0, 0), np.clip(im, 0, 255), atol=5e-3
    )

    # equalize maps into [0,255] and is monotone per channel
    eq = a._equalize(im)
    assert eq.min() >= 0 and eq.max() <= 255.001

    # CLAHE finite, non-negative
    cl = a._clahe(im)
    assert np.isfinite(cl).all() and cl.min() >= -1e-3

    # JPEG round-trip returns the same shape; close on a smooth image at
    # q=100 (noise is JPEG's worst case, so don't test reconstruction on it)
    yy, xx = np.meshgrid(np.linspace(0, 255, 40), np.linspace(0, 255, 56), indexing="ij")
    smooth = np.stack([yy, xx, (yy + xx) / 2], axis=-1).astype(np.float32)
    jp = a._jpeg(smooth, 100)
    assert jp.shape == smooth.shape
    assert np.abs(jp - np.clip(smooth, 0, 255)).mean() < 3.0

    # composed stack: bounded, shape-stable, deterministic under a fixed rng
    a.rng = np.random.default_rng(7)
    o1 = a._jitter(im)
    a.rng = np.random.default_rng(7)
    o2 = a._jitter(im)
    np.testing.assert_array_equal(o1, o2)
    for _ in range(30):
        out = a._jitter(im)
        assert out.shape == im.shape and out.min() >= 0 and out.max() <= 255
