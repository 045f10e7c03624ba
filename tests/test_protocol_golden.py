"""PROTOCOL-level golden tests: the full eval pipeline (reference
test.py:160-245 — iscale nearest image downscale, per-dataset DAv2 sizing
inside infer_image, joint min-max, centered pad-32, stereo forward,
negation, unpad, oscale gt reduction, guided_metrics) run by the LIVE torch
reference, compared per-sample against eval/harness.Evaluator on the same
synthetic samples with the same converted random weights.

The model-level golden tests (test_golden_reference.py, test_dav2.py) pin
the networks; these pin the PROTOCOL AROUND them — a pad/rescale/
normalization discrepancy here would silently break the accuracy run when
real weights arrive.
"""
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (fast tier: -m 'not slow')
import torch

import jax.numpy as jnp

from stereoanywhere_tpu.compat.torch_convert import (
    convert_dav2_checkpoint,
    convert_stereo_checkpoint,
)
from stereoanywhere_tpu.config import MonoConfig, StereoAnywhereConfig
from stereoanywhere_tpu.eval.harness import Evaluator
from stereoanywhere_tpu.models import StereoAnywhere
from stereoanywhere_tpu.models.dpt import DepthAnythingV2, infer_mono_depth

from tests.reference_loader import REFERENCE_ROOT, _ensure_stub, load_reference_stereo_module

load_reference_stereo_module()


def _load_reference_losses():
    tvf = _ensure_stub("torchvision.transforms.functional", gaussian_blur=None)
    tvt = _ensure_stub("torchvision.transforms", functional=tvf, Compose=lambda ts: ts)
    _ensure_stub("torchvision", transforms=tvt)
    _ensure_stub("cv2", INTER_CUBIC=2, INTER_AREA=3)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("losses")


def _load_reference_dav2_module():
    _ensure_stub("cv2", INTER_CUBIC=2, INTER_AREA=3)
    tvf = _ensure_stub("torchvision.transforms.functional", gaussian_blur=None)
    tvt = _ensure_stub("torchvision.transforms", functional=tvf, Compose=lambda ts: ts)
    _ensure_stub("torchvision", transforms=tvt)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("models.depth_anything_v2.dpt")


@pytest.fixture(scope="module")
def torch_stereo():
    from models.stereoanywhere.stereoanywhere import StereoAnywhere as TorchSA

    torch.manual_seed(0)
    model = TorchSA({})
    model.eval()
    return model


@pytest.fixture(scope="module")
def torch_mono():
    dpt = _load_reference_dav2_module()
    torch.manual_seed(1)
    model = dpt.DepthAnythingV2(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384]
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_stereo(torch_stereo):
    state = {k: v.detach().float().numpy() for k, v in torch_stereo.state_dict().items()}
    variables = convert_stereo_checkpoint(state)
    return StereoAnywhere(StereoAnywhereConfig()), variables


@pytest.fixture(scope="module")
def jax_mono(torch_mono):
    state = {k: v.detach().float().numpy() for k, v in torch_mono.state_dict().items()}
    variables = convert_dav2_checkpoint(state)
    return DepthAnythingV2(MonoConfig.for_encoder("vits")), variables


def _torch_protocol_run(
    sample, stereonet, mono_model, tw, th, iscale, oscale, iters
):
    """Literal transcription of reference test.py:160-245 (run())."""
    import torch.nn.functional as F

    losses = _load_reference_losses()

    def chw(x):
        return torch.from_numpy(x).permute(2, 0, 1)[None].float()

    im2, im3 = chw(sample["im2"]), chw(sample["im3"])
    gt, valid = chw(sample["gt"]), chw(sample["validgt"])
    maskocc = (
        chw(sample["maskocc"]) if "maskocc" in sample else torch.zeros_like(gt)
    )

    if iscale != 1:
        im2 = F.interpolate(im2, scale_factor=1.0 / iscale)
        im3 = F.interpolate(im3, scale_factor=1.0 / iscale)
    if oscale != 1:
        gt = F.interpolate(gt, scale_factor=1.0 / oscale, mode="nearest") / oscale
        valid = F.interpolate(valid, scale_factor=1.0 / oscale, mode="nearest")
        maskocc = F.interpolate(maskocc, scale_factor=1.0 / oscale, mode="nearest")

    with torch.no_grad():
        mono = mono_model.infer_image(
            torch.cat([im2, im3], 0), input_size_width=tw, input_size_height=th
        )
        mono = (mono - mono.min()) / (mono.max() - mono.min())
        im2_mono, im3_mono = mono[0:1], mono[1:2]

        ht, wt = im2.shape[-2], im2.shape[-1]
        pad_ht = (((ht // 32) + 1) * 32 - ht) % 32
        pad_wd = (((wt // 32) + 1) * 32 - wt) % 32
        _pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        im2 = F.pad(im2, _pad, mode="replicate")
        im3 = F.pad(im3, _pad, mode="replicate")
        im2_mono = F.pad(im2_mono, _pad, mode="replicate")
        im3_mono = F.pad(im3_mono, _pad, mode="replicate")

        pred, _ = stereonet(im2, im3, im2_mono, im3_mono, test_mode=True, iters=iters)
    pred = -pred.squeeze(1)
    hd, wd = pred.shape[-2:]
    c = [_pad[2], hd - _pad[3], _pad[0], wd - _pad[1]]
    pred = pred[..., c[0] : c[1], c[2] : c[3]]

    if iscale != 1 and iscale / oscale != 1:
        pred = (
            F.interpolate(pred.unsqueeze(0), (gt.shape[-2], gt.shape[-1]), mode="nearest").squeeze(0)
            * iscale
            / oscale
        )

    m = losses.guided_metrics(
        pred.numpy(), gt.numpy(), valid.numpy(), maskocc.numpy()
    )
    m.pop("errormap", None)

    if "gt_depth" in sample:
        # literal transcription of reference test_monotrap.py:246-255
        gt_depth = chw(sample["gt_depth"])
        if oscale != 1:
            gt_depth = F.interpolate(gt_depth, scale_factor=1.0 / oscale, mode="nearest")
        baseline = 0.075
        K = 450.0487976074219
        _depth = pred.squeeze().numpy().copy()
        _depth[_depth > 0] = (K * baseline) / _depth[_depth > 0]
        _gt_depth = gt_depth.squeeze().numpy()
        _depth = np.clip(_depth, 0, _gt_depth.max())
        dm = losses.depth_metrics(_depth, _gt_depth, valid.squeeze().numpy())
        dm.pop("errormap", None)
        m.update({f"depth/{k}": v for k, v in dm.items()})
    return m, np.asarray(pred)[0]


def _jax_protocol_run(sample, jax_stereo, jax_mono, tw, th, iscale, oscale, iters):
    model, variables = jax_stereo
    mono_model, mono_vars = jax_mono

    def stereo_fn(im2, im3, m2, m3):
        return model.apply(
            variables,
            *(jnp.asarray(x) for x in (im2, im3, m2, m3)),
            iters=iters,
            test_mode=True,
        )["disparity"]

    def mono_fn(images01, dataset):
        return np.asarray(
            infer_mono_depth(mono_model, mono_vars, jnp.asarray(images01), tw, th)
        )

    ev = Evaluator(stereo_fn, mono_fn, "protocol_test", iscale=iscale, oscale=oscale)
    return ev.run_sample(sample), None


def _compare(ref_m, got_m):
    for k, v in ref_m.items():
        assert k in got_m, f"metric key missing: {k}"
        g = got_m[k]
        if np.isnan(v):
            assert np.isnan(g), (k, v, g)
            continue
        if "bad" in k:
            assert abs(g - v) <= 0.02 + 1e-6, (k, v, g)  # fraction points
        else:
            assert abs(g - v) <= 0.05 * max(abs(v), 0.05), (k, v, g)


def _sample(rng, h, w):
    def img():
        return rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    gt = (4 + 3 * np.sin(gx / 17) + 2 * np.cos(gy / 11))[..., None].astype(np.float32)
    valid = (rng.uniform(size=(h, w, 1)) > 0.15).astype(np.float32)
    maskocc = (rng.uniform(size=(h, w, 1)) > 0.7).astype(np.float32) * valid
    return {
        "im2": img(),
        "im3": img(),
        "gt": gt,
        "validgt": valid,
        "maskocc": maskocc,
    }


@pytest.mark.parametrize(
    "h,w,tw,th,iscale,oscale",
    [
        (94, 130, 252, 252, 1.0, 1.0),   # middlebury-style: odd size, pad-32
        (250, 380, 252, 196, 4.0, 4.0),  # booster-style: iscale=oscale=4
    ],
)
def test_protocol_golden(
    torch_stereo, torch_mono, jax_stereo, jax_mono, h, w, tw, th, iscale, oscale
):
    rng = np.random.default_rng(42)
    sample = _sample(rng, h, w)
    iters = 2

    ref_m, _ = _torch_protocol_run(
        sample, torch_stereo, torch_mono, tw, th, iscale, oscale, iters
    )
    got_m, _ = _jax_protocol_run(
        sample, jax_stereo, jax_mono, tw, th, iscale, oscale, iters
    )
    _compare(ref_m, got_m)


def test_protocol_golden_kitti_style(torch_stereo, torch_mono, jax_stereo, jax_mono):
    """KITTI protocol: sparse gt, top-crop'd frame geometry, and maskocc
    built with the dataset's occ AND NOT noc rule (reference
    kittistereo_dataset.py:54-56) so the guided_metrics occ/noc SPLITS are
    exercised with a realistic occlusion mask (not the random one above)."""
    rng = np.random.default_rng(7)
    h, w = 110, 248
    top_crop = 14  # dataset-level top crop (reference base protocol)
    sample = _sample(rng, h, w)

    # sparse KITTI-like gt: ~35% coverage (LiDAR-ish), occ superset of noc
    occ_valid = (rng.uniform(size=(h, w, 1)) > 0.65).astype(np.float32)
    noc_valid = occ_valid * (rng.uniform(size=(h, w, 1)) > 0.25).astype(np.float32)
    sample["gt"] = sample["gt"] * occ_valid
    sample["validgt"] = occ_valid
    # occ AND NOT noc — 1 where gt exists only in the occluded split
    sample["maskocc"] = ((occ_valid > 0) & (occ_valid - noc_valid > 0)).astype(np.float32)
    # top_crop applied to every spatial key (dataset layer, before protocol)
    sample = {k: v[top_crop:] for k, v in sample.items()}

    ref_m, _ = _torch_protocol_run(
        sample, torch_stereo, torch_mono, 336, 126, 1.0, 1.0, 2
    )
    got_m, _ = _jax_protocol_run(
        sample, jax_stereo, jax_mono, 336, 126, 1.0, 1.0, 2
    )
    assert any(k.startswith("occ ") or "occ" in k for k in ref_m), list(ref_m)
    _compare(ref_m, got_m)


@pytest.mark.parametrize("scale", [1.0, 2.0])
def test_protocol_golden_monotrap_depth(
    torch_stereo, torch_mono, jax_stereo, jax_mono, scale
):
    """MonoTrap protocol: disp -> depth via the fixed rig constants
    (baseline 0.075 m, K 450.0488 px) with the reference's >0-gated
    conversion, clip to gt max and DISPARITY validity mask, compared
    metric-by-metric against the live test_monotrap.py:246-255 math.
    scale=2 (iscale=oscale — the only oscale!=1 form the reference protocol
    supports) exercises the nearest gt_depth downscale, which unlike gt is
    NOT divided by the scale (metric depth)."""
    rng = np.random.default_rng(11)
    h, w = 94, 130
    sample = _sample(rng, h, w)
    # depth consistent with the gt disparity on valid pixels
    gt_d = sample["gt"][..., 0]
    depth = np.where(gt_d > 0, 0.075 * 450.0487976074219 / np.maximum(gt_d, 1e-6), 0.0)
    sample["gt_depth"] = (depth * (sample["validgt"][..., 0] > 0))[..., None].astype(np.float32)
    sample["validgt_depth"] = sample["validgt"].copy()
    sample.pop("maskocc")  # monotrap has no occlusion mask (zeros path)

    ref_m, _ = _torch_protocol_run(
        sample, torch_stereo, torch_mono, 126, 126, scale, scale, 2
    )
    got_m, _ = _jax_protocol_run(
        sample, jax_stereo, jax_mono, 126, 126, scale, scale, 2
    )
    assert any(k.startswith("depth/") for k in ref_m), list(ref_m)
    _compare(ref_m, got_m)


def test_infer_image_parity(torch_mono, jax_mono):
    """infer_image end-to-end (bicubic a=-0.75 in, forward, bilinear out) at
    a size where BOTH the up-resize (to DAv2 size) and the down-resize back
    are exercised — torch does not anti-alias either direction."""
    mono_model, mono_vars = jax_mono
    rng = np.random.default_rng(3)
    for (h, w, tw, th) in [(94, 130, 252, 252), (300, 200, 126, 126)]:
        x = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        with torch.no_grad():
            ref = torch_mono.infer_image(
                torch.from_numpy(x).permute(0, 3, 1, 2).float(),
                input_size_width=tw,
                input_size_height=th,
            ).numpy()[:, 0]
        got = np.asarray(
            infer_mono_depth(mono_model, mono_vars, jnp.asarray(x), tw, th)
        )[..., 0]
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(got - ref).max() / scale < 3e-3, (
            (h, w), np.abs(got - ref).max() / scale
        )


@pytest.mark.parametrize(
    "h,w,tw,th,iscale,oscale",
    [
        # Booster protocol: iscale=oscale=4 with the TRUE per-dataset DAv2
        # size (reference test.py:192-195: width 1036, height 756) — the
        # Table-3 geometry (reference booster_dataset.py:10-88)
        (188, 260, 1036, 756, 4.0, 4.0),
        # LayeredFlow protocol: iscale=oscale=8, DAv2 952x532 (Table 3,
        # reference layeredflow_dataset.py); the input must stay large
        # enough that the /8 /4 volume keeps >1 spatial element
        (520, 760, 952, 532, 8.0, 8.0),
    ],
)
def test_protocol_golden_nonlambertian(
    torch_stereo, torch_mono, jax_stereo, jax_mono, h, w, tw, th, iscale, oscale
):
    rng = np.random.default_rng(7)
    sample = _sample(rng, h, w)
    iters = 2
    ref_m, _ = _torch_protocol_run(
        sample, torch_stereo, torch_mono, tw, th, iscale, oscale, iters
    )
    got_m, _ = _jax_protocol_run(
        sample, jax_stereo, jax_mono, tw, th, iscale, oscale, iters
    )
    _compare(ref_m, got_m)


def test_protocol_golden_layeredflow_sparse(
    torch_stereo, torch_mono, jax_stereo, jax_mono
):
    """LayeredFlow-style SPARSE ground truth: a handful of annotated points
    (the pickle path of reference layeredflow_dataset.py:50-63 yields
    gt > 0 at isolated pixels, validgt = gt > 0, no occlusion mask) through
    the iscale-8 protocol — exercises the sparse-point metric path and the
    oscale nearest gt reduction on mostly-empty maps."""
    rng = np.random.default_rng(11)
    h, w = 520, 760
    sample = _sample(rng, h, w)
    gt = np.zeros((h, w, 1), np.float32)
    pts = rng.integers(0, [h, w], size=(200, 2))
    for (py, px) in pts:
        gt[py, px, 0] = float(rng.uniform(1.0, 24.0))
    sample["gt"] = gt
    sample["validgt"] = (gt > 0).astype(np.float32)
    sample["maskocc"] = np.zeros_like(gt)
    iters = 2
    ref_m, _ = _torch_protocol_run(
        sample, torch_stereo, torch_mono, 952, 532, 8.0, 8.0, iters
    )
    got_m, _ = _jax_protocol_run(
        sample, jax_stereo, jax_mono, 952, 532, 8.0, 8.0, iters
    )
    _compare(ref_m, got_m)
