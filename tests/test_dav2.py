"""Depth-Anything-V2 branch: shape/finite smoke on ViT-S, golden parity of
the DINOv2+DPT graph against the torch reference, resize-protocol parity.

The torch reference's depth_anything_v2 package imports cv2 at module level
(reference dpt.py:1) — stubbed via reference_loader-style stubs; xformers is
absent so the reference's fallback (plain attention) path runs, which is the
same math as ours.
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.config import MonoConfig
from stereoanywhere_tpu.compat.torch_convert import convert_dav2_checkpoint
from stereoanywhere_tpu.models.dpt import DepthAnythingV2, dav2_input_size

from tests.reference_loader import _ensure_stub, REFERENCE_ROOT


def _load_reference_dav2():
    _ensure_stub("cv2", INTER_CUBIC=2, INTER_AREA=3)
    tvt = _ensure_stub("torchvision.transforms", Compose=lambda ts: ts)
    _ensure_stub("torchvision", transforms=tvt)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("models.depth_anything_v2.dpt")


@pytest.fixture(scope="module")
def torch_dav2():
    dpt = _load_reference_dav2()
    torch.manual_seed(0)
    model = dpt.DepthAnythingV2(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384]
    )
    model.eval()
    return model


def test_dav2_input_size_matches_reference():
    dpt = _load_reference_dav2()
    ref = dpt.DepthAnythingV2.__new__(dpt.DepthAnythingV2)  # only need image2tensor sizing
    for (h, w) in [(375, 1242), (518, 518), (1000, 1500), (700, 500), (94, 310)]:
        for tgt in [(518, 518), (1372, 518), (1036, 1036)]:
            # reference computes (final_w, final_h) via Resize.get_size
            # (reference dpt.py:197-229)
            import models.depth_anything_v2.util.transform as T

            iw, ih = tgt
            if h > w:
                iw, ih = ih, iw
            r = T.Resize(width=iw, height=ih, resize_target=False,
                         keep_aspect_ratio=True, ensure_multiple_of=14,
                         resize_method="lower_bound", image_interpolation_method=2)
            fw, fh = r.get_size(w, h)
            mh, mw = dav2_input_size(h, w, tgt[0], tgt[1])
            assert (mh, mw) == (int(fh), int(fw)), ((h, w), tgt, (mh, mw), (fh, fw))


def test_dav2_golden_forward(torch_dav2, rng):
    state = {k: v.detach().float().numpy() for k, v in torch_dav2.state_dict().items()}
    variables = convert_dav2_checkpoint(state)

    h = w = 14 * 6  # 84: small multiple of 14
    x = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_dav2(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()  # (B,H,W)

    model = DepthAnythingV2(MonoConfig.for_encoder("vits"))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]

    diff = np.abs(ours - ref)
    scale = max(np.abs(ref).max(), 1e-3)
    assert diff.max() / scale < 2e-3, (
        f"DAv2 golden mismatch: max {diff.max():.5f} rel {diff.max()/scale:.5f} "
        f"(ref range {ref.min():.3f}..{ref.max():.3f})"
    )


@pytest.mark.slow
def test_dav2_pos_embed_interpolation(torch_dav2, rng):
    """Non-square input exercises the bicubic pos-embed resize path."""
    state = {k: v.detach().float().numpy() for k, v in torch_dav2.state_dict().items()}
    variables = convert_dav2_checkpoint(state)
    h, w = 14 * 4, 14 * 8
    x = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_dav2(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    model = DepthAnythingV2(MonoConfig.for_encoder("vits"))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))[..., 0]
    diff = np.abs(ours - ref)
    scale = max(np.abs(ref).max(), 1e-3)
    assert diff.max() / scale < 5e-3, (
        f"pos-embed path mismatch: max rel {diff.max()/scale:.5f}"
    )


@pytest.mark.slow
def test_dav2_golden_forward_vitl(rng):
    """Golden parity at the SHIPPED vitl scale (reduced resolution).

    vits covers the graph shape; vitl differs in depth/width/head count and
    — critically — the intermediate layer indices (4,11,17,23) and DPT
    feature widths (reference dpt.py:166-171), which the vits test never
    exercises.  Random-init torch reference vs converted jax forward at
    84x84 (the math is resolution-independent; 84 keeps the 24-layer CPU
    forward in seconds)."""
    dpt = _load_reference_dav2()
    torch.manual_seed(1)
    model = dpt.DepthAnythingV2(
        encoder="vitl", features=256, out_channels=[256, 512, 1024, 1024]
    )
    model.eval()
    state = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    variables = convert_dav2_checkpoint(state)

    h = w = 14 * 6
    x = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    ours_model = DepthAnythingV2(MonoConfig.for_encoder("vitl"))
    ours = np.asarray(ours_model.apply(variables, jnp.asarray(x)))[..., 0]

    diff = np.abs(ours - ref)
    scale = max(np.abs(ref).max(), 1e-3)
    assert diff.max() / scale < 2e-3, (
        f"vitl golden mismatch: max {diff.max():.5f} rel {diff.max()/scale:.5f} "
        f"(ref range {ref.min():.3f}..{ref.max():.3f})"
    )
