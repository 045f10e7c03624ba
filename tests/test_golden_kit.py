"""Golden-readiness kit (tools/golden_eval.py): the one-command
convert -> eval -> Table-format report path, driven end to end with
random-init torch checkpoints standing in for the released weights
(no egress for the real ones — BASELINE.json north star; the command line
is identical when they appear), plus the vitl-scale converter shape check.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (fast tier: -m 'not slow')

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_golden_eval():
    spec = importlib.util.spec_from_file_location(
        "golden_eval", os.path.join(REPO, "tools", "golden_eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_golden_eval_one_command(tmp_path, rng, monkeypatch, capsys):
    """Full kit run on a synthetic ETH3D scene: torch .tar + .pth in,
    per-metric published-delta report out (random init -> exit code 2)."""
    import torch

    from tests.reference_loader import load_reference_stereo_module
    from tests.test_dav2 import _load_reference_dav2

    # released-style stereo checkpoint (DataParallel 'module.' prefixes)
    load_reference_stereo_module()
    from models.stereoanywhere.stereoanywhere import StereoAnywhere as TorchSA

    torch.manual_seed(0)
    sd = {f"module.{k}": v for k, v in TorchSA({}).state_dict().items()}
    stereo_tar = str(tmp_path / "sceneflow.tar")
    torch.save({"state_dict": sd}, stereo_tar)

    # released-style DAv2 checkpoint (vits scale for CPU runtime)
    dpt = _load_reference_dav2()
    mono = dpt.DepthAnythingV2(encoder="vits", features=64, out_channels=[48, 96, 192, 384])
    mono_pth = str(tmp_path / "depth_anything_v2_vits.pth")
    torch.save(mono.state_dict(), mono_pth)

    # synthetic ETH3D scene (served by the Middlebury layout, datasets.py)
    root = str(tmp_path / "eth3d")
    scene = f"{root}/sceneA"
    _png(f"{scene}/im0.png", rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    _png(f"{scene}/im1.png", rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    from stereoanywhere_tpu.data.frame_utils import write_pfm

    write_pfm(f"{scene}/disp0GT.pfm", rng.uniform(1, 12, (40, 64)).astype(np.float32))
    _png(f"{scene}/mask0nocc.png", np.full((40, 64), 255, np.uint8))

    ge = _load_golden_eval()
    monkeypatch.setattr(
        sys, "argv",
        ["golden_eval.py", "--stereo-ckpt", stereo_tar, "--mono-ckpt", mono_pth,
         "--mono-encoder", "vits", "--data", f"eth3d={root}",
         "--iters", "2", "--max-samples", "1"],
    )
    with pytest.raises(SystemExit) as e:
        ge.main()
    out = capsys.readouterr().out
    assert "Zero-shot report vs published" in out
    assert "bad 1.0" in out and "published" in out and "delta" in out
    assert "latex:" in out
    # random-init weights cannot be at parity -> tolerance exit code
    assert e.value.code == 2, out[-2000:]


def test_dav2_vitl_converter_shapes():
    """vitl-scale converter check: the converted released-checkpoint tree
    must match DepthAnythingV2(vitl)'s parameter shapes exactly (golden
    numerics are covered at vits scale in test_dav2.py; vitl differs in
    depth/width/out_channels and layer-index selection)."""
    import torch

    from tests.test_dav2 import _load_reference_dav2

    dpt = _load_reference_dav2()
    torch.manual_seed(0)
    ref = dpt.DepthAnythingV2(
        encoder="vitl", features=256, out_channels=[256, 512, 1024, 1024]
    )
    sd = ref.state_dict()

    from stereoanywhere_tpu.compat import convert_dav2_checkpoint
    from stereoanywhere_tpu.config import MonoConfig
    from stereoanywhere_tpu.models.dpt import DepthAnythingV2

    converted = convert_dav2_checkpoint(sd)

    model = DepthAnythingV2(MonoConfig.for_encoder("vitl"))
    import jax.numpy as jnp

    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 126, 126, 3), jnp.float32),
    )

    flat_c = jax.tree_util.tree_flatten_with_path(converted)[0]
    flat_e = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]}
    assert len(flat_c) == len(flat_e), (len(flat_c), len(flat_e))
    missing = [jax.tree_util.keystr(p) for p, _ in flat_c if jax.tree_util.keystr(p) not in flat_e]
    assert not missing, missing[:10]
    for p, v in flat_c:
        key = jax.tree_util.keystr(p)
        assert tuple(np.shape(v)) == tuple(flat_e[key].shape), (
            key, np.shape(v), flat_e[key].shape
        )
