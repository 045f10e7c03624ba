"""The one-command golden kit (tools/golden_eval.py) must actually RUN
end-to-end: reference-format `.tar` checkpoint -> conversion -> dataset
discovery -> full eval protocol -> published-number report.

Uses a synthetic on-disk eth3d-layout scene (MiddleburyDataset layout,
reference middlebury_dataset.py:10-88) and random-init reference-format
checkpoints (torch.save dicts with DataParallel 'module.' prefixes, the
exact shape of the released sceneflow.tar — reference train.py:647-653).
Random weights cannot match the paper, so the kit must exit 2 ("out of
tolerance") — what is asserted here is that the whole pipeline executes
and the report contains every headline block.
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (fast tier: -m 'not slow')
import torch

from stereoanywhere_tpu.data.frame_utils import write_pfm

from tests.reference_loader import load_reference_stereo_module

load_reference_stereo_module()


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.mark.slow
def test_golden_eval_kit_runs(tmp_path, capsys):
    # 1. reference-format checkpoints (random init, 'module.'-prefixed tar)
    from models.stereoanywhere.stereoanywhere import StereoAnywhere as TorchSA

    torch.manual_seed(0)
    sa = TorchSA({})
    stereo_ckpt = str(tmp_path / "sceneflow.tar")
    torch.save(
        {"state_dict": {f"module.{k}": v for k, v in sa.state_dict().items()},
         "optimizer": {}, "scheduler": {}, "current_step": 0},
        stereo_ckpt,
    )

    sys.path_importer_cache.clear()
    from tests.test_protocol_golden import _load_reference_dav2_module

    dpt = _load_reference_dav2_module()
    torch.manual_seed(1)
    dav2 = dpt.DepthAnythingV2(encoder="vits", features=64, out_channels=[48, 96, 192, 384])
    mono_ckpt = str(tmp_path / "depth_anything_v2_vits.pth")
    torch.save(dav2.state_dict(), mono_ckpt)

    # 2. synthetic on-disk scene in the eth3d/Middlebury layout
    rng = np.random.default_rng(0)
    root = str(tmp_path / "eth3d")
    scene = f"{root}/sceneA"
    _png(f"{scene}/im0.png", rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    _png(f"{scene}/im1.png", rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    write_pfm(f"{scene}/disp0GT.pfm", rng.uniform(1, 12, (64, 96)).astype(np.float32))
    _png(f"{scene}/mask0nocc.png", np.full((64, 96), 255, np.uint8))

    # 3. run the actual script entry point
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_eval

    argv_backup = sys.argv
    sys.argv = [
        "golden_eval.py",
        "--stereo-ckpt", stereo_ckpt,
        "--mono-ckpt", mono_ckpt,
        "--mono-encoder", "vits",
        "--data", f"eth3d={root}",
        "--iters", "2",
        "--max-samples", "1",
        "--csv", str(tmp_path / "report.csv"),
    ]
    try:
        with pytest.raises(SystemExit) as exc:
            golden_eval.main()
    finally:
        sys.argv = argv_backup

    # random weights -> out-of-tolerance exit (2); 0 would mean the kit
    # claimed parity with garbage weights
    assert exc.value.code == 2

    out = capsys.readouterr().out
    assert "Zero-shot report vs published" in out
    assert "eth3d:" in out
    assert "bad 1.0" in out and "published" in out and "delta" in out
    assert "latex:" in out
    assert "out of tolerance" in out
    csv_text = open(tmp_path / "report.csv").read()
    assert "avgerr" in csv_text and "eth3d" in csv_text
