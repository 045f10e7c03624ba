"""End-to-end eval protocol: synthetic Middlebury scene -> fetch_dataset ->
Evaluator (pad-32, mono normalize, metrics, CSV) with a real (random-init)
model — the full test.py-equivalent path (reference test.py:160-274)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.data import fetch_dataset
from stereoanywhere_tpu.data.frame_utils import write_pfm
from stereoanywhere_tpu.eval.harness import Evaluator


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_evaluator_end_to_end(tmp_path, rng):
    # synthetic scene: 40x64, known gt
    root = str(tmp_path / "data")
    scene = f"{root}/sceneA"
    _png(f"{scene}/im0.png", rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    _png(f"{scene}/im1.png", rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    gt = rng.uniform(1, 12, (40, 64)).astype(np.float32)
    write_pfm(f"{scene}/disp0GT.pfm", gt)
    _png(f"{scene}/mask0nocc.png", np.full((40, 64), 255, np.uint8))
    ds = fetch_dataset("middlebury", root, test=True)

    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    model = StereoAnywhere(StereoAnywhereConfig())
    dummy = tuple(jnp.zeros((1, 32, 64, c), jnp.float32) for c in (3, 3, 1, 1))
    variables = jax.jit(lambda k: model.init(k, *dummy, iters=1, test_mode=True))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def stereo_fn(im2, im3, m2, m3):
        return model.apply(variables, im2, im3, m2, m3, iters=2, test_mode=True)[
            "disparity"
        ]

    def mono_fn(images01, dataset):
        # stand-in VFM: inverse-luma "depth" (shape/protocol identical)
        return 1.0 - images01.mean(axis=-1, keepdims=True)

    imgdir = str(tmp_path / "imgs")
    ev = Evaluator(
        stereo_fn, mono_fn=mono_fn, dataset_name="middlebury", save_images_dir=imgdir
    )
    res = ev.run(ds)
    means = res.mean()
    for key in ("bad 2.0", "avgerr", "rms"):
        assert key in means, sorted(means)
        assert np.isfinite(means[key])

    # qualitative dumps (reference test.py:298-334): one PNG per panel
    dumped = sorted(os.listdir(imgdir))
    for panel in ("left", "dmap", "gt", "maemap", "metricmap", "mono"):
        assert any(panel in f for f in dumped), (panel, dumped)

    csv_path = str(tmp_path / "out.csv")
    res.to_csv(csv_path, extra_cols={"dataset": "middlebury", "iters": 2})
    text = open(csv_path).read()
    assert "avgerr" in text and "middlebury" in text


def test_evaluator_iscale_path(tmp_path, rng):
    """iscale=2 downscales inputs and rescales the disparity back by the
    width ratio (reference test.py:169-176, 229-240)."""
    root = str(tmp_path / "data")
    scene = f"{root}/sceneB"
    _png(f"{scene}/im0.png", rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    _png(f"{scene}/im1.png", rng.integers(0, 255, (64, 96, 3)).astype(np.uint8))
    write_pfm(f"{scene}/disp0GT.pfm", rng.uniform(1, 12, (64, 96)).astype(np.float32))
    _png(f"{scene}/mask0nocc.png", np.full((64, 96), 255, np.uint8))
    ds = fetch_dataset("middlebury", root, test=True)

    seen = {}

    def stereo_fn(im2, im3, m2, m3):
        seen["shape"] = im2.shape
        return jnp.ones(im2.shape[:3] + (1,), jnp.float32) * 4.0

    ev = Evaluator(stereo_fn, mono_fn=lambda x, d: x.mean(-1, keepdims=True),
                   dataset_name="middlebury", iscale=2.0)
    res = ev.run(ds)
    # model saw the half-res input (48 wide, padded to the next 32-multiple)
    assert seen["shape"][1:3] == (32, 64)
    assert np.isfinite(res.mean()["avgerr"])
