"""Capture-loop tests (serve/camera.py vs reference demo/fast_demo_oak.py
semantics): EMA filter recursion, border clipping, JET colormap zero-black,
loop accounting, the depthai gate, and the CLI replay path end-to-end with
a stubbed inference."""
import os
import sys

import numpy as np
import pytest

from stereoanywhere_tpu.serve.camera import (
    CaptureLoop,
    DirectorySource,
    OakDSource,
    disparity_frame,
    ema_filter,
)


def test_ema_matches_reference_recursion():
    # reference fast_demo_oak.py:40-49: s_0 = x_0; s_t = a*x_t + (1-a)*s_{t-1}
    rng = np.random.RandomState(0)
    xs = [rng.rand(4, 5).astype(np.float32) for _ in range(6)]
    step = ema_filter(0.15)
    ref = None
    for x in xs:
        ref = x if ref is None else 0.15 * x + 0.85 * ref
        np.testing.assert_allclose(step(x), ref, rtol=1e-6)


def test_capture_loop_clip_ema_and_stop():
    rng = np.random.RandomState(1)
    frames = [(rng.rand(10, 12, 3), rng.rand(10, 12, 3)) for _ in range(5)]
    calls = []

    def infer(l, r):
        # reference parity: inference sees the FULL frame; --clip_* only
        # crops the displayed output (fast_demo_oak.py:250-311)
        assert l.shape == (10, 12, 3) and r.shape == (10, 12, 3)
        return l[..., 0] * 2.0

    seen = []
    loop = CaptureLoop(
        infer, ema_alpha=0.5, clip=(1, 2, 3, 0), on_frame=lambda res: seen.append(res)
    )
    n = loop.run(frames, max_frames=4)
    assert n == 4 and loop.stats["frames"] == 4
    assert seen[0]["left"].shape == (7, 9, 3)  # clip applied to outputs
    # EMA of the (clipped) disparity stream vs the closed recursion
    ref = None
    for i in range(4):
        d = frames[i][0][1:8, 3:, 0] * 2.0
        ref = d if ref is None else 0.5 * d + 0.5 * ref
    np.testing.assert_allclose(seen[3]["smoothed"], ref, rtol=1e-6)
    assert seen[0]["sgm"] is None

    # early stop via on_frame returning False
    loop2 = CaptureLoop(infer, clip=(1, 2, 3, 0), on_frame=lambda res: False)
    assert loop2.run(frames) == 1


def test_capture_loop_passes_sgm_stream():
    frames = [(np.ones((6, 6, 3)), np.ones((6, 6, 3)), np.full((6, 6), 7.0))]
    got = []
    CaptureLoop(lambda l, r: l[..., 0], on_frame=lambda res: got.append(res)).run(frames)
    np.testing.assert_array_equal(got[0]["sgm"], np.full((6, 6), 7.0))


def test_disparity_frame_jet_zero_black():
    d = np.array([[0.0, 1.0, 32.0, 64.0]])
    rgb = disparity_frame(d, max_disp=64.0)
    assert rgb.shape == (1, 4, 3) and rgb.dtype == np.uint8
    assert (rgb[0, 0] == 0).all()  # invalid pixel forced black
    # low disparity -> blue-dominant, max -> red-dominant (JET ends)
    assert rgb[0, 1, 2] > rgb[0, 1, 0]
    assert rgb[0, 3, 0] > rgb[0, 3, 2]
    # monotone hue progression: red channel non-decreasing along the ramp
    assert rgb[0, 3, 0] >= rgb[0, 2, 0] >= rgb[0, 1, 0]


def test_oak_source_gated_without_depthai():
    if "depthai" in sys.modules:  # pragma: no cover
        pytest.skip("depthai installed")
    with pytest.raises(ImportError, match="depthai"):
        OakDSource()


def test_directory_source_and_cli_camera(tmp_path, monkeypatch):
    from PIL import Image

    for side in ("left", "right"):
        os.makedirs(tmp_path / side)
        for i in range(3):
            Image.fromarray(
                np.uint8(np.random.RandomState(i).rand(8, 10, 3) * 255)
            ).save(tmp_path / side / f"{i}.png")

    src = DirectorySource(
        sorted(str(p) for p in (tmp_path / "left").iterdir()),
        sorted(str(p) for p in (tmp_path / "right").iterdir()),
    )
    pairs = list(src)
    assert len(pairs) == 3 and pairs[0][0].shape == (8, 10, 3)
    assert pairs[0][0].max() <= 1.0

    # CLI replay path with the heavy model stubbed out (the loop/IO surface
    # is what this test owns; the pipeline has its own tests)
    from stereoanywhere_tpu import cli

    class _FakePipe:
        def __init__(self, *a, **k):
            pass

        def __call__(self, l, r):
            return np.asarray(l)[..., :1] * 3.0

    import stereoanywhere_tpu.serve.pipeline as sp

    monkeypatch.setattr(sp, "StereoAnywherePipeline", _FakePipe)
    monkeypatch.setattr(cli, "_load_stereo", lambda c, cfg: (None, {}))
    monkeypatch.setattr(cli, "_load_mono", lambda c, e: (None, {}))
    out = tmp_path / "out"
    cli.main(
        [
            "camera",
            "--left-glob", str(tmp_path / "left" / "*.png"),
            "--right-glob", str(tmp_path / "right" / "*.png"),
            "-o", str(out),
            "--max-frames", "2",
            "--clip-top", "1",
        ]
    )
    files = sorted(os.listdir(out))
    assert files == ["frame_00000.png", "frame_00001.png"]
    assert np.asarray(Image.open(out / "frame_00000.png")).shape == (7, 10, 3)


def test_rolling_max_scale():
    from stereoanywhere_tpu.serve.camera import rolling_max

    step = rolling_max(window=3)
    assert step(np.array([1.0, 4.0])) == 4.0
    assert step(np.array([8.0])) == 6.0           # mean(4, 8)
    assert step(np.array([0.0])) == 4.0           # mean(4, 8, 0)
    assert step(np.array([1.0])) == 3.0           # window drops the 4
