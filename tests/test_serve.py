"""End-to-end HTTP serving round trip: server thread + client."""
import os
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_http_server_roundtrip(rng):
    from http.server import HTTPServer

    from stereoanywhere_tpu.serve.client import infer_remote

    # A stub pipeline (identity-ish) keeps the test fast; the real pipeline's
    # model path is covered by the model/golden tests.
    class StubPipeline:
        def __call__(self, im2, im3, mde2=None, mde3=None):
            return jnp.mean(im2, axis=-1, keepdims=True) * 16.0

    import stereoanywhere_tpu.serve.pipeline as sp

    # build the handler with the stub, bind an ephemeral port
    server_holder = {}

    def run():
        import io
        import json
        from http.server import BaseHTTPRequestHandler

        pipeline = StubPipeline()

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                length = int(self.headers["Content-Length"])
                meta_len = int(self.headers.get("X-Meta-Length", 0))
                raw = self.rfile.read(length)
                meta = json.loads(raw[:meta_len])
                h, w = meta["h"], meta["w"]
                arr = np.frombuffer(raw[meta_len:], np.float32).reshape(2, h, w, 3)
                disp = np.asarray(pipeline(jnp.asarray(arr[:1]), jnp.asarray(arr[1:])))
                out = np.clip(disp[0, ..., 0] * 256.0, 0, 65535).astype(np.uint16).tobytes()
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):
                pass

        srv = HTTPServer(("127.0.0.1", 0), Handler)
        server_holder["srv"] = srv
        srv.serve_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(50):
        if "srv" in server_holder:
            break
        time.sleep(0.05)
    port = server_holder["srv"].server_address[1]

    im2 = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
    im3 = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
    disp = infer_remote(f"http://127.0.0.1:{port}", im2, im3)
    server_holder["srv"].shutdown()

    assert disp.shape == (24, 32)
    np.testing.assert_allclose(disp, im2.mean(-1) * 16.0, atol=1 / 128)


@pytest.mark.slow
def test_vol_downsample_config(rng):
    """vol_downsample>0 trilinear path compiles and produces sane output."""
    from stereoanywhere_tpu.config import StereoAnywhereConfig
    from stereoanywhere_tpu.models import StereoAnywhere

    model = StereoAnywhere(StereoAnywhereConfig(vol_downsample=1))
    args = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 64, 64, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    v = jax.jit(lambda k, *a: model.init(k, *a, iters=1, test_mode=True))(
        jax.random.PRNGKey(0), *args
    )
    out = model.apply(v, *args, iters=1, test_mode=True)
    d = np.asarray(out["disparity"])
    assert d.shape == (1, 64, 64, 1) and np.isfinite(d).all()


@pytest.mark.slow
def test_cli_infer_file_pair(tmp_path, rng):
    """`cli infer left right -o out` writes a finite disparity .npy and a
    colormap PNG (reference demo/fast_demo.py CLI surface)."""
    from PIL import Image

    from stereoanywhere_tpu.cli import main

    for name in ("left.png", "right.png"):
        Image.fromarray(
            rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
        ).save(tmp_path / name)
    out = tmp_path / "out"
    main([
        "infer", str(tmp_path / "left.png"), str(tmp_path / "right.png"),
        "-o", str(out), "--iters", "2", "--mono-encoder", "vits",
    ])
    d = np.load(out / "left_disp.npy")
    assert d.shape == (32, 64) and np.isfinite(d).all()
    assert (out / "left_disp.png").exists()


@pytest.mark.slow
def test_cli_eval_autodetects_dropped_tar(tmp_path, monkeypatch, capsys):
    """cli eval with no --checkpoint picks up $SA_CHECKPOINT/sceneflow.tar
    (the released-weights drop-in path) and prints the published-table
    comparison (insurance for the day egress exists)."""
    import torch

    from tests.reference_loader import load_reference_stereo_module

    load_reference_stereo_module()
    from models.stereoanywhere.stereoanywhere import StereoAnywhere as TorchSA

    torch.manual_seed(0)
    sa = TorchSA({})
    ckpt = str(tmp_path / "sceneflow.tar")
    torch.save(
        {"state_dict": {f"module.{k}": v for k, v in sa.state_dict().items()}},
        ckpt,
    )

    from PIL import Image

    from stereoanywhere_tpu.data.frame_utils import write_pfm

    root = str(tmp_path / "eth3d")
    scene = f"{root}/sceneA"
    os.makedirs(scene, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in ("im0.png", "im1.png"):
        Image.fromarray(rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)).save(
            f"{scene}/{n}"
        )
    write_pfm(f"{scene}/disp0GT.pfm", rng.uniform(1, 12, (64, 96)).astype(np.float32))
    Image.fromarray(np.full((64, 96), 255, np.uint8)).save(f"{scene}/mask0nocc.png")

    from tests.test_protocol_golden import _load_reference_dav2_module

    dpt = _load_reference_dav2_module()
    torch.manual_seed(1)
    dav2 = dpt.DepthAnythingV2(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384]
    )
    mono_ckpt = str(tmp_path / "depth_anything_v2_vits.pth")
    torch.save(dav2.state_dict(), mono_ckpt)

    from stereoanywhere_tpu import cli

    monkeypatch.setenv("SA_CHECKPOINT", ckpt)
    rc = cli.main([
        "eval", "--dataset", "eth3d", "--datapath", root, "--iters", "1",
        "--max-samples", "1", "--mono-checkpoint", mono_ckpt,
        "--mono-encoder", "vits",
    ])
    outp = capsys.readouterr().out
    assert "auto-detected checkpoint" in outp
    assert "published (eth3d" in outp
    assert rc in (0, None) or isinstance(rc, dict)
