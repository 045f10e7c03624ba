"""Golden parity tests: converted reference weights must reproduce the
reference PyTorch model's outputs.

These are THE parity contract: if they pass with random weights, the released
`sceneflow.tar` checkpoint converts faithfully too (same name map, same
layouts, same math).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stereoanywhere_tpu.compat.torch_convert import convert_stereo_checkpoint
from stereoanywhere_tpu.config import StereoAnywhereConfig
from stereoanywhere_tpu.models import StereoAnywhere
from stereoanywhere_tpu.models.extractor import ContextEncoder, FeatureEncoder

from tests.reference_loader import load_reference_stereo_module

ref_pkg = pytest.importorskip("tests.reference_loader") and load_reference_stereo_module()

torch.manual_seed(0)


def _to_np_state(torch_module):
    return {k: v.detach().cpu().numpy() for k, v in torch_module.state_dict().items()}


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(x_nhwc).permute(0, 3, 1, 2).contiguous()


@pytest.fixture(scope="module")
def torch_model():
    from models.stereoanywhere.stereoanywhere import StereoAnywhere as TorchSA

    model = TorchSA({})
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(torch_model):
    state = {k: v.detach().cpu().float().numpy() for k, v in torch_model.state_dict().items()}
    return convert_stereo_checkpoint(state)


def test_converter_covers_all_params(torch_model, converted):
    # Dedupe by storage: the reference's ResidualBlock registers norm3 both
    # directly AND inside the downsample Sequential (extractor.py:44-45), so
    # the state dict lists the same tensors under two names.
    seen = {}
    for k, v in torch_model.state_dict().items():
        if "num_batches_tracked" in k or "running_" in k:
            continue
        seen[v.data_ptr()] = v.numel()
    n_torch = sum(seen.values())
    n_jax = sum(x.size for x in jax.tree.leaves(converted["params"]))
    assert n_torch == n_jax, f"param count mismatch: torch {n_torch} vs jax {n_jax}"


@pytest.mark.slow
def test_converted_tree_matches_init(converted):
    model = StereoAnywhere(StereoAnywhereConfig())
    rng = np.random.default_rng(0)
    args = tuple(
        jnp.asarray(rng.uniform(0, 1, (1, 32, 64, c)).astype(np.float32)) for c in (3, 3, 1, 1)
    )
    init_vars = model.init(jax.random.PRNGKey(0), *args, iters=1, test_mode=True)

    init_paths = {"/".join(str(k.key) for k in p): v.shape for p, v in
                  jax.tree_util.tree_leaves_with_path(init_vars["params"])}
    conv_paths = {"/".join(str(k.key) for k in p): v.shape for p, v in
                  jax.tree_util.tree_leaves_with_path(converted["params"])}
    missing = set(init_paths) - set(conv_paths)
    extra = set(conv_paths) - set(init_paths)
    assert not missing, f"converter missing {len(missing)}: {sorted(missing)[:8]}"
    assert not extra, f"converter extra {len(extra)}: {sorted(extra)[:8]}"
    bad = [p for p in init_paths if init_paths[p] != conv_paths[p]]
    assert not bad, f"shape mismatches: {[(p, init_paths[p], conv_paths[p]) for p in bad[:5]]}"


def test_fnet_golden(torch_model, converted, rng):
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.fnet(_nchw(x)).permute(0, 2, 3, 1).numpy()
    ours = FeatureEncoder(256).apply(
        {"params": converted["params"]["fnet"]}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_cnet_golden(torch_model, converted, rng):
    x = rng.standard_normal((1, 32, 64, 3)).astype(np.float32)
    with torch.no_grad():
        torch_model.cnet.eval()
        ref = torch_model.cnet(_nchw(x), num_layers=3)
    ours = ContextEncoder().apply(
        {
            "params": converted["params"]["cnet"],
            "batch_stats": converted["batch_stats"]["cnet"],
        },
        jnp.asarray(x),
    )
    for scale in range(3):
        for head in range(2):
            np.testing.assert_allclose(
                np.asarray(ours[scale][head]),
                ref[scale][head].permute(0, 2, 3, 1).numpy(),
                rtol=1e-3,
                atol=1e-3,
                err_msg=f"scale {scale} head {head}",
            )


def test_full_model_golden(torch_model, converted, rng):
    """End-to-end: converted weights + identical inputs -> identical disparity."""
    b, h, w = 1, 32, 64
    im2 = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    im3 = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    mde2 = rng.uniform(0.05, 0.95, (b, h, w, 1)).astype(np.float32)
    mde3 = rng.uniform(0.05, 0.95, (b, h, w, 1)).astype(np.float32)
    iters = 2

    with torch.no_grad():
        flow_up, _ = torch_model(
            _nchw(im2), _nchw(im3), _nchw(mde2), _nchw(mde3), iters=iters, test_mode=True
        )
    ref_disp = -flow_up.permute(0, 2, 3, 1).numpy()

    model = StereoAnywhere(StereoAnywhereConfig())
    out = model.apply(
        converted, jnp.asarray(im2), jnp.asarray(im3), jnp.asarray(mde2), jnp.asarray(mde3),
        iters=iters, test_mode=True,
    )
    ours = np.asarray(out["disparity"])

    diff = np.abs(ours - ref_disp)
    # Empirically ~8e-6 end-to-end (bit-level parity of the converted graph).
    assert diff.max() < 1e-3 and np.median(diff) < 1e-4, (
        f"golden mismatch: max {diff.max():.6f}, median {np.median(diff):.6f}"
    )


def test_train_mode_golden(torch_model, converted, rng):
    """Train-mode parity: per-iteration upsampled disparities and the coarse
    mono/scaled/confidence outputs the loss consumes (reference
    stereoanywhere.py:296-299) must match the torch reference.

    Volume corruption is disabled on both sides (the reference draws
    python-random numbers, reference stereoanywhere.py:218-251 — not
    comparable across frameworks); its distribution equivalence is covered by
    tests/test_model_forward.py."""
    b, h, w = 1, 32, 64
    im2 = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    im3 = rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    mde2 = rng.uniform(0.05, 0.95, (b, h, w, 1)).astype(np.float32)
    mde3 = rng.uniform(0.05, 0.95, (b, h, w, 1)).astype(np.float32)
    iters = 2

    old_prob = torch_model.args.volume_corruption_prob
    torch_model.args.volume_corruption_prob = 0.0
    try:
        with torch.no_grad():
            flows, _confs, coarse2, coarse3, conf2, conf3 = torch_model(
                _nchw(im2), _nchw(im3), _nchw(mde2), _nchw(mde3),
                iters=iters, test_mode=False,
            )
    finally:
        torch_model.args.volume_corruption_prob = old_prob

    model = StereoAnywhere(StereoAnywhereConfig(volume_corruption_prob=0.0))
    out = model.apply(
        converted,
        jnp.asarray(im2), jnp.asarray(im3), jnp.asarray(mde2), jnp.asarray(mde3),
        iters=iters, test_mode=False, train=True,
        mutable=["batch_stats"],
    )[0]

    def close(ours, ref_nchw, name, tol=1e-3):
        ref = ref_nchw.detach().permute(0, 2, 3, 1).numpy()
        diff = np.abs(np.asarray(ours, np.float32) - ref)
        assert diff.max() < tol and np.median(diff) < tol / 10, (
            f"{name}: max {diff.max():.6f}, median {np.median(diff):.6f}"
        )

    assert out["disparities"].shape[0] == iters
    for i, f in enumerate(flows):
        close(out["disparities"][i], -f, f"iteration {i} disparity")

    close(out["coarse_dispmono2"], coarse2[1], "coarse_dispmono2")
    close(out["coarse_dispmono3"], coarse3[1], "coarse_dispmono3")
    close(out["coarse_scaled_mde2"], coarse2[2], "coarse_scaled_mde2")
    close(out["coarse_scaled_mde3"], coarse3[2], "coarse_scaled_mde3")
    close(out["coarse_conf2"], conf2[1], "coarse_conf2")
    close(out["coarse_conf3"], conf3[1], "coarse_conf3")
