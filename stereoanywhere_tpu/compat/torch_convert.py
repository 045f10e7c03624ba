"""PyTorch checkpoint -> JAX pytree weight converter.

Converts the reference's released checkpoints into this framework's Flax
variable trees:

- stereo model `.tar` dicts {state_dict|model, optimizer, ...} with
  `module.`-prefixed keys from nn.DataParallel (reference train.py:647-653,
  test_mapreduce_v2.py:98-103),
- Depth-Anything-V2 `.pth` state dicts (reference depth_anything_v2/__init__.py).

Layout rules:
  Conv2d   (O,I,kh,kw)    -> (kh,kw,I,O)
  Conv3d   (O,I,kd,kh,kw) -> (kd,kh,kw,I,O)
  ConvT2d  (I,O,kh,kw)    -> (kh,kw,O,I)   [ConvTransposeTorch stores (kh,kw,out,in)]
  Linear   (O,I)          -> (I,O)
  Norm scale/bias, layerscale gamma: as-is.

torch is only needed for loading (.tar is a zipfile of pickled tensors);
loaded on CPU and converted to numpy immediately.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint to a flat {name: np.ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().cpu().float().numpy()
    return out


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT2d(w):
    # torch (in, out, kh, kw) -> ConvTransposeTorch kernel (kh, kw, out, in)
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):
    return np.transpose(w, (1, 0))


# ---------------------------------------------------------------------------
# Stereo model


def _stereo_rename(name: str) -> tuple[list[str], str] | None:
    """Map a torch parameter name to (flax path, kind).

    kind in {conv2d, conv3d, convT2d, linear, bias, scale, stat}.
    Returns None for parameters we intentionally drop (none expected).
    """
    parts = name.split(".")

    def seq(mod_idx: list[str]) -> str:
        return "_".join(mod_idx)

    # fnet / cnet trunk --------------------------------------------------
    m = re.match(r"(fnet|cnet)\.(.*)", name)
    if m:
        root, rest = m.group(1), m.group(2)
        r = rest.split(".")
        if r[0] in ("conv1", "conv2") and r[1] in ("weight", "bias"):
            return [root, r[0], {"weight": "kernel", "bias": "bias"}[r[1]]], (
                "conv2d" if r[1] == "weight" else "bias"
            )
        if r[0] == "norm1":  # cnet BatchNorm2d / fnet InstanceNorm(no params)
            return [root, "norm1", r[1]], "bn"
        if re.match(r"layer\d", r[0]):
            # layerN.K.conv1.weight / normX.{weight,bias,running_*} / downsample.0.weight
            base = [root, f"{r[0]}_{r[1]}"]
            if r[2] in ("conv1", "conv2"):
                return base + [r[2], {"weight": "kernel", "bias": "bias"}[r[3]]], (
                    "conv2d" if r[3] == "weight" else "bias"
                )
            if r[2] == "downsample":
                # Sequential(Conv2d, norm3): .0 = conv, .1 = batch/instance norm
                if r[3] == "0":
                    return base + ["downsample_0", {"weight": "kernel", "bias": "bias"}[r[4]]], (
                        "conv2d" if r[4] == "weight" else "bias"
                    )
                return base + ["norm3", r[4]], "bn"
            if r[2].startswith("norm"):
                return base + [r[2], r[3]], "bn"
        if r[0].startswith("outputs"):
            # outputs08.i.0.conv1.weight (ResidualBlock) | outputs08.i.1.weight (Conv)
            # outputs32.i.weight (plain conv)
            scale, i = r[0], r[1]
            if scale == "outputs32":
                return [root, f"outputs32_{i}", {"weight": "kernel", "bias": "bias"}[r[2]]], (
                    "conv2d" if r[2] == "weight" else "bias"
                )
            base = [root, f"{scale}_{i}_{r[2]}"]
            if len(r) == 4:  # .1.weight → plain conv
                return base + [{"weight": "kernel", "bias": "bias"}[r[3]]], (
                    "conv2d" if r[3] == "weight" else "bias"
                )
            if r[3] in ("conv1", "conv2"):
                return base + [r[3], {"weight": "kernel", "bias": "bias"}[r[4]]], (
                    "conv2d" if r[4] == "weight" else "bias"
                )
            if r[3] == "downsample":
                return base + ["downsample_0", {"weight": "kernel", "bias": "bias"}[r[5]]], (
                    "conv2d" if r[5] == "weight" else "bias"
                )
            if r[3].startswith("norm"):
                return base + [r[3], r[4]], "bn"

    # context_zqr_convs.i ------------------------------------------------
    m = re.match(r"context_zqr_convs\.(\d)\.(weight|bias)", name)
    if m:
        return [f"context_zqr_convs_{m.group(1)}", {"weight": "kernel", "bias": "bias"}[m.group(2)]], (
            "conv2d" if m.group(2) == "weight" else "bias"
        )

    # classifiers --------------------------------------------------------
    m = re.match(r"(classifier_mono|classifier_monoconf|classifier_stereo)\.(weight)", name)
    if m:
        return [m.group(1), "conv", "kernel"], "conv3d"

    # hourglass ----------------------------------------------------------
    # stacked variants: hourglass_mono_stack.N.* / hourglass_stereo_stack.N.*
    # (index 0 is HourglassIdentity with no params)
    m = re.match(r"(hourglass_mono|hourglass_stereo)_stack\.(\d+)\.(.*)", name)
    if m:
        root = f"{m.group(1)}_stack_{m.group(2)}"
        return _hourglass_body(root, m.group(3).split("."))

    m = re.match(r"(hourglass_mono|hourglass_stereo)\.(.*)", name)
    if m:
        root, rest = m.group(1), m.group(2)
        r = rest.split(".")
        return _hourglass_body(root, r)

    return _stereo_rename_tail(name)


def _hourglass_body(root: str, r: list[str]):
    if r[0] in ("down_layers", "agg_layers", "final_agg"):
        if r[0] == "final_agg":
            base = [root, f"final_agg_{r[1]}"]
            conv_i = 2
        else:
            base = [root, f"{r[0]}_{r[1]}_{r[2]}"]
            conv_i = 3
        # BasicConv: conv.weight (Conv3d, no bias); norm has no params (instance)
        if r[conv_i] == "conv" and r[conv_i + 1] == "weight":
            return base + ["conv", "kernel"], "conv3d"
        return None  # instance norm: no params
    if r[0] in ("feature_atts", "feature_atts_up", "final_feature_atts_up"):
        if r[0] == "final_feature_atts_up":
            base = [root, "final_feature_atts_up"]
            r2 = r[1:]
        else:
            base = [root, f"{r[0]}_{r[1]}"]
            r2 = r[2:]
        # feat_att_left.0.conv.weight (BasicConv 2d) | feat_att_left.1.{weight,bias} (Conv2d)
        side = r2[0]  # feat_att_left / feat_att_right
        if r2[1] == "0" and r2[2] == "conv":
            return base + [f"{side}_0", "conv", "kernel"], "conv2d"
        if r2[1] == "1":
            return base + [f"{side}_1", {"weight": "kernel", "bias": "bias"}[r2[2]]], (
                "conv2d" if r2[2] == "weight" else "bias"
            )
        return None
    return None


def _stereo_rename_tail(name: str):
    # update block -------------------------------------------------------
    m = re.match(r"update_block\.(.*)", name)
    if m:
        r = m.group(1).split(".")
        base = ["update_block"]
        if r[0] == "encoder":
            return base + ["encoder", r[1], {"weight": "kernel", "bias": "bias"}[r[2]]], (
                "conv2d" if r[2] == "weight" else "bias"
            )
        if r[0] in ("gru08", "gru16", "gru32"):
            return base + [r[0], r[1], {"weight": "kernel", "bias": "bias"}[r[2]]], (
                "conv2d" if r[2] == "weight" else "bias"
            )
        if r[0] == "flow_head":
            return base + ["flow_head", r[1], {"weight": "kernel", "bias": "bias"}[r[2]]], (
                "conv2d" if r[2] == "weight" else "bias"
            )
        if r[0] == "mask":
            return base + [f"mask_{r[1]}", {"weight": "kernel", "bias": "bias"}[r[2]]], (
                "conv2d" if r[2] == "weight" else "bias"
            )

    return None


def convert_stereo_checkpoint(state: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Flat torch state dict -> {'params': ..., 'batch_stats': ...} pytree."""
    params: dict = {}
    stats: dict = {}
    unmapped = []
    for name, w in state.items():
        if name.endswith("num_batches_tracked"):
            continue
        mapped = _stereo_rename(name)
        if mapped is None:
            unmapped.append(name)
            continue
        path, kind = mapped
        if kind == "bn":
            leaf = path[-1]
            if leaf == "running_mean":
                _set(stats, path[:-1] + ["mean"], w)
            elif leaf == "running_var":
                _set(stats, path[:-1] + ["var"], w)
            elif leaf == "weight":
                _set(params, path[:-1] + ["scale"], w)
            elif leaf == "bias":
                _set(params, path[:-1] + ["bias"], w)
            continue
        if kind == "conv2d":
            w = _conv2d(w)
        elif kind == "conv3d":
            w = _conv3d(w)
        elif kind == "convT2d":
            w = _convT2d(w)
        elif kind == "linear":
            w = _linear(w)
        _set(params, path, w)

    if unmapped:
        raise ValueError(f"unmapped stereo params ({len(unmapped)}): {unmapped[:10]} ...")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Depth-Anything-V2


def _dav2_rename(name: str) -> tuple[list[str], str] | None:
    r = name.split(".")

    if r[0] == "pretrained":
        base = ["pretrained"]
        rest = r[1:]
        if rest[0] == "cls_token":
            return base + ["cls_token"], "raw"
        if rest[0] == "pos_embed":
            return base + ["pos_embed"], "raw"
        if rest[0] == "mask_token":
            return None  # unused at inference
        if rest[0] == "patch_embed":
            # patch_embed.proj.{weight,bias}
            return base + ["patch_embed_proj", {"weight": "kernel", "bias": "bias"}[rest[2]]], (
                "conv2d" if rest[2] == "weight" else "bias"
            )
        if rest[0] == "blocks":
            i = rest[1]
            bb = base + [f"blocks_{i}"]
            sub = rest[2:]
            if sub[0] in ("norm1", "norm2"):
                return bb + [sub[0], {"weight": "scale", "bias": "bias"}[sub[1]]], "raw"
            if sub[0] == "attn":
                return bb + ["attn", sub[1], {"weight": "kernel", "bias": "bias"}[sub[2]]], (
                    "linear" if sub[2] == "weight" else "raw"
                )
            if sub[0] in ("ls1", "ls2"):
                return bb + [sub[0], "gamma"], "raw"
            if sub[0] == "mlp":
                return bb + ["mlp", sub[1], {"weight": "kernel", "bias": "bias"}[sub[2]]], (
                    "linear" if sub[2] == "weight" else "raw"
                )
        if rest[0] == "norm":
            return base + ["norm", {"weight": "scale", "bias": "bias"}[rest[1]]], "raw"
        return None

    if r[0] == "depth_head":
        base = ["depth_head"]
        rest = r[1:]
        wb = {"weight": "kernel", "bias": "bias"}
        if rest[0] == "projects":
            return base + [f"projects_{rest[1]}", wb[rest[2]]], (
                "conv2d" if rest[2] == "weight" else "bias"
            )
        if rest[0] == "resize_layers":
            i = int(rest[1])
            kind = {0: "convT2d", 1: "convT2d", 3: "conv2d"}.get(i)
            if kind is None:
                return None  # identity layer
            return base + [f"resize_layers_{i}", wb[rest[2]]], (
                kind if rest[2] == "weight" else "bias"
            )
        if rest[0] == "scratch":
            sub = rest[1:]
            if sub[0].endswith("_rn"):
                return base + [f"scratch_{sub[0]}", "kernel"], "conv2d"
            if sub[0].startswith("refinenet"):
                rb = base + [f"scratch_{sub[0]}"]
                if sub[0] == "refinenet4" and sub[1] == "resConfUnit1":
                    # dead weights: refinenet4 is the deepest fusion block and
                    # is called with a single input (reference dpt.py:140), so
                    # its resConfUnit1 never runs — the flax module doesn't
                    # instantiate it.
                    return None
                if sub[1] == "out_conv":
                    return rb + ["out_conv", wb[sub[2]]], (
                        "conv2d" if sub[2] == "weight" else "bias"
                    )
                if sub[1].startswith("resConfUnit"):
                    return rb + [sub[1], sub[2], wb[sub[3]]], (
                        "conv2d" if sub[3] == "weight" else "bias"
                    )
            if sub[0] == "output_conv1":
                return base + ["scratch_output_conv1", wb[sub[1]]], (
                    "conv2d" if sub[1] == "weight" else "bias"
                )
            if sub[0] == "output_conv2":
                i = int(sub[1])
                if i in (0, 2):
                    return base + [f"scratch_output_conv2_{i}", wb[sub[2]]], (
                        "conv2d" if sub[2] == "weight" else "bias"
                    )
                return None
    return None


def convert_dav2_checkpoint(state: Mapping[str, np.ndarray]) -> dict[str, Any]:
    params: dict = {}
    unmapped = []
    for name, w in state.items():
        mapped = _dav2_rename(name)
        if mapped is None:
            if (
                "mask_token" in name
                or "resize_layers.2" in name
                or "refinenet4.resConfUnit1" in name
            ):
                continue
            unmapped.append(name)
            continue
        path, kind = mapped
        if kind == "conv2d":
            w = _conv2d(w)
        elif kind == "convT2d":
            w = _convT2d(w)
        elif kind == "linear":
            w = _linear(w)
        _set(params, path, w)
    if unmapped:
        raise ValueError(f"unmapped DAv2 params ({len(unmapped)}): {unmapped[:10]} ...")
    return {"params": params}
