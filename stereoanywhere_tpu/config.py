"""Typed configuration tree for the whole framework.

Replaces the reference's per-script argparse duplication (reference
train.py:56-119, test.py:89-103, stereoanywhere.py:21-50 `hasattr` fallbacks)
with one serializable dataclass hierarchy.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class StereoAnywhereConfig:
    """Model hyperparameters.

    Defaults mirror the shipped reference configuration
    (reference stereoanywhere.py:25-50 + README eval flags).
    """

    # Iterative refinement
    corr_radius: int = 4
    corr_levels: int = 4
    n_gru_layers: int = 3
    n_downsample: int = 2
    context_dims: tuple[int, ...] = (128, 128, 128)
    fnet_dim: int = 256

    # Volume aggregation
    n_additional_hourglass: int = 0
    volume_channels: int = 8
    vol_n_masks: int = 8
    vol_aug_n_masks: int = 4
    vol_downsample: int = 0
    use_aggregate_stereo_vol: bool = False
    use_aggregate_mono_vol: bool = True
    # Reference train.py:245 calls freeze_bn() every step: BatchNorm always
    # runs frozen (running-stat) normalization.  False enables batch stats.
    freeze_bn: bool = True
    # Lane-folded hourglass layout (B,W3,H,W2*C) — exact same math, removes
    # the 16x lane padding of C=8 NDHWC tensors (ops/folded.py).  Off only
    # for debugging layout-sensitive numerics.
    hourglass_folded: bool = True
    # Carried block layout (B,nb,W3,H,(W2/nb)*C) on top of the fold: the
    # banded convs keep the block axis between layers, replacing the
    # per-conv window stack / unstack passes with a cheap halo exchange and
    # enabling a denser band (ops/folded.py "Block-batch carried layout").
    # Auto-disabled when W2 has no wb%8==0 split (pick_nb returns None).
    hourglass_blocked: bool = True

    # Mirror handling
    use_truncate_vol: bool = True
    mirror_conf_th: float = 0.98
    mirror_attenuation: float = 0.9

    # Misc
    lrc_th: float = 1.0
    normal_gain: float = 10.0
    init_disparity_zero: bool = False
    volume_corruption_prob: float = 0.33

    # Numerics
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # GRU-loop correlation lookup: "auto" resolves to the XLA inline tent
    # (the measured in-model winner, see models/stereoanywhere.py dispatch);
    # "inline" / "lagged" force an XLA formulation, "mxu" / "barrel" force a
    # Pallas kernel (inference-only, TPU-only — falls back to inline
    # elsewhere).
    lookup_impl: str = "auto"
    # Level-0-fused refinement loop (ops/pallas/step_fused.py): the rotated
    # scan body runs the whole refinement cascade in six Pallas kernels.
    # MEASURED NEGATIVE at 1024²/bf16 on v5e (round 5): 5.03 ms/iter vs the
    # XLA scan body's 3.71 — the kernels run their convs at ~71-87% MXU but
    # pay +27% halo/width overcompute, and the windowed-lookup VPU assembly
    # floors at ~1.9 ms/iter, matching XLA's own window lookup
    # (ARCHITECTURE.md "fused-step kernel postmortem").  Default "off";
    # "on" (TPU) / "interpret" (CPU tests) exercise the exactness-proven
    # kernels; "auto" currently resolves to off.
    fused_level0: str = "off"
    # Internal width alignment for wide inference inputs (see the geometry
    # note in models/stereoanywhere.py): replicate-pad W to a multiple of
    # `width_pad_align` when W >= width_pad_min in test mode, crop the
    # disparity back.  0 disables.
    width_pad_align: int = 64
    width_pad_min: int = 640
    # GRU-loop unroll (largest divisor of iters <= this is used).  Measured
    # flat on v5e at 512^2 (the loop is not dispatch-bound) while multiplying
    # compile time; keep 1 unless re-measuring on new hardware.
    scan_unroll: int = 1

    @property
    def downsample_factor(self) -> int:
        return 2 ** self.n_downsample

    @property
    def corr_channels(self) -> int:
        """Per-volume channels fed to the motion encoder: (2r+1) * levels."""
        return self.corr_levels * (2 * self.corr_radius + 1)


@dataclass(frozen=True)
class MonoConfig:
    """Depth-Anything-V2 branch config (reference depth_anything_v2/__init__.py:8-38)."""

    encoder: str = "vitl"  # vits | vitb | vitl | vitg
    features: int = 256
    out_channels: tuple[int, ...] = (256, 512, 1024, 1024)
    # Default inference size (multiple of 14); per-dataset overrides in eval harness.
    input_size: int = 518

    @staticmethod
    def for_encoder(encoder: str) -> "MonoConfig":
        cfgs = {
            "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
            "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
            "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
            "vitg": dict(features=384, out_channels=(1536, 1536, 1536, 1536)),
        }
        return MonoConfig(encoder=encoder, **cfgs[encoder])


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference run_train.sh + train.py:209-213)."""

    lr: float = 1e-4
    weight_decay: float = 1e-5
    adam_eps: float = 1e-8
    epochs: int = 3
    batch_size: int = 2
    crop_h: int = 320
    crop_w: int = 640
    train_iters: int = 12
    valid_iters: int = 32
    gamma: float = 0.9  # per-iteration loss decay, exponent-adjusted (train.py:295)
    grad_clip: float = 1.0
    pct_start: float = 0.001
    gt_mono_prob: float = 0.3
    use_border_mask: bool = True
    use_normal_loss_on_coarse: bool = True
    use_normal_loss: bool = False  # per-iteration normal loss (train.py:302-306)
    normal_loss_gain: float = 10.0
    lrc_th: float = 1.0  # confidence-BCE threshold (reference --lrc_th)
    max_disp: float = 700.0  # gt validity cap (reference run_train.sh MAXDISP=700)
    things_to_freeze: tuple[str, ...] = ("fnet",)
    num_steps: int = 0  # 0 = derive from dataset length * epochs
    seed: int = 1337
    debug_grad: bool = False  # per-param NaN/Inf gradient census
    # (reference --debug_grad, train.py:124-127,391-418)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-chip execution."""

    data: int = 1   # batch-parallel axis
    tile: int = 1   # spatial tile-parallel axis (replaces reference mapreduce_v2)

    @property
    def axis_names(self) -> tuple[str, str]:
        return ("data", "tile")


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol knobs (reference test.py:89-155)."""

    dataset: str = "middlebury"
    iters: int = 32
    iscale: float = 1.0
    oscale: float = 1.0
    pad_multiple: int = 32


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2, default=str)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
