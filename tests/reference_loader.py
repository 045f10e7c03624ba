"""Import the read-only PyTorch reference as a TEST ORACLE.

The reference's unused heavy deps (timm, torchvision DCN, cv2, matplotlib,
kornia) are stubbed so the model modules import on this minimal image; the
one kornia function actually used at runtime (`spatial_gradient` with
mode='diff', order=1, normalized=False) is provided as our own
central-difference torch implementation.

Nothing from the reference is copied into the framework — these imports exist
only inside the test process to produce golden outputs.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _ensure_stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _spatial_gradient(x, mode="diff", order=1, normalized=False):
    """Central differences with replicate padding: (B,C,H,W) -> (B,C,2,H,W)."""
    import torch
    import torch.nn.functional as F

    assert mode == "diff" and order == 1 and not normalized
    pad = F.pad(x, (1, 1, 1, 1), mode="replicate")
    gx = pad[..., 1:-1, 2:] - pad[..., 1:-1, :-2]
    gy = pad[..., 2:, 1:-1] - pad[..., :-2, 1:-1]
    return torch.stack([gx, gy], dim=2)


def load_reference_stereo_module():
    """Returns the reference models.stereoanywhere package (torch)."""
    _ensure_stub("timm", create_model=lambda *a, **k: None)
    _ensure_stub("cv2")
    _ensure_stub("matplotlib")
    _ensure_stub("matplotlib.pyplot")
    _ensure_stub("matplotlib.cm")
    _ensure_stub("matplotlib.colors")
    sys.modules["matplotlib"].cm = sys.modules["matplotlib.cm"]
    sys.modules["matplotlib"].colors = sys.modules["matplotlib.colors"]
    _ensure_stub("kornia")
    _ensure_stub("kornia.filters", spatial_gradient=_spatial_gradient)
    sys.modules["kornia"].filters = sys.modules["kornia.filters"]
    tv_ops = _ensure_stub("torchvision.ops", deform_conv2d=None)
    _ensure_stub("torchvision", ops=tv_ops)

    # 'models' has no __init__.py in the reference; expose it as a namespace pkg.
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import importlib

    return importlib.import_module("models.stereoanywhere")
