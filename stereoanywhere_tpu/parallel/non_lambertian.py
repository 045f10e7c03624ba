"""Mirror-aware high-resolution inference wrapper.

The analog of the reference NonLambertianProcessor (reference
non_lambertian.py:20-59): detects candidate non-Lambertian regions via an
Otsu threshold on the |left - right| intensity difference (pure numpy —
replacing the OpenCV dependency) and runs tile-parallel inference with the
mirror-truncation machinery force-enabled.
"""
from __future__ import annotations

import numpy as np

from stereoanywhere_tpu.parallel.tiles import TileParallelInference


def otsu_threshold(gray: np.ndarray, bins: int = 256) -> float:
    """Otsu's method on a [0,1] grayscale image (numpy reimplementation of
    cv2.threshold(..., THRESH_OTSU) used at reference non_lambertian.py:34-43)."""
    hist, edges = np.histogram(gray.ravel(), bins=bins, range=(0.0, 1.0))
    hist = hist.astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0.5
    p = hist / total
    centers = 0.5 * (edges[:-1] + edges[1:])
    w0 = np.cumsum(p)
    w1 = 1.0 - w0
    mu = np.cumsum(p * centers)
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * w0 - mu) ** 2 / (w0 * w1)
    sigma_b[~np.isfinite(sigma_b)] = -1
    return float(centers[int(np.argmax(sigma_b))])


def non_lambertian_mask(im2: np.ndarray, im3: np.ndarray) -> np.ndarray:
    """Binary mask of photometrically-inconsistent regions from the L/R
    intensity difference (reference non_lambertian.py:34-43)."""
    from stereoanywhere_tpu import native

    g2 = im2.mean(axis=-1)
    g3 = im3.mean(axis=-1)
    diff = np.abs(g2 - g3)
    diff = diff / max(diff.max(), 1e-6)
    if native.available():
        # uint8 histogram Otsu — same quantization as the reference's
        # cv2.threshold(u8, ..., THRESH_OTSU) path.
        _, mask = native.otsu_mask(np.round(diff * 255).astype(np.uint8))
        return (mask > 0).astype(np.float32)
    th = otsu_threshold(diff)
    return (diff > th).astype(np.float32)


class NonLambertianProcessor(TileParallelInference):
    """TileParallelInference that reports the non-Lambertian coverage and is
    intended to be constructed with a model config that force-enables
    `use_truncate_vol` + mirror parameters (reference non_lambertian.py:44-59
    forces those kwargs; here they are fields of StereoAnywhereConfig)."""

    def analyze(self, im2_np: np.ndarray, im3_np: np.ndarray) -> dict:
        mask = non_lambertian_mask(im2_np, im3_np)
        return {
            "mask": mask,
            "coverage": float(mask.mean()),
        }
