"""Training-time stereo augmentation — capability-equivalent to the
reference's albumentations-based DisparityAugmentor (reference
dataloaders/augmentor.py:18-290), implemented with numpy + PIL (albumentations
is not a dependency of this framework).

Pipeline (same structure and defaults as the reference):
  1. photometric jitter on the *_aug copies only, asymmetric between views
     with prob `asymmetric_prob` (reference augmentor.py:39-56: 0.3):
     brightness/contrast/saturation/hue/gamma/gaussian-noise,
  2. spatial: random scale (and slight x/y stretch), applied jointly to
     images + gt (gt values scaled by the x-zoom),
  3. horizontal flip WITH left/right view swap + disparity swap (reference
     augmentor.py:119-139), vertical flip,
  4. random crop to crop_size.

Sample dict in/out per data/datasets.py contract (HWC float32, images in
uint8 scale at train time like the reference).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from PIL import Image


def _resize(arr: np.ndarray, hw: tuple[int, int], nearest: bool) -> np.ndarray:
    h, w = hw
    mode = Image.NEAREST if nearest else Image.BILINEAR
    chans = [
        np.asarray(Image.fromarray(arr[..., c].astype(np.float32), mode="F").resize((w, h), mode))
        for c in range(arr.shape[-1])
    ]
    return np.stack(chans, axis=-1)


@dataclass
class DisparityAugmentor:
    crop_size: tuple[int, int] = (320, 640)
    min_scale: float = -0.2
    max_scale: float = 0.2
    do_flip: bool = True
    asymmetric_prob: float = 0.3
    photometric_prob: float = 0.8
    stretch_prob: float = 0.4
    max_stretch: float = 0.1
    vflip_prob: float = 0.1
    noise_std: float = 4.0
    seed: int | None = None

    def __post_init__(self):
        # The RNG is thread-local so PrefetchLoader workers can augment
        # concurrently (the reference accepts the same per-worker stream
        # independence via torch DataLoader worker seeding,
        # base_dataset.py:65-74).  Each thread's stream is derived from
        # (seed, thread-index).
        import itertools
        import threading

        self._tls = threading.local()
        self._thread_counter = itertools.count()

    @property
    def rng(self) -> np.random.Generator:
        if not hasattr(self._tls, "rng"):
            tid = next(self._thread_counter)
            seq = [tid] if self.seed is None else [self.seed, tid]
            self._tls.rng = np.random.default_rng(seq)
        return self._tls.rng

    @rng.setter
    def rng(self, value):
        self._tls.rng = value

    # -- photometric -----------------------------------------------------
    def _jitter(self, im: np.ndarray) -> np.ndarray:
        """im uint8-scale float (H,W,3)."""
        r = self.rng
        out = im.astype(np.float32)
        if r.random() < self.photometric_prob:
            out = out * r.uniform(0.7, 1.3)  # brightness
            mean = out.mean(axis=(0, 1), keepdims=True)
            out = (out - mean) * r.uniform(0.7, 1.3) + mean  # contrast
            gray = out.mean(axis=-1, keepdims=True)
            out = gray + (out - gray) * r.uniform(0.6, 1.4)  # saturation
            gamma = r.uniform(0.7, 1.5)
            out = np.clip(out, 0, 255)
            out = 255.0 * (out / 255.0) ** gamma  # gamma
            if r.random() < 0.3:
                out = out + r.normal(0, self.noise_std, out.shape)  # gaussian noise
            if r.random() < 0.2:  # channel shift (hue-ish)
                out = out + r.uniform(-12, 12, (1, 1, 3))
        return np.clip(out, 0, 255).astype(np.float32)

    # -- main ------------------------------------------------------------
    def __call__(self, data: dict) -> dict:
        r = self.rng
        im2, im3 = data["im2"], data["im3"]
        gt, validgt = data["gt"], data["validgt"]
        gt_r, validgt_r = data["gt_right"], data["validgt_right"]
        mono2 = data.get("im2_mono")
        mono3 = data.get("im3_mono")

        ch, cw = self.crop_size
        h, w = im2.shape[:2]

        # --- spatial scale / stretch -----------------------------------
        min_zoom = max((ch + 8) / h, (cw + 8) / w)
        zoom = max(2.0 ** r.uniform(self.min_scale, self.max_scale), min_zoom)
        zx = zy = zoom
        if r.random() < self.stretch_prob:
            zx *= 2.0 ** r.uniform(-self.max_stretch, self.max_stretch)
            zx = max(zx, min_zoom)
        nh, nw = int(round(h * zy)), int(round(w * zx))

        def spatial(arr, nearest=False, scale_vals=False):
            if arr is None:
                return None
            out = _resize(arr, (nh, nw), nearest)
            return out * zx if scale_vals else out

        im2 = spatial(im2)
        im3 = spatial(im3)
        gt = spatial(gt, nearest=True, scale_vals=True)
        validgt = spatial(validgt, nearest=True)
        gt_r = spatial(gt_r, nearest=True, scale_vals=True)
        validgt_r = spatial(validgt_r, nearest=True)
        mono2 = spatial(mono2)
        mono3 = spatial(mono3)

        # --- horizontal flip with view swap (reference :119-139) --------
        if self.do_flip and r.random() < 0.5:
            im2, im3 = im3[:, ::-1], im2[:, ::-1]
            gt, gt_r = gt_r[:, ::-1], gt[:, ::-1]
            validgt, validgt_r = validgt_r[:, ::-1], validgt[:, ::-1]
            if mono2 is not None:
                mono2, mono3 = mono3[:, ::-1], mono2[:, ::-1]

        # --- vertical flip ----------------------------------------------
        if self.do_flip and r.random() < self.vflip_prob:
            flip = lambda a: None if a is None else a[::-1]
            im2, im3, gt, validgt, gt_r, validgt_r = map(flip, (im2, im3, gt, validgt, gt_r, validgt_r))
            mono2, mono3 = flip(mono2), flip(mono3)

        # --- random crop -------------------------------------------------
        nh, nw = im2.shape[:2]
        y0 = r.integers(0, max(nh - ch, 0) + 1)
        x0 = r.integers(0, max(nw - cw, 0) + 1)
        crop = lambda a: None if a is None else np.ascontiguousarray(a[y0 : y0 + ch, x0 : x0 + cw])
        im2, im3, gt, validgt, gt_r, validgt_r = map(crop, (im2, im3, gt, validgt, gt_r, validgt_r))
        mono2, mono3 = crop(mono2), crop(mono3)

        # --- photometric on the _aug copies ------------------------------
        if r.random() < self.asymmetric_prob:
            im2_aug, im3_aug = self._jitter(im2), self._jitter(im3)
        else:
            # symmetric: same transform for both views via a shared substream
            state = self.rng.bit_generator.state
            im2_aug = self._jitter(im2)
            self.rng.bit_generator.state = state
            im3_aug = self._jitter(im3)

        out = {
            "im2": im2 / 255.0,
            "im3": im3 / 255.0,
            "im2_aug": im2_aug / 255.0,
            "im3_aug": im3_aug / 255.0,
            "gt": gt,
            "validgt": validgt,
            "gt_right": gt_r,
            "validgt_right": validgt_r,
        }
        if mono2 is not None:
            out["im2_mono"] = mono2
            out["im3_mono"] = mono3
        return out
