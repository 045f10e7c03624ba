"""Per-dataset tile presets for high-resolution tile-parallel inference.

The analog of the reference's TILE_PRESETS (reference tile_presets.py:37-127),
reshaped for ROW tiling (full width per tile — see parallel/tiles.py for why
row tiles dominate the reference's 2-D tiles on TPU) plus an HBM-driven
auto-selector replacing the VRAM heuristic (reference memory_utils.py:34-57).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TilePreset:
    """n_tiles row bands with `overlap` rows of sin^2-blended overlap."""

    n_tiles: int
    overlap: int
    iscale: float = 1.0

    def __post_init__(self):
        if self.overlap % 32 != 0:
            raise ValueError("overlap must be a multiple of 32 (model stride)")


# Tuned per benchmark resolution (heights: kitti 375, middlebury 2014 ~2000,
# booster 3008x4112, monotrap 480).
TILE_PRESETS: dict[str, TilePreset] = {
    "default": TilePreset(n_tiles=2, overlap=64),
    "kitti2012": TilePreset(n_tiles=1, overlap=0),
    "kitti2015": TilePreset(n_tiles=1, overlap=0),
    "eth3d": TilePreset(n_tiles=1, overlap=0),
    "middlebury": TilePreset(n_tiles=4, overlap=128),
    "middlebury2021": TilePreset(n_tiles=2, overlap=96),
    "booster": TilePreset(n_tiles=8, overlap=160),
    "layeredflow": TilePreset(n_tiles=2, overlap=64),
    "monotrap": TilePreset(n_tiles=1, overlap=0),
}


def get_preset_for_dataset(name: str) -> TilePreset:
    """Name-mapped preset fetch (reference tile_presets.py:168-204)."""
    key = name.lower()
    for candidate in (key, key.split("_")[0]):
        if candidate in TILE_PRESETS:
            return TILE_PRESETS[candidate]
    return TILE_PRESETS["default"]


def select_tiling_parameters(
    image_h: int,
    image_w: int,
    hbm_bytes_free: int | None = None,
    n_devices: int = 1,
    bytes_per_pixel_budget: float = 2800.0,
) -> TilePreset:
    """HBM-driven auto-tiling (replaces reference select_tiling_parameters,
    memory_utils.py:34-57).

    The dominant allocation is the pair of (H/4, W/4, W/4) volumes plus
    hourglass activations ~ O(H * W^2 / 16); `bytes_per_pixel_budget` is the
    empirical bytes per input pixel at W~1024.  Chooses the smallest tile
    count whose per-tile footprint fits.
    """
    if hbm_bytes_free is None:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            hbm_bytes_free = stats.get("bytes_limit", 16 << 30) - stats.get(
                "bytes_in_use", 0
            )
        except Exception:
            hbm_bytes_free = 12 << 30

    # scale the per-pixel budget by the W^2 volume growth relative to W=1024
    per_pixel = bytes_per_pixel_budget * max((image_w / 1024.0) ** 2, 0.25)
    total = image_h * image_w * per_pixel
    n = 1
    while total / n > hbm_bytes_free * 0.8 and n < 64:
        n *= 2
    n = max(n, n_devices) if n > 1 else n
    return TilePreset(n_tiles=n, overlap=64 if n > 1 else 0)
