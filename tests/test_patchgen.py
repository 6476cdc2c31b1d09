"""Patch-generation mask/grid logic (openslide-free parts)."""
import numpy as np
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from patch_generation import grid_coordinates, otsu_threshold, tissue_mask


def test_otsu_bimodal():
    rng = np.random.default_rng(0)
    img = np.concatenate([rng.normal(50, 5, 5000), rng.normal(200, 5, 5000)])
    img = np.clip(img, 0, 255).astype(np.uint8)
    thr = otsu_threshold(img)
    assert 60 < thr < 190


def test_tissue_mask_and_grid():
    # white background with a colored "tissue" square
    ov = np.full((100, 100, 3), 255, np.uint8)
    ov[20:70, 30:80] = [180, 90, 120]          # saturated region
    mask = tissue_mask(ov)
    assert mask[40, 50] and not mask[5, 5]
    coords = grid_coordinates(mask, patch_px=160, stride_px=160,
                              downsample=16.0)
    assert len(coords) > 0
    # every coordinate maps back inside the tissue block (level-0 scale 16)
    for x, y in coords:
        mx, my = x // 16, y // 16
        assert mask[my:my + 10, mx:mx + 10].mean() > 0.2
