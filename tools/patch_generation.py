"""WSI patch generation: tissue masking + stride-grid patch cropping.

Equivalent of reference DTFD/Patch_Generation/
gen_patch_noLabel_stride_MultiProcessing_multiScales.py: Otsu tissue mask on
a low-resolution overview, stride-grid crop coordinates at multiple scales,
multiprocessing fan-out over slides.

openslide is not part of the TPU image; slide reading is import-gated.  The
mask/grid logic is pure numpy (self-contained Otsu threshold, no OpenCV) and
unit-testable without slides; with openslide installed this script writes
per-slide patch PNGs or coordinate .npy files ready for feature extraction.

Usage:
    python tools/patch_generation.py --slide_dir /data/wsi --out /data/patches \
        --patch_size 256 --level 1 --coords_only
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
from typing import List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def otsu_threshold(gray: np.ndarray) -> float:
    """Otsu's method on a uint8 image (replaces cv2.threshold+THRESH_OTSU)."""
    hist = np.bincount(gray.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    omega = np.cumsum(hist) / total                # class-0 probability
    mu = np.cumsum(hist * np.arange(256)) / total  # class-0 mean * omega
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1 - omega))
    sigma_b[~np.isfinite(sigma_b)] = 0.0
    return float(np.argmax(sigma_b))


def tissue_mask(rgb: np.ndarray, sat_min: int = 0) -> np.ndarray:
    """Boolean tissue mask from an RGB overview: Otsu on the saturation
    channel (the reference thresholds HSV saturation)."""
    rgb = rgb.astype(np.float32)
    mx = rgb.max(axis=-1)
    mn = rgb.min(axis=-1)
    sat = np.where(mx > 0, (mx - mn) / np.maximum(mx, 1e-6), 0.0)
    sat_u8 = (sat * 255).astype(np.uint8)
    thr = max(otsu_threshold(sat_u8), sat_min)
    return sat_u8 > thr


def grid_coordinates(mask: np.ndarray, patch_px: int, stride_px: int,
                     downsample: float, min_tissue_frac: float = 0.25
                     ) -> List[Tuple[int, int]]:
    """Level-0 (x, y) coordinates of stride-grid patches whose mask window
    has at least `min_tissue_frac` tissue."""
    mh, mw = mask.shape
    win = max(int(round(patch_px / downsample)), 1)
    step = max(int(round(stride_px / downsample)), 1)
    # summed-area table for O(1) window sums
    sat = np.pad(mask.astype(np.int64), ((1, 0), (1, 0))).cumsum(0).cumsum(1)
    coords = []
    for my in range(0, mh - win + 1, step):
        for mx in range(0, mw - win + 1, step):
            s = (sat[my + win, mx + win] - sat[my, mx + win]
                 - sat[my + win, mx] + sat[my, mx])
            if s >= min_tissue_frac * win * win:
                coords.append((int(mx * downsample), int(my * downsample)))
    return coords


def process_slide(args_tuple):
    """Worker: one slide -> coordinate file (and optional patch crops)."""
    slide_path, out_dir, patch_size, stride, level, coords_only = args_tuple
    try:
        import openslide
    except ImportError:
        raise SystemExit(
            "openslide is required for slide IO; install openslide-python "
            "(mask/grid logic is importable without it)")

    slide = openslide.OpenSlide(slide_path)
    # low-res overview for masking
    ov_level = slide.get_best_level_for_downsample(64)
    ov = np.asarray(slide.read_region(
        (0, 0), ov_level, slide.level_dimensions[ov_level]).convert("RGB"))
    mask = tissue_mask(ov)
    downsample = slide.level_downsamples[ov_level]
    scale = slide.level_downsamples[level]
    coords = grid_coordinates(mask, int(patch_size * scale),
                              int(stride * scale), downsample)

    name = os.path.splitext(os.path.basename(slide_path))[0]
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"{name}_coords.npy"),
            np.asarray(coords, np.int64))
    if not coords_only:
        patch_dir = os.path.join(out_dir, name)
        os.makedirs(patch_dir, exist_ok=True)
        for i, (x, y) in enumerate(coords):
            img = slide.read_region((x, y), level,
                                    (patch_size, patch_size)).convert("RGB")
            img.save(os.path.join(patch_dir, f"{i}_{x}_{y}.png"))
    return name, len(coords)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slide_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--coords_only", action="store_true")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    exts = (".svs", ".tif", ".tiff", ".ndpi", ".mrxs")
    slides = [os.path.join(args.slide_dir, f)
              for f in sorted(os.listdir(args.slide_dir))
              if f.lower().endswith(exts)]
    jobs = [(s, args.out, args.patch_size, args.stride, args.level,
             args.coords_only) for s in slides]
    with mp.Pool(args.workers) as pool:
        for name, n in pool.imap_unordered(process_slide, jobs):
            print(f"{name}: {n} patches")


if __name__ == "__main__":
    main()
