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


def embed_2d(features: np.ndarray, max_points: int = 5000, seed: int = 0):
    """2-D projection for feature-map plots: exact t-SNE (sklearn) when
    available, PCA otherwise (the reference uses openTSNE, vis.ipynb cells
    12-31; not installed here)."""
    rng = np.random.default_rng(seed)
    idx = np.arange(len(features))
    if len(idx) > max_points:
        idx = rng.choice(idx, max_points, replace=False)
    x = features[idx].astype(np.float64)
    try:
        from sklearn.manifold import TSNE
        emb = TSNE(n_components=2, init="pca", random_state=seed,
                   perplexity=min(30.0, max(5.0, len(x) / 100))
                   ).fit_transform(x)
    except Exception:
        x = x - x.mean(0)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        emb = x @ vt[:2].T
    return emb, idx


def feature_maps(model, params, features):
    """Patch features before/after re-embedding (reference vis.ipynb cells
    12-31): 'before' = patch embeddings entering the RRT encoder (the
    1024->512 projection + activation), 'after' = the encoder's re-embedded
    tokens.  Returns (before (N, 512), after (N, 512))."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rrtmil_tpu.models.rrt import RRTEncoder

    cfg = model.cfg
    x = jnp.asarray(features)[None]
    n = x.shape[1]
    emb = nn.Dense(512, name="patch_to_emb")
    h = emb.apply({"params": params["patch_to_emb"]}, x)
    if cfg.act == "relu":
        h = jax.nn.relu(h)
    elif cfg.act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    enc = RRTEncoder(cfg.encoder)
    after = enc.apply({"params": params["online_encoder"]}, h,
                      deterministic=True)
    return np.asarray(h[0]), np.asarray(after[0])


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

    from rrtmil_tpu.utils.platform import apply_platform_env
    apply_platform_env()
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

    # before/after re-embedding feature maps + 2-D embeddings
    # (reference vis.ipynb cells 12-31)
    before, after = feature_maps(model, params, features)
    emb_before, idx = embed_2d(before)
    emb_after, _ = embed_2d(after[idx] if len(idx) < len(after) else after)
    fm = {"features_before": before, "features_after": after,
          "embedding_before": emb_before, "embedding_after": emb_after,
          "embedding_index": idx}
    if "patch_labels" in payload:
        fm["patch_labels"] = payload["patch_labels"]
    np.savez(os.path.join(args.out, "feature_maps.npz"), **fm)
    print(f"wrote {args.out}/feature_maps.npz (before/after re-embedding, "
          f"{len(idx)} points embedded)")


if __name__ == "__main__":
    main()
