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


# Two-category palette for tumor/normal points: a blue/orange pair with
# strong deuteranopia/protanopia separation; attention magnitude uses the
# perceptually-uniform, CVD-safe viridis ramp.  Identity is never encoded
# by color alone (legend + marker shape differ).
_CAT2 = ("#3b6fb5", "#e08214")


def render_figures(out_dir: str, attention: np.ndarray,
                   emb_before: np.ndarray, emb_after: np.ndarray,
                   emb_index: np.ndarray,
                   patch_labels=None) -> bool:
    """Render the reference vis.ipynb figures as PNGs (cells 12-31: the
    before/after re-embedding t-SNE feature maps; cells 4-10: attention
    vs lesion labels).  Returns False (with a note) when matplotlib is
    unavailable -- the .npz artifacts always carry the underlying data."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable -- skipping PNG rendering "
              "(the .npz artifacts contain the projected embeddings)")
        return False

    attn = np.asarray(attention).reshape(-1)
    sub_attn = attn[emb_index] if len(emb_index) < len(attn) else attn
    labels = (None if patch_labels is None
              else np.asarray(patch_labels).reshape(-1)[emb_index])

    fig, axes = plt.subplots(1, 2, figsize=(11, 5), constrained_layout=True)
    for ax, emb, title in ((axes[0], emb_before, "before re-embedding"),
                           (axes[1], emb_after, "after re-embedding")):
        if labels is not None:
            for val, name, color, marker in ((0, "normal", _CAT2[0], "o"),
                                             (1, "tumor", _CAT2[1], "^")):
                m = labels == val
                ax.scatter(emb[m, 0], emb[m, 1], s=6, alpha=0.6,
                           c=color, marker=marker, label=name,
                           linewidths=0)
            ax.legend(frameon=False, markerscale=2)
        else:
            sc = ax.scatter(emb[:, 0], emb[:, 1], s=6, alpha=0.7,
                            c=sub_attn, cmap="viridis", linewidths=0)
        ax.set_title(title)
        ax.set_xticks([])
        ax.set_yticks([])
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    if labels is None:
        fig.colorbar(sc, ax=axes, shrink=0.8, label="attention weight")
    fig.suptitle("patch feature map, 2-D projection")
    p1 = os.path.join(out_dir, "feature_maps.png")
    fig.savefig(p1, dpi=150)
    plt.close(fig)
    print(f"wrote {p1}")

    fig, ax = plt.subplots(figsize=(7, 4.5), constrained_layout=True)
    order = np.argsort(attn)[::-1]
    ranks = np.arange(1, len(attn) + 1)
    if patch_labels is not None:
        lab = np.asarray(patch_labels).reshape(-1)[order]
        for val, name, color, marker in ((0, "normal", _CAT2[0], "o"),
                                         (1, "tumor", _CAT2[1], "^")):
            m = lab == val
            ax.scatter(ranks[m], attn[order][m], s=8, alpha=0.6, c=color,
                       marker=marker, label=name, linewidths=0)
        ax.legend(frameon=False, markerscale=2)
        ax.set_title("attention rank vs lesion annotation")
    else:
        ax.scatter(ranks, attn[order], s=8, alpha=0.6, c=_CAT2[0],
                   linewidths=0)
        ax.set_title("attention distribution (rank order)")
    ax.set_yscale("log")
    ax.set_xlabel("patch rank by attention")
    ax.set_ylabel("attention weight")
    ax.grid(True, alpha=0.2)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    p2 = os.path.join(out_dir, "attention_scatter.png")
    fig.savefig(p2, dpi=150)
    plt.close(fig)
    print(f"wrote {p2}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", required=True)
    ap.add_argument("--params", required=True)
    ap.add_argument("--config", default="c16_r50")
    ap.add_argument("--annotations", default=None,
                    help="Camelyon16 lesion XML (optional)")
    ap.add_argument("--coords", default=None,
                    help=".npy of patch (x, y) coordinates (optional)")
    ap.add_argument("--plot", action="store_true",
                    help="also render PNG figures (matplotlib; falls back "
                         "to npz-only with a note when unavailable)")
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

    if args.plot:
        render_figures(args.out, payload["attention"], emb_before,
                       emb_after, idx, payload.get("patch_labels"))


if __name__ == "__main__":
    main()
