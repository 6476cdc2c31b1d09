"""IBMIL confounder pipeline: PCA-whiten + k-means prototypes, end-to-end
with a trained AB-MIL (reference Survival/models/IBMIL/clustering.py)."""
import numpy as np

import jax

from rrtmil_tpu.data.confounders import (build_confounders,
                                         extract_bag_features, kmeans,
                                         pca_whiten)
from rrtmil_tpu.data.datasets import ArrayDataset
from rrtmil_tpu.models.abmil import ABMIL
from rrtmil_tpu.models.ibmil import IBMIL


def test_pca_whiten_properties():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 32)) @ rng.normal(size=(32, 32))
    w = pca_whiten(x)
    norms = np.linalg.norm(w, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)   # L2-normalized


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 16)) * 5
    x = np.concatenate([c + rng.normal(size=(50, 16)) * 0.3 for c in centers])
    protos = np.asarray(kmeans(x, 4, seed=1))
    # every true center has a nearby prototype
    d = np.linalg.norm(centers[:, None] - protos[None], axis=-1).min(axis=1)
    assert (d < 1.0).all(), d


def test_full_ibmil_pipeline():
    rng = np.random.default_rng(0)
    bags = [rng.normal(size=(60, 32)).astype(np.float32) for _ in range(10)]
    ds = ArrayDataset(bags, [i % 2 for i in range(10)])
    abmil = ABMIL(input_dim=32, n_classes=2, dropout=0.0)
    params = abmil.init({"params": jax.random.PRNGKey(0)},
                        np.zeros((1, 60, 32), np.float32),
                        deterministic=True)["params"]
    feats = extract_bag_features(abmil, params, ds)
    assert feats.shape == (10, 512)
    protos = build_confounders(feats, k=4, seed=0)
    assert protos.shape == (4, 512) and np.isfinite(protos).all()

    conf = tuple(tuple(float(v) for v in row) for row in protos)
    model = IBMIL(input_dim=32, n_classes=2, confounders=conf)
    p = model.init({"params": jax.random.PRNGKey(1)},
                   np.zeros((1, 60, 32), np.float32),
                   deterministic=True)["params"]
    logits = model.apply({"params": p}, bags[0][None], deterministic=True)
    assert np.isfinite(np.asarray(logits)).all()
