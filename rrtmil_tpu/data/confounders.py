"""IBMIL confounder pipeline: bag features -> PCA-whiten -> k-means
prototypes (reference Survival/models/IBMIL/clustering.py + Clustering.sh).

The reference uses faiss (GPU PCA + k-means, clustering.py:17-82); the data
is tiny (hundreds..thousands of 512-d bag embeddings), so this is plain
JAX/numpy: exact PCA via eigendecomposition with faiss-style whitening, and
k-means++ initialization + Lloyd iterations under jit.

Offline flow (reference Clustering.sh):
  1. train an AB-MIL model;
  2. `extract_bag_features` over the training split (pooled 512-d feature
     per bag);
  3. `build_confounders` -> (k, 512) prototypes saved as .npy;
  4. feed to models.ibmil.IBMIL via `confounders=...`
     (train_bag_cls_agnostic_feats_proto_{k}.npy in the reference,
     main.py:197-202).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def pca_whiten(x: np.ndarray, dim_out: Optional[int] = None,
               eps: float = 1e-5) -> np.ndarray:
    """PCA with whitening + L2 normalization (clustering.py:17-47 `reduce`:
    faiss.PCAMatrix(d, d, -0.5) then row-normalize)."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / max(len(x) - 1, 1)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(-eigval)
    eigval, eigvec = eigval[order], eigvec[:, order]
    if dim_out is not None:
        eigval, eigvec = eigval[:dim_out], eigvec[:, :dim_out]
    # faiss eigen_power = -0.5: whiten
    w = eigvec * np.power(np.maximum(eigval, eps), -0.5)[None, :]
    out = xc @ w
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(norms, 1e-12)).astype(np.float32)


def kmeans(x: jnp.ndarray, k: int, n_iter: int = 20,
           seed: int = 0) -> jnp.ndarray:
    """k-means++ init + Lloyd iterations; returns (k, D) centroids."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)

    # k-means++ seeding
    key, sub = jax.random.split(key)
    idx0 = jax.random.randint(sub, (), 0, n)
    centroids = jnp.zeros((k, d)).at[0].set(x[idx0])
    min_d2 = jnp.sum((x - centroids[0]) ** 2, axis=1)
    for i in range(1, k):
        key, sub = jax.random.split(key)
        probs = min_d2 / jnp.maximum(jnp.sum(min_d2), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        centroids = centroids.at[i].set(x[idx])
        min_d2 = jnp.minimum(min_d2, jnp.sum((x - centroids[i]) ** 2, axis=1))

    @jax.jit
    def lloyd(centroids):
        def body(_, c):
            d2 = (jnp.sum(x * x, 1)[:, None] - 2 * x @ c.T
                  + jnp.sum(c * c, 1)[None, :])
            assign = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)   # (n, k)
            counts = jnp.maximum(onehot.sum(axis=0), 1.0)
            return (onehot.T @ x) / counts[:, None]
        return jax.lax.fori_loop(0, n_iter, body, centroids)

    return lloyd(centroids)


def extract_bag_features(model, params, dataset, indices=None) -> np.ndarray:
    """Pooled 512-d bag embedding per training bag (the reference extracts
    these from a trained AB-MIL, Survival/models/IBMIL/clustering.py via
    Clustering.sh).  `model` must support `return_pooled=True`
    (models/abmil.ABMIL does).

    Bags are padded to power-of-two buckets with a token mask (masked
    pooling is exact), bounding XLA compiles to O(log max_len) instead of
    one per distinct bag length."""
    @partial(jax.jit, static_argnames=("n",))
    def pooled_fn(p, x, mask, n: int):
        _, pooled = model.apply({"params": p}, x, mask=mask,
                                deterministic=True, return_pooled=True)
        return pooled

    feats = []
    indices = range(len(dataset)) if indices is None else indices
    for i in indices:
        bag, _ = dataset[i]
        bag = np.asarray(bag, np.float32)
        n = 1 << max(6, (bag.shape[0] - 1).bit_length())
        x = np.zeros((1, n, bag.shape[1]), np.float32)
        x[0, :bag.shape[0]] = bag
        mask = np.zeros((1, n), bool)
        mask[0, :bag.shape[0]] = True
        pooled = pooled_fn(params, jnp.asarray(x), jnp.asarray(mask), n)
        feats.append(np.asarray(pooled)[0])
    return np.stack(feats)


def build_confounders(bag_feats: np.ndarray, k: int = 8, whiten: bool = True,
                      seed: int = 0) -> np.ndarray:
    """Full pipeline: (N, 512) bag features -> (k, 512) prototypes.

    NOTE (mirrors the reference): clustering.py clusters the PCA-whitened
    features but saves centroids computed in the ORIGINAL feature space by
    averaging the member bags of each cluster (clustering.py:107-134), so
    prototypes live in model-feature space."""
    x = pca_whiten(bag_feats) if whiten else bag_feats
    centroids_w = np.asarray(kmeans(jnp.asarray(x), k, seed=seed))
    # assign in whitened space, average in original space
    d2 = ((x[:, None, :] - centroids_w[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(axis=1)
    protos = np.zeros((k, bag_feats.shape[1]), np.float32)
    for c in range(k):
        members = bag_feats[assign == c]
        protos[c] = members.mean(axis=0) if len(members) else 0.0
    return protos
