"""DTFD: double-tier feature distillation MIL (reference
Survival/models/DTFD/network.py:146-280).

Tier 1 splits the bag into `group` pseudo-bags (sequential np.array_split
chunks, :165-168), runs dimReduction -> gated attention -> pooled classifier
per pseudo-bag, and distills MaxMinS/MaxS/AFS instance features via the
CAM-style per-instance logits (:192-210).  Tier 2 classifies the distilled
features with an attention classifier.

The reference hides an optimization inside `forward`
(`loss0.backward(retain_graph=True)`, :217-219) whose optimizer0 is NEVER
stepped in the survival variant -- the gradients simply accumulate and the
engine's single outer Adam applies grad(loss0) + grad(loss_outer).  In JAX
this becomes the explicit surrogate `total = loss0 + loss_outer` under one
optimizer: mathematically the identical update (harness/survival.py
DTFDSurvivalEngine).

Static shapes: the pseudo-bag chunking is computed in Python from the static
`length`, so each chunk is a static slice; bucket padding is handled by
masking each chunk's softmaxes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.inits import xavier_normal, zeros
from .pool import masked_softmax


def pseudo_bag_slices(length: int, group: int):
    """np.array_split boundaries over range(length) (network.py:165-168)."""
    sizes = np.full(group, length // group)
    sizes[: length % group] += 1
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(group)]


class _GatedAttention(nn.Module):
    """V/U gated attention scorer (network.py:108-143).  Returns RAW scores
    (N,); callers softmax with their own masking."""

    d: int = 128

    @nn.compact
    def __call__(self, x):
        av = jnp.tanh(nn.Dense(self.d, kernel_init=xavier_normal,
                               bias_init=zeros, name="attention_V")(x))
        au = nn.sigmoid(nn.Dense(self.d, kernel_init=xavier_normal,
                                 bias_init=zeros, name="attention_U")(x))
        a = nn.Dense(1, kernel_init=xavier_normal, bias_init=zeros,
                     name="attention_weights")(av * au)
        return a[:, 0]


def _masked_softmax_1d(scores, mask):
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    return jax.nn.softmax(scores, axis=0)


class DTFD(nn.Module):
    """Survival DTFD (hazards/S outputs) and, with `survival=False`, the
    standalone classification DTFD of reference DTFD/main.py:419-551
    (logits outputs, `instance_per_group` distilled instances per
    pseudo-bag = total_instance // numGroup, DTFD/main.py:429,498-500)."""

    input_dim: int = 1024
    inner_dim: int = 512
    n_classes: int = 4
    group: int = 8
    distill: str = "MaxMinS"             # 'MaxMinS' | 'MaxS' | 'AFS'
    survival: bool = True
    instance_per_group: int = 1

    @nn.compact
    def __call__(self, x, mask=None, length: Optional[int] = None,
                 labels=None, deterministic: bool = True,
                 train: bool = False, eval_perm=None):
        """x: (1, N, D) or (N, D).  Train returns
        (pseudo_hazards (G,K), pseudo_S (G,K), hazards (1,K), S (1,K));
        eval returns (hazards, S).  `eval_perm`: the reference shuffles
        instance indices before eval chunking (network.py:231-233); pass a
        permutation of range(length) to reproduce, else identity is used.
        """
        if x.ndim == 3:
            x, mask = x[0], (None if mask is None else mask[0])
        n = x.shape[0] if length is None else length
        x = x[:n]
        mask = None if mask is None else mask[:n]

        # shared submodules / params (created once; reused per pseudo-bag)
        dim_fc = nn.Dense(self.inner_dim, use_bias=False,
                          kernel_init=xavier_normal, name="dim_fc1")
        dim_drop = nn.Dropout(0.25)
        attn = _GatedAttention(name="attention")
        w_clf = self.param("classifier_kernel", xavier_normal,
                           (self.inner_dim, self.n_classes))
        b_clf = self.param("classifier_bias", zeros, (self.n_classes,))
        clf_drop = nn.Dropout(0.25)
        u_attn = _GatedAttention(name="u_attention")
        u_drop = nn.Dropout(0.25)
        u_fc = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                        bias_init=zeros, name="u_classifier_fc")

        def dim_reduce(sub):
            h = nn.relu(dim_fc(sub))
            return dim_drop(h, deterministic=deterministic)

        def classify(feat):
            return clf_drop(feat, deterministic=deterministic) @ w_clf + b_clf

        def u_classify(feats):
            a = jax.nn.softmax(u_attn(feats), axis=0)
            pooled = (a[None, :] @ feats)
            pooled = u_drop(pooled, deterministic=deterministic)
            return u_fc(pooled)

        def distill(att_feats, mid, pooled, sub_mask):
            """CAM-style ranking by the tier-1 classifier weight
            (network.py:192-210; top/bottom instance_per_group as in
            DTFD/main.py:498-500)."""
            kq = self.instance_per_group
            inst_logits = att_feats @ w_clf              # (n_c, K)
            p_last = jax.nn.softmax(inst_logits, axis=1)[:, -1]
            if sub_mask is not None:
                p_max = jnp.where(sub_mask, p_last, -jnp.inf)
                p_min = jnp.where(sub_mask, p_last, jnp.inf)
            else:
                p_max = p_min = p_last
            i_max = jax.lax.top_k(p_max, kq)[1]
            i_min = jax.lax.top_k(-p_min, kq)[1]
            if self.distill == "MaxMinS":
                return jnp.concatenate(
                    [jnp.take(mid, i_max, axis=0),
                     jnp.take(mid, i_min, axis=0)], axis=0)
            if self.distill == "MaxS":
                return jnp.take(mid, i_max, axis=0)
            return pooled                                 # 'AFS'

        chunks = pseudo_bag_slices(n, self.group)

        if train:
            pseudo_logits, distilled = [], []
            for lo, hi in chunks:
                sub = x[lo:hi]
                sub_mask = None if mask is None else mask[lo:hi]
                mid = dim_reduce(sub)
                a = _masked_softmax_1d(attn(mid), sub_mask)   # (n_c,)
                att_feats = mid * a[:, None]
                pooled = jnp.sum(att_feats, axis=0, keepdims=True)
                pseudo_logits.append(classify(pooled))
                distilled.append(distill(att_feats, mid, pooled, sub_mask))
            pseudo_logits = jnp.concatenate(pseudo_logits, axis=0)  # (G, K)
            feats = jnp.concatenate(distilled, axis=0)
            logits = u_classify(feats)
            if not self.survival:
                return pseudo_logits, logits
            pseudo_hazards = nn.sigmoid(pseudo_logits)
            pseudo_s = jnp.cumprod(1 - pseudo_hazards, axis=1)
            hazards = nn.sigmoid(logits)
            return (pseudo_hazards, pseudo_s, hazards,
                    jnp.cumprod(1 - hazards, axis=1))

        # eval path (network.py:226-271): global raw attention, (optionally
        # shuffled) chunking, per-chunk softmax
        mid = dim_reduce(x)
        raw_a = attn(mid)                                  # (N,)
        perm = jnp.arange(n) if eval_perm is None else jnp.asarray(eval_perm)
        distilled = []
        for lo, hi in chunks:
            idx = perm[lo:hi]
            tmid = jnp.take(mid, idx, axis=0)
            ta = jnp.take(raw_a, idx, axis=0)
            tmask = None if mask is None else jnp.take(mask, idx, axis=0)
            ta = _masked_softmax_1d(ta, tmask)
            att_feats = tmid * ta[:, None]
            pooled = jnp.sum(att_feats, axis=0, keepdims=True)
            distilled.append(distill(att_feats, tmid, pooled, tmask))
        feats = jnp.concatenate(distilled, axis=0)
        logits = u_classify(feats)
        if not self.survival:
            return logits
        hazards = nn.sigmoid(logits)
        return hazards, jnp.cumprod(1 - hazards, axis=1)
