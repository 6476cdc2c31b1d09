"""DSMIL: dual-stream MIL (reference modules/dsmil.py:59-135).

Instance stream: per-patch classifier; bag stream: critical-instance query
attention + a Conv1d(C, C, kernel=512) head mixing class channels.  The
training forward also returns the max-pooled instance logits so the harness
can add the `max_loss` aux term (main.py:445-447,452-457 with 0.5/0.5
weights).  In this framework the model returns the raw max-instance logits
and the Engine computes the aux loss (no criterion threading into forward).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import RRTEncoderConfig
from ..utils.inits import xavier_normal, zeros
from .abmil import _act
from .pool import masked_softmax


class BClassifier(nn.Module):
    """Bag stream (dsmil.py:59-94): queries vs. critical-instance queries,
    softmax over instances, per-class bag embedding, conv head."""

    n_classes: int = 2

    @nn.compact
    def __call__(self, feats, c, mask=None):
        # feats: (N, 512), c: (N, C) instance logits
        v = feats                                     # passing_v=False
        q_dense = nn.Dense(128, kernel_init=xavier_normal, bias_init=zeros,
                           name="q")
        q = q_dense(feats)                            # (N, 128)
        cm = c if mask is None else jnp.where(mask[:, None], c,
                                              jnp.finfo(c.dtype).min)
        crit_idx = jnp.argmax(cm, axis=0)             # (C,) critical instances
        m_feats = jnp.take(feats, crit_idx, axis=0)   # (C, 512)
        q_max = q_dense(m_feats)                      # shared weights
        a = q @ q_max.T                               # (N, C)
        a = masked_softmax(a / jnp.sqrt(jnp.float32(q.shape[1])),
                           None if mask is None else mask[:, None], axis=0)
        b = a.T @ v                                   # (C, 512)
        # Conv1d(C, C, kernel=512) over (1, C, 512) -> (1, C, 1): a full
        # bilinear mixing of (class, feature) -> class (dsmil.py:76,92).
        # torch Conv1d DEFAULT init: dsmil's initialize_weights covers only
        # Conv2d/Linear/LayerNorm (dsmil.py:5-18), so fcc keeps
        # kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) on BOTH weight
        # and bias, fan_in = in_channels * kernel_size = n_classes * 512
        from ..utils.inits import uniform_bound
        fcc_bound = 1.0 / (self.n_classes * 512) ** 0.5
        w = self.param("fcc_kernel", uniform_bound(fcc_bound),
                       (self.n_classes, self.n_classes, 512))
        bias = self.param("fcc_bias", uniform_bound(fcc_bound),
                          (self.n_classes,))
        logits = jnp.einsum("cv,ocv->o", b, w) + bias
        return logits[None], a, b                     # (1, C)


class DSMIL(nn.Module):
    """MILNet (dsmil.py:96-135).  Train: (bag_logits, max_inst_logits, ps);
    eval: (bag_logits, max_inst_logits)."""

    input_dim: int = 1024
    n_classes: int = 2
    act: str = "relu"
    dropout: float = 0.25
    rrt: Optional[RRTEncoderConfig] = None

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True):
        if x.ndim == 3:
            x, mask_row = x[0], (None if mask is None else mask[0])
        else:
            mask_row = mask
        ps = x.shape[0]
        h = nn.Dense(512, kernel_init=xavier_normal, bias_init=zeros,
                     name="patch_to_emb")(x)
        h = _act(self.act)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if mask_row is not None:
            h = h * mask_row[:, None].astype(h.dtype)

        hr = h
        if self.rrt is not None:
            from .rrt import RRTEncoder
            hr = RRTEncoder(self.rrt, name="rrt")(
                h[None], mask=None if mask_row is None else mask_row[None],
                length=length, deterministic=deterministic)[0]

        classes = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                           bias_init=zeros, name="i_classifier")(hr)  # (N, C)
        bag_logits, a, b = BClassifier(self.n_classes, name="b_classifier")(
            h, classes, mask_row)

        cm = classes if mask_row is None else jnp.where(
            mask_row[:, None], classes, jnp.finfo(classes.dtype).min)
        max_inst = jnp.max(cm, axis=0)[None]          # (1, C)
        return bag_logits, max_inst, ps


def load_warm_start(params, path: str):
    """Non-strict warm-start from the reference's shipped dsmil_init.pth
    (main.py:215-218, modules/init_ckp/).  The checkpoint carries only
    b_classifier.q.{weight,bias} plus b_classifier.v.1.* keys that don't
    exist in the passing_v=False model (dropped by strict=False) -- so this
    overrides exactly the q projection.  Accepts the torch .pth directly
    (torch is an optional dep) or an .npz produced by
    tools/convert_dsmil_init.py for torch-free environments."""
    import numpy as np
    if path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        sd = {k: v.numpy() for k, v in torch.load(
            path, map_location="cpu", weights_only=True).items()}
    out = dict(params)
    bc = dict(out["b_classifier"])
    q = dict(bc["q"])
    if "b_classifier.q.weight" in sd:
        q["kernel"] = jnp.asarray(np.asarray(sd["b_classifier.q.weight"]).T)
    if "b_classifier.q.bias" in sd:
        q["bias"] = jnp.asarray(sd["b_classifier.q.bias"])
    bc["q"] = q
    out["b_classifier"] = bc
    return out
