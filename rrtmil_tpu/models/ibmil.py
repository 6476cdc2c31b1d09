"""IBMIL: interventional AB-MIL with confounder deconfounding
(reference modules/attmil_ibmil.py:44-102).

AB-MIL pooling plus a cross-attention of the bag embedding against k-means
confounder prototypes (loaded from the offline clustering pipeline,
data/confounders.py); the attended prototype summary is concatenated before
the head.  `confounders` is a fixed (num_protos, 512) array baked into the
module config (the reference registers it as a buffer).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import RRTEncoderConfig
from ..utils.inits import xavier_normal, zeros
from .abmil import FeatureHead
from .pool import masked_softmax


class IBMIL(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    act: str = "relu"
    dropout: float = 0.25
    rrt: Optional[RRTEncoderConfig] = None
    confounders: Optional[Tuple[Tuple[float, ...], ...]] = None  # hashable
    joint_dim: int = 128
    conf_dropout: float = 0.5   # defined but unused in reference forward

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True):
        if x.ndim == 2:
            x = x[None]
        feat = FeatureHead(self.input_dim, self.act, self.dropout, self.rrt,
                           name="embedding")(x, mask, length, deterministic)
        a = nn.Dense(128, kernel_init=xavier_normal, bias_init=zeros,
                     name="attn_fc1")(feat)
        a = jnp.tanh(a)
        a = nn.Dense(1, kernel_init=xavier_normal, bias_init=zeros,
                     name="attn_fc2")(a)
        a = jnp.swapaxes(a, -1, -2)
        a = masked_softmax(a, None if mask is None else mask[:, None, :])
        m = (a @ feat)[:, 0]                              # (B, 512)

        if self.confounders is not None:
            conf = jnp.asarray(np.asarray(self.confounders, np.float32))
            bag_q = nn.Dense(self.joint_dim, kernel_init=xavier_normal,
                             bias_init=zeros, name="W_q")(m)        # (B, J)
            conf_k = nn.Dense(self.joint_dim, kernel_init=xavier_normal,
                              bias_init=zeros, name="W_k")(conf)    # (P, J)
            # softmax over prototypes (attmil_ibmil.py:96-97)
            da = conf_k @ bag_q.T                                   # (P, B)
            da = nn.softmax(da / jnp.sqrt(jnp.float32(self.joint_dim)),
                            axis=0)
            conf_feats = da.T @ conf                                # (B, 512)
            m = jnp.concatenate([m, conf_feats], axis=1)

        return nn.Dense(self.n_classes, kernel_init=xavier_normal,
                        bias_init=zeros, name="head")(m)
