"""Mean/Max MIL baselines (reference modules/mean_max.py).

Note: the reference's MaxMIL hardcodes Linear(1024, 512) regardless of
input_dim (mean_max.py:60) -- an evident bug that crashes for PLIP features;
here input_dim is honored for both."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import RRTEncoderConfig
from ..utils.inits import xavier_normal, zeros
from .abmil import FeatureHead


class MeanMIL(nn.Module):
    """fc -> act -> dropout [-> rrt] -> Linear -> masked mean over instances
    (mean_max.py:25-52)."""

    input_dim: int = 1024
    n_classes: int = 2
    act: str = "relu"
    dropout: float = 0.25
    rrt: Optional[RRTEncoderConfig] = None

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True):
        if x.ndim == 2:
            x = x[None]
        h = FeatureHead(self.input_dim, self.act, self.dropout, self.rrt,
                        name="head")(x, mask, length, deterministic)
        h = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                     bias_init=zeros, name="classifier")(h)
        if mask is None:
            return jnp.mean(h, axis=1)
        m = mask[..., None].astype(h.dtype)
        return jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class MaxMIL(nn.Module):
    """Same stem, masked max over instances (mean_max.py:56-79)."""

    input_dim: int = 1024
    n_classes: int = 2
    act: str = "relu"
    dropout: float = 0.25
    rrt: Optional[RRTEncoderConfig] = None

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True):
        if x.ndim == 2:
            x = x[None]
        h = FeatureHead(self.input_dim, self.act, self.dropout, self.rrt,
                        name="head")(x, mask, length, deterministic)
        h = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                     bias_init=zeros, name="classifier")(h)
        if mask is not None:
            h = jnp.where(mask[..., None], h, jnp.finfo(h.dtype).min)
        return jnp.max(h, axis=1)
