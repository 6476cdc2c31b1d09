"""AB-MIL baselines: classic attention-MIL with optional injected RRT
encoder (reference modules/attmil.py:55-158).

All zoo models share the signature
    __call__(x, mask=None, length=None, labels=None, deterministic=True)
returning logits (B, C); aux-loss models return (logits, aux_loss, ps).
The optional `rrt` config injects an RRTEncoder between the projection and
the aggregation (reference main.py:138-155 `--only_rrt_enc`).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import RRTEncoderConfig
from ..utils.inits import xavier_normal, zeros
from .pool import masked_softmax
from .rrt import RRTEncoder


def _act(name: str):
    if name.lower() == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name.lower() == "tanh":
        return jnp.tanh
    return nn.relu


class FeatureHead(nn.Module):
    """Linear(input_dim -> 512) + act + dropout [+ RRT] shared stem."""

    input_dim: int = 1024
    act: str = "relu"
    dropout: float = 0.25
    rrt: Optional[RRTEncoderConfig] = None

    @nn.compact
    def __call__(self, x, mask=None, length=None, deterministic=True):
        x = nn.Dense(512, kernel_init=xavier_normal, bias_init=zeros,
                     name="fc")(x)
        x = _act(self.act)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        if self.rrt is not None:
            x = RRTEncoder(self.rrt, name="rrt")(
                x, mask=mask, length=length, deterministic=deterministic)
        return x


class ABMIL(nn.Module):
    """attmil.DAttention (reference modules/attmil.py:112-158): fc -> tanh
    attention (with bias, torch Linear default) -> pool -> classifier."""

    input_dim: int = 1024
    n_classes: int = 2
    act: str = "relu"
    dropout: float = 0.25
    rrt: Optional[RRTEncoderConfig] = None

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True, return_attn=False, no_norm=False,
                 return_pooled=False):
        if x.ndim == 2:
            x = x[None]
        feat = FeatureHead(self.input_dim, self.act, self.dropout, self.rrt,
                           name="feature")(x, mask, length, deterministic)
        a = nn.Dense(128, kernel_init=xavier_normal, bias_init=zeros,
                     name="attn_fc1")(feat)
        a = jnp.tanh(a)
        a = nn.Dense(1, kernel_init=xavier_normal, bias_init=zeros,
                     name="attn_fc2")(a)
        a = jnp.swapaxes(a, -1, -2)                     # (B, 1, N)
        a_ori = a
        a = masked_softmax(a, None if mask is None else mask[:, None, :])
        m = (a @ feat)[:, 0]                            # (B, 512)
        logits = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                          bias_init=zeros, name="classifier")(m)
        if return_pooled:
            # pooled bag embedding for the IBMIL confounder pipeline
            # (reference Survival/models/IBMIL/clustering.py extracts these)
            return logits, m
        if return_attn:
            return logits, (a_ori if no_norm else a)[:, 0]
        return logits


class GatedABMIL(nn.Module):
    """attmil.AttentionGated (reference modules/attmil.py:55-110): gated
    attention variant, 2-class head, attention Dense layers without bias."""

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
        feat = FeatureHead(self.input_dim, "relu", 0.25, self.rrt,
                           name="feature")(x, mask, length, deterministic)
        a = nn.Dense(128, use_bias=False, kernel_init=xavier_normal,
                     name="attention_a")(feat)
        a = _act(self.act)(a)
        b = nn.sigmoid(nn.Dense(128, use_bias=False, kernel_init=xavier_normal,
                                name="attention_b")(feat))
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
            b = nn.Dropout(0.25)(b, deterministic=deterministic)
        g = nn.Dense(1, use_bias=False, kernel_init=xavier_normal,
                     name="attention_c")(a * b)
        g = jnp.swapaxes(g, -1, -2)
        g = masked_softmax(g, None if mask is None else mask[:, None, :])
        m = (g @ feat)[:, 0]
        return nn.Dense(self.n_classes, kernel_init=xavier_normal,
                        bias_init=zeros, name="classifier")(m)
