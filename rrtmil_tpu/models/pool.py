"""MIL aggregation heads: AB-MIL gated/ungated attention pooling.

Mirrors reference modules/datten.py:5-101.  TPU adaptation: bags arrive
padded to a static bucket length, so the softmax over instances takes an
optional boolean mask selecting the true tokens (the reference pools over
exactly the L true tokens because region attention unpads first,
rmsa.py:227-228 -- a masked softmax is numerically identical).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.inits import xavier_normal, zeros


def _act(name: str):
    return {"relu": nn.relu,
            "gelu": lambda x: nn.gelu(x, approximate=False),
            "tanh": jnp.tanh}[name]


def masked_softmax(logits: jnp.ndarray, mask: Optional[jnp.ndarray],
                   axis: int = -1) -> jnp.ndarray:
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    return nn.softmax(logits, axis=axis)


def sharded_attention_pool(scores, x, mask, axis_name):
    """Attention pooling when tokens are sharded over `axis_name`: a stable
    global softmax via pmax/psum of partial numerators -- numerically equal
    to pooling the full sequence on one device."""
    if mask is not None:
        scores = jnp.where(mask[:, None, :], scores,
                           jnp.finfo(scores.dtype).min)
    m_local = jnp.max(scores, axis=-1, keepdims=True)
    # softmax is shift-invariant, so the global max is purely a numerical
    # stabilizer; stop_gradient makes it differentiable (pmax has no VJP)
    # without changing any derivative.
    m = jax.lax.pmax(jax.lax.stop_gradient(m_local), axis_name)
    e = jnp.exp(scores - m)
    if mask is not None:
        e = e * mask[:, None, :].astype(e.dtype)
    num = jax.lax.psum(e @ x, axis_name)           # (B, 1, C)
    den = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis_name)
    return num / den


class Attention(nn.Module):
    """2-layer attention scorer L=512 -> D=128 -> K=1 (datten.py:5-38)."""

    input_dim: int = 512
    act: str = "relu"
    bias: bool = False
    dropout: bool = False
    axis_name: Optional[str] = None   # set under sequence sharding

    @nn.compact
    def __call__(self, x, mask=None, no_norm: bool = False,
                 deterministic: bool = True):
        a = nn.Dense(128, use_bias=self.bias, kernel_init=xavier_normal,
                     bias_init=zeros, name="fc1")(x)
        a = _act(self.act)(a)
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
        a = nn.Dense(1, use_bias=self.bias, kernel_init=xavier_normal,
                     bias_init=zeros, name="fc2")(a)
        a = jnp.swapaxes(a, -1, -2)          # (B, 1, N)
        a_ori = a
        if self.axis_name is not None:
            out = sharded_attention_pool(a, x, mask, self.axis_name)
            return out, a_ori
        a = masked_softmax(a, None if mask is None else mask[:, None, :])
        out = a @ x                           # (B, 1, C)
        return out, (a_ori if no_norm else a)


class AttentionGated(nn.Module):
    """Gated attention scorer (datten.py:40-83)."""

    input_dim: int = 512
    act: str = "relu"
    bias: bool = False
    dropout: bool = False
    axis_name: Optional[str] = None   # set under sequence sharding

    @nn.compact
    def __call__(self, x, mask=None, no_norm: bool = False,
                 deterministic: bool = True):
        a = nn.Dense(128, use_bias=self.bias, kernel_init=xavier_normal,
                     bias_init=zeros, name="attention_a")(x)
        a = _act(self.act)(a)
        b = nn.Dense(128, use_bias=self.bias, kernel_init=xavier_normal,
                     bias_init=zeros, name="attention_b")(x)
        b = nn.sigmoid(b)
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
            b = nn.Dropout(0.25)(b, deterministic=deterministic)
        g = nn.Dense(1, use_bias=self.bias, kernel_init=xavier_normal,
                     bias_init=zeros, name="attention_c")(a * b)
        g = jnp.swapaxes(g, -1, -2)
        g_ori = g
        if self.axis_name is not None:
            out = sharded_attention_pool(g, x, mask, self.axis_name)
            return out, g_ori
        g = masked_softmax(g, None if mask is None else mask[:, None, :])
        out = g @ x
        return out, (g_ori if no_norm else g)


class DAttention(nn.Module):
    """Dispatch wrapper (datten.py:85-101): returns pooled (B, C)."""

    input_dim: int = 512
    act: str = "relu"
    gated: bool = False
    bias: bool = False
    dropout: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, return_attn: bool = False,
                 no_norm: bool = False, deterministic: bool = True):
        if self.gated:
            mod = AttentionGated(self.input_dim, self.act, self.bias,
                                 self.dropout, axis_name=self.axis_name,
                                 name="attention")
        else:
            mod = Attention(self.input_dim, self.act, self.bias,
                            self.dropout, axis_name=self.axis_name,
                            name="attention")
        out, attn = mod(x, mask, no_norm, deterministic)
        out = jnp.squeeze(out, axis=1)
        if return_attn:
            return out, jnp.squeeze(attn, axis=1)
        return out


class MeanPool(nn.Module):
    """Masked mean over instances (AdaptiveAvgPool1d(1) equivalent,
    reference modules/rrt.py:221).  Under sequence sharding (`axis_name`)
    numerator and token count are psum-reduced, so the result equals the
    single-device masked mean."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, **_):
        if mask is None:
            mask = jnp.ones(x.shape[:2], bool)
        m = mask[..., None].astype(x.dtype)
        num = jnp.sum(x * m, axis=1)
        den = jnp.sum(m, axis=1)
        if self.axis_name is not None:
            num = jax.lax.psum(num, self.axis_name)
            den = jax.lax.psum(den, self.axis_name)
        return num / jnp.maximum(den, 1.0)


class MaxPool(nn.Module):
    """Masked max over instances.  Under sequence sharding the local maxima
    are all-gathered and reduced (all_gather of (B, C) per shard is tiny and
    keeps the max differentiable, unlike lax.pmax which has no VJP)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, **_):
        if mask is not None:
            x = jnp.where(mask[..., None], x, jnp.finfo(x.dtype).min)
        local = jnp.max(x, axis=1)
        if self.axis_name is not None:
            gathered = jax.lax.all_gather(local, self.axis_name, axis=0)
            # all_gather output is still marked device-varying under
            # shard_map's vma tracking; the values are identical per shard,
            # so pmean re-replicates without changing value or gradient.
            return jax.lax.pmean(jnp.max(gathered, axis=0), self.axis_name)
        return local
