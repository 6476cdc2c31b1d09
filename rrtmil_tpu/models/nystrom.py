"""Nystrom-approximated self-attention.

Mirrors reference modules/nystrom_attention.py:13-149 (used by the TransMIL
baseline and the `region_attn='ntrans'` ablation).  The mask branch of the
reference is dead/buggy (undefined `sim1..3` at nystrom_attention.py:122-126,
never exercised by any caller) and is deliberately not reproduced.

Sequence length is static under jit, so the front-padding to a multiple of
`num_landmarks` (nystrom_attention.py:72-75) resolves to static shapes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ..config import NystromConfig
from ..ops.epeg import depthwise_conv2d_nchw
from ..utils.inits import xavier_normal, zeros


def moore_penrose_pinv(x: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Newton-iteration pseudo-inverse (nystrom_attention.py:13-28).

    x: (..., m, m).  The iteration count is static, so a Python loop unrolls
    into a fixed XLA graph of matmuls (MXU-friendly)."""
    abs_x = jnp.abs(x)
    col = jnp.sum(abs_x, axis=-1)
    row = jnp.sum(abs_x, axis=-2)
    z = jnp.swapaxes(x, -1, -2) / (jnp.max(col) * jnp.max(row))
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))
    return z


class NystromAttention(nn.Module):
    cfg: NystromConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attn: bool = False):
        cfg = self.cfg
        b, n, _ = x.shape
        h, m = cfg.num_heads, cfg.num_landmarks
        inner = h * cfg.head_dim
        scale = cfg.head_dim ** -0.5

        # Front-pad to a multiple of num_landmarks (nystrom_attention.py:70-75).
        remainder = n % m
        if remainder > 0:
            x = jnp.pad(x, ((0, 0), (m - remainder, 0), (0, 0)))
        n_pad = x.shape[1]

        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=xavier_normal,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(b, n_pad, h, cfg.head_dim).transpose(0, 2, 1, 3)
                   for t in (q, k, v))
        q = q * scale

        # Landmarks via segment means over l = ceil(n/m) tokens, where n is
        # the ORIGINAL length (nystrom_attention.py:95-110).
        l = math.ceil(n / m)
        q_land = q.reshape(b, h, n_pad // l, l, cfg.head_dim).sum(axis=-2) / l
        k_land = k.reshape(b, h, n_pad // l, l, cfg.head_dim).sum(axis=-2) / l

        attn1 = nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k_land), axis=-1)
        attn2 = nn.softmax(jnp.einsum("bhid,bhjd->bhij", q_land, k_land), axis=-1)
        attn3 = nn.softmax(jnp.einsum("bhid,bhjd->bhij", q_land, k), axis=-1)
        attn2_inv = moore_penrose_pinv(attn2, cfg.pinv_iterations)
        out = (attn1 @ attn2_inv) @ (attn3 @ v)          # (b, h, n_pad, d)

        if cfg.residual:
            kk = cfg.residual_conv_kernel
            kernel = self.param("res_conv_kernel", xavier_normal, (kk, 1, 1, h))
            res = depthwise_conv2d_nchw(v, kernel, None,
                                        padding=((kk // 2, kk // 2), (0, 0)),
                                        groups=h)
            out = out + res

        out = out.transpose(0, 2, 1, 3).reshape(b, n_pad, inner)
        out = nn.Dense(cfg.dim, kernel_init=xavier_normal, bias_init=zeros,
                       name="to_out")(out)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        out = out[:, -n:]                                 # drop the front pad

        if return_attn:
            # Approximate first-row attention map (nystrom_attention.py:143-147).
            a = (attn1[:, :, 0][:, :, None, :] @ attn2_inv) @ attn3
            return out, a[:, :, 0, -(n - 1):]
        return out
