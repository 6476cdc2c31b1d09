"""Position-embedding ablation library (PEG / PPEG / SINCOS / APE).

Mirrors reference modules/emb_position.py.  The broken RPE (undefined vars at
emb_position.py:200-202) and the hardcoded-cuda PositionEmbedding lookup are
not reproduced.  All are ablations -- RRTEncoder defaults to `pos='none'`
(reference modules/rrt.py:151-158).

TPU note: inputs arrive padded to a static bucket length; each module takes
the true `length` statically, operates on the reference-exact leading slice
(PEG/PPEG wrap-around padding copies *real* leading tokens,
emb_position.py:39,71), and zero-extends back to the bucket length.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ..ops.epeg import depthwise_conv2d_nchw
from ..utils.inits import xavier_normal, zeros


def _square_wrap_pad(x: jnp.ndarray, length: int):
    """Pad (B, L, C) to the ceil-sqrt square by wrapping leading tokens
    (emb_position.py:35-39,69-71). Returns (padded, H, add_length)."""
    h = int(math.ceil(math.sqrt(length)))
    add = h * h - length
    if add > 0:
        x = jnp.concatenate([x, x[:, :add]], axis=1)
    return x, h, add


def _restore(x: jnp.ndarray, length: int, out_length: int) -> jnp.ndarray:
    x = x[:, :length]
    if out_length > length:
        x = jnp.pad(x, ((0, 0), (0, out_length - length), (0, 0)))
    return x


class PEG(nn.Module):
    """Single depthwise-conv positional encoding (emb_position.py:60-82)."""

    dim: int = 512
    k: int = 7
    bias: bool = True
    conv_1d: bool = False

    @nn.compact
    def __call__(self, x, length=None):
        b, n, c = x.shape
        length = n if length is None else length
        xs, h, _ = _square_wrap_pad(x[:, :length], length)
        img = jnp.swapaxes(xs, 1, 2).reshape(b, c, h, h)
        kh, kw = (self.k, self.k) if not self.conv_1d else (self.k, 1)
        kernel = self.param("kernel", xavier_normal, (kh, kw, 1, c))
        bias = self.param("bias", zeros, (c,)) if self.bias else None
        out = depthwise_conv2d_nchw(img, kernel, bias,
                                    padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                                    groups=c)
        out = out + img
        out = jnp.swapaxes(out.reshape(b, c, h * h), 1, 2)
        return _restore(out, length, n)


class PPEG(nn.Module):
    """Pyramid PEG: parallel depthwise convs k/5/3 (emb_position.py:24-58).

    Includes the reference's H<7 branch: zero-pad the wrapped square up to
    7x7 before convolving (emb_position.py:41-45)."""

    dim: int = 512
    k: int = 7
    bias: bool = True
    conv_1d: bool = False

    @nn.compact
    def __call__(self, x, length=None):
        b, n, c = x.shape
        length = n if length is None else length
        xs, h, add = _square_wrap_pad(x[:, :length], length)
        if h < 7:
            zero_pad = 7 * 7 - (length + add)
            xs = jnp.pad(xs, ((0, 0), (0, zero_pad), (0, 0)))
            h = 7
        img = jnp.swapaxes(xs, 1, 2).reshape(b, c, h, h)
        out = img
        for name, k in (("proj", self.k), ("proj1", 5), ("proj2", 3)):
            kh, kw = (k, k) if not self.conv_1d else (k, 1)
            kernel = self.param(f"{name}_kernel", xavier_normal, (kh, kw, 1, c))
            bias = self.param(f"{name}_bias", zeros, (c,)) if self.bias else None
            out = out + depthwise_conv2d_nchw(
                img, kernel, bias,
                padding=((kh // 2, kh // 2), (kw // 2, kw // 2)), groups=c)
        out = jnp.swapaxes(out.reshape(b, c, h * h), 1, 2)
        return _restore(out, length, n)


def sincos_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    """2-D sin-cos table (emb_position.py:90-135)."""
    def emb_1d(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_h, grid_h), axis=0).reshape(2, -1)
    return np.concatenate([emb_1d(embed_dim // 2, grid[0]),
                           emb_1d(embed_dim // 2, grid[1])], axis=1)


class SINCOS(nn.Module):
    """Fixed 2-D sin-cos embedding (emb_position.py:85-161).

    The reference adds its (64, C) table via
    `pos_embed.unsqueeze(1).unsqueeze(1).repeat(1,H,W,1)` -- a broadcast that
    is only shape-sane for an 8x8 grid with batch 1.  Here we implement the
    clearly *intended* semantics: add the 2-D sin-cos embedding of each grid
    position to the token at that position, regenerating the table at the
    actual grid size.  Operates on (B, N, C) with N a perfect square."""

    embed_dim: int = 512

    @nn.compact
    def __call__(self, x, length=None):
        b, n, c = x.shape
        h = int(round(math.sqrt(n)))
        table = jnp.asarray(sincos_2d(self.embed_dim, h), dtype=x.dtype)
        return x + table[None, :, :]


class APE(nn.Module):
    """Learned absolute embedding (emb_position.py:163-171), per-position over
    the flattened grid (intended semantics; the reference broadcast has the
    same leading-axis quirk as SINCOS)."""

    embed_dim: int = 512
    num_patches: int = 64

    @nn.compact
    def __call__(self, x, length=None):
        table = self.param(
            "absolute_pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.num_patches, self.embed_dim))
        n = x.shape[1]
        t = table[:n] if n <= self.num_patches else jnp.pad(
            table, ((0, n - self.num_patches), (0, 0)))
        return x + t[None, :, :]
