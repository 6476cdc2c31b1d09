"""TransMIL baseline (reference modules/transmil.py): fc -> wrap-pad to the
ceil-sqrt square -> cls token -> NystromAttention layer -> PPEG -> Nystrom
layer -> LN -> cls-token head.

The wrap-around padding copies *real* leading tokens (transmil.py:100-101),
so this model runs on exact-length bags (Engine exact mode, batch 1) rather
than zero-bucketed ones.  `length` (static) selects the real-token prefix if
the input arrives longer.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ..config import NystromConfig
from ..utils.inits import xavier_normal, zeros
from .abmil import _act
from .nystrom import NystromAttention
from ..ops.epeg import depthwise_conv2d_nchw


class _TransLayer(nn.Module):
    """x + NystromAttention(LN(x)) (transmil.py:26-44)."""

    dim: int = 512

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = NystromConfig(dim=self.dim, head_dim=self.dim // 8, num_heads=8,
                            num_landmarks=self.dim // 2, pinv_iterations=6,
                            residual=True, dropout=0.1)
        return x + NystromAttention(cfg, name="attn")(
            nn.LayerNorm(name="norm")(x), deterministic=deterministic)


class _PPEG(nn.Module):
    """Conv position encoding on the spatial tokens, cls token passthrough
    (transmil.py:47-61)."""

    dim: int = 512

    @nn.compact
    def __call__(self, x, h, w):
        b, _, c = x.shape
        cls_tok, feat = x[:, :1], x[:, 1:]
        img = jnp.swapaxes(feat, 1, 2).reshape(b, c, h, w)
        out = img
        for name, k in (("proj", 7), ("proj1", 5), ("proj2", 3)):
            kernel = self.param(f"{name}_kernel", xavier_normal, (k, k, 1, c))
            bias = self.param(f"{name}_bias", zeros, (c,))
            out = out + depthwise_conv2d_nchw(
                img, kernel, bias, padding=((k // 2, k // 2), (k // 2, k // 2)),
                groups=c)
        out = jnp.swapaxes(out.reshape(b, c, h * w), 1, 2)
        return jnp.concatenate([cls_tok, out], axis=1)


class TransMIL(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    act: str = "relu"
    dropout: float = 0.25
    # classification transmil.py:80 leaves torch.randn (std 1.0); the
    # survival vendored copy re-inits to std 1e-6 (Survival/models/TransMIL/
    # network.py:75-76) -- the survival factory overrides this field
    cls_token_std: float = 1.0

    requires_exact = True  # wrap-padding needs true-length bags

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True):
        if x.ndim == 2:
            x = x[None]
        n = x.shape[1] if length is None else length
        x = x[:, :n]

        h = nn.Dense(512, kernel_init=xavier_normal, bias_init=zeros,
                     name="fc1")(x)
        h = _act(self.act)(h)
        if self.dropout:
            h = nn.Dropout(0.25)(h, deterministic=deterministic)

        side = int(math.ceil(math.sqrt(n)))
        add = side * side - n
        if add > 0:
            h = jnp.concatenate([h, h[:, :add]], axis=1)

        b = h.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=self.cls_token_std),
            (1, 1, 512))
        h = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, 512)), h],
                            axis=1)

        h = _TransLayer(name="layer1")(h, deterministic)
        h = _PPEG(name="pos_layer")(h, side, side)
        h = _TransLayer(name="layer2")(h, deterministic)

        h = nn.LayerNorm(name="norm")(h)[:, 0]
        return nn.Dense(self.n_classes, kernel_init=xavier_normal,
                        bias_init=zeros, name="fc2")(h)
