"""Survival heads: hazards = sigmoid(logits), S = cumprod(1 - hazards).

The reference's Survival/models/* are one-file vendored copies of the
classification backbones with this tail appended (e.g.
Survival/models/RRTMIL/network.py:791-794).  Here one wrapper module applies
the tail to any zoo backbone -- build once, parameterize the head
(SURVEY.md §2.2 "do not replicate the copy-paste")."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class SurvivalHead(nn.Module):
    """Wraps a logits-producing backbone into (hazards, S)."""

    backbone: nn.Module

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True):
        out = self.backbone(x, mask=mask, length=length,
                            deterministic=deterministic)
        logits = out[0] if isinstance(out, tuple) else out
        hazards = nn.sigmoid(logits)
        survival = jnp.cumprod(1.0 - hazards, axis=-1)
        return hazards, survival


def risk_score(survival: jnp.ndarray) -> jnp.ndarray:
    """risk = -sum(S) (reference Survival/models/RRTMIL/engine.py:79)."""
    return -jnp.sum(survival, axis=-1)
