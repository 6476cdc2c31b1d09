"""Parameter initializers matching the reference's init schemes.

Two schemes exist in the reference:
  - `initialize_weights` (reference modules/rrt.py:9-23): xavier_normal on
    Linear/Conv kernels, zero biases, LayerNorm ones/zeros.  Applied by RRTMIL
    over every submodule (rrt.py:225) and by RRTEncoder when `need_init`.
    Flax's `xavier_normal()` computes the same fans as torch for both dense
    (out,in) and conv kernels, so we reuse it directly.
  - torch defaults (kaiming_uniform with a=sqrt(5) => U(+-1/sqrt(fan_in)),
    bias U(+-1/sqrt(fan_in))) for modules built without `need_init`.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_normal = nn.initializers.xavier_normal()
zeros = nn.initializers.zeros


def torch_default_kernel(in_features: int):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(in_features)
    return nn.initializers.uniform(scale=2 * bound, offset=-bound) \
        if hasattr(nn.initializers, "uniform") else None


def uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def crmsa_phi_init(crmsa_k: int):
    """kaiming_uniform(a=sqrt(5)) on a (dim, crmsa_k) tensor: torch computes
    fan_in = size(1) = crmsa_k, so bound = 1/sqrt(crmsa_k)
    (reference modules/rmsa.py:254-259)."""
    return uniform_bound(1.0 / math.sqrt(crmsa_k))
