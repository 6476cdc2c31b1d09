"""Depthwise 2-D convolution primitives.

One helper backs every conv in the framework:
  - EPEG conv on attention logits, kernel (k,1), channels = heads
    (reference modules/rmsa.py:78-85,106-108)
  - EPEG value convs ('value_bf'/'value_af' ablations, rmsa.py:114-129)
  - PEG / PPEG position-encoding convs (reference modules/emb_position.py:24-82)
  - Nystrom residual value conv, kernel (33,1) (reference
    modules/nystrom_attention.py:61-65,135-136)

Layout: activations NCHW, kernels HWIO with I = in_channels/groups (=1 for
depthwise).  XLA lowers grouped convs onto the MXU/VPU directly; the Pallas
fused-attention kernel re-implements the (k,1) logit conv inline.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def depthwise_conv2d_nchw(
    x: jnp.ndarray,
    kernel_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
    groups: Optional[int] = None,
) -> jnp.ndarray:
    """Grouped conv: x (B, C, H, W), kernel (kh, kw, C//groups, C_out)."""
    if groups is None:
        groups = x.shape[1]
    out = jax.lax.conv_general_dilated(
        x, kernel_hwio,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


def epeg_logit_conv(
    attn: jnp.ndarray,
    kernel_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    k: int,
    two_d: bool,
) -> jnp.ndarray:
    """EPEG positional conv on raw attention logits.

    attn: (B_, num_heads, N, N) treated as an NCHW image (channels = heads).
    1-D variant: kernel (k, 1), zero padding (k//2, 0) -- convolves along the
    *query* axis only, per head (reference rmsa.py:83).  2-D variant uses a
    full (k, k) kernel (rmsa.py:78).
    Returns the conv output `pe` to be added to the logits (rmsa.py:106-108).
    """
    pad = k // 2
    padding = ((pad, pad), (pad, pad)) if two_d else ((pad, pad), (0, 0))
    return depthwise_conv2d_nchw(attn, kernel_hwio, bias, padding,
                                 groups=attn.shape[1])
