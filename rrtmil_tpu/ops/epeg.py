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


def epeg_fold_q(q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """EPEG folded onto q: the (k,1) depthwise conv over the *query* axis of
    the logit map commutes with the key matmul,

        conv_q((q * s) @ k^T) == conv_q(q * s) @ k^T,

    because the conv only shifts whole rows of the logit map and row i of
    (q @ k^T) depends on row i of q alone; the conv's zero-padded logit rows
    beyond the region boundary correspond exactly to zero q rows.  Folding
    moves the EPEG from an O(P^2 k) VPU pass over the logit tile inside the
    fused attention kernel to an O(P hd k) elementwise pass on q, and lets
    the kernel run its plain (kk=0) path.  Exact (up to fp reassociation)
    w.r.t. the reference's conv-on-logits (rmsa.py:83,106-108); pe_bias is
    constant across keys so it cancels in the row softmax and is dropped
    (its loss gradient is identically zero in the reference too).

    q: (B_, H, P, hd); w: (H, kk) cross-correlation taps (tap t reads query
    row i + t - kk//2, matching torch Conv2d).  Returns conv(q) in fp32.
    """
    kk = w.shape[1]
    pad = kk // 2
    n = q.shape[2]
    padded = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (pad, pad), (0, 0)))
    pe = jnp.zeros(q.shape, jnp.float32)
    for t in range(kk):
        pe = pe + w[None, :, t, None, None].astype(jnp.float32) * \
            jax.lax.slice_in_dim(padded, t, t + n, axis=2)
    return pe
