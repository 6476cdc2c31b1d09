"""Pallas TPU kernel: fused region-batched attention with EPEG.

The hot op of the framework (SURVEY.md §2.1): for every (region, head) the
reference computes

    logits = (q * scale) @ k^T                       (rmsa.py:103-104)
    logits += depthwise_conv1d_k(logits, axis=query) (rmsa.py:83,106-108)
    attn   = softmax(logits)                         (rmsa.py:110)
    out    = attn @ v                                (rmsa.py:122)

XLA materializes the (R, H, P, P) logit tensor in HBM several times (conv
read/write, add, softmax, AV).  This kernel keeps the whole (P, P) tile in
VMEM per (region, head) program: one MXU matmul for logits, a k-tap
shift-and-add for the depthwise (k, 1) conv along the *query* axis (zero
padding, cross-correlation -- exact torch Conv2d semantics), row softmax,
and the AV matmul -- a single HBM round trip for q/k/v/out.

The public wrapper `region_attention_fused` carries a custom_vjp whose
backward is the fused Pallas kernel in region_attn_bwd.py (flash-style
recompute); `_fused_fwd_xla` remains as the math reference for tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, w_ref, b_ref, o_ref, *, kk: int, scale: float,
            has_bias: bool, mm_dtype):
    head = pl.program_id(1)
    q = q_ref[0, 0]                     # (P, hd)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    p = q.shape[0]

    # MXU inputs in mm_dtype (bf16 by default: fp32 matmuls take the slow
    # multi-pass MXU path, ~10x slower; accumulation stays fp32, matching
    # XLA's default-precision einsums on TPU)
    logits = jax.lax.dot_general(
        (q * scale).astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (P, P)

    if kk > 0:
        pad = kk // 2
        pe = jnp.zeros_like(logits)
        for t in range(kk):                          # k-tap shift-and-add
            d = t - pad                              # query offset of this tap
            if d < 0:
                shifted = jnp.concatenate(
                    [jnp.zeros((-d, p), jnp.float32), logits[: p + d]], axis=0)
            elif d > 0:
                shifted = jnp.concatenate(
                    [logits[d:], jnp.zeros((d, p), jnp.float32)], axis=0)
            else:
                shifted = logits
            pe = pe + w_ref[head, t] * shifted
        if has_bias:
            pe = pe + b_ref[head, 0]
        logits = logits + pe

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0, 0] = jax.lax.dot_general(
        attn.astype(mm_dtype), v.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fused_fwd_pallas(q, k, v, w, b, *, scale: float, interpret: bool = False,
                      mm_dtype=jnp.bfloat16):
    """q, k, v: (R, H, P, hd); w: (H, kk) or None; b: (H,) or None.
    mm_dtype: MXU input dtype (bf16 default; fp32 for bit-level tests)."""
    r, h, p, hd = q.shape
    kk = 0 if w is None else w.shape[1]
    has_bias = b is not None
    w_in = w if w is not None else jnp.zeros((h, 1), jnp.float32)
    b_in = (b if b is not None else jnp.zeros((h,), jnp.float32)).reshape(h, 1)

    qkv_spec = pl.BlockSpec((1, 1, p, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    # Full (H, kk) weight / (H, 1) bias per program: tiny, and full-array
    # blocks satisfy the TPU tiling rules where a (1, kk) block would not.
    w_spec = pl.BlockSpec((h, max(kk, 1)), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((h, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)

    flops_per = 2 * p * p * hd * 2 + kk * p * p
    return pl.pallas_call(
        functools.partial(_kernel, kk=kk, scale=scale, has_bias=has_bias,
                          mm_dtype=mm_dtype),
        grid=(r, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, w_spec, b_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((r, h, p, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=r * h * flops_per,
            bytes_accessed=4 * r * h * p * hd * 4,
            transcendentals=r * h * p * p),
        interpret=interpret,
    )(q, k, v, w_in, b_in)


def _fused_fwd_xla(q, k, v, w, b, *, scale: float):
    """Reference implementation (identical math) used for backward and as
    fallback; mirrors models/rrt.py InnerAttention's logit path."""
    logits = jnp.einsum("rhid,rhjd->rhij", q * scale, k)
    if w is not None:
        kk = w.shape[1]
        pad = kk // 2
        padded = jnp.pad(logits, ((0, 0), (0, 0), (pad, pad), (0, 0)))
        pe = jnp.zeros_like(logits)
        for t in range(kk):
            pe = pe + w[None, :, t, None, None] * \
                jax.lax.slice_in_dim(padded, t, t + logits.shape[2], axis=2)
        if b is not None:
            pe = pe + b[None, :, None, None]
        logits = logits + pe
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("rhij,rhjd->rhid", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def region_attention_fused(q, k, v, w, b, scale: float,
                           mm_dtype=jnp.bfloat16):
    return _fused_fwd_pallas(q, k, v, w, b, scale=scale, mm_dtype=mm_dtype)


def _fwd(q, k, v, w, b, scale, mm_dtype):
    out = _fused_fwd_pallas(q, k, v, w, b, scale=scale, mm_dtype=mm_dtype)
    return out, (q, k, v, w, b)


def _bwd(scale, mm_dtype, residuals, g):
    q, k, v, w, b = residuals
    from .region_attn_bwd import region_attention_bwd_pallas
    return region_attention_bwd_pallas(q, k, v, w, b, g, scale=scale,
                                       mm_dtype=mm_dtype)


region_attention_fused.defvjp(_fwd, _bwd)
