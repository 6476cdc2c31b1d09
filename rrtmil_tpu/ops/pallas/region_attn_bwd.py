"""Pallas TPU kernel: fused backward for region attention + EPEG.

Differentiates the forward of ops/pallas/region_attn.py:

    L   = (q * scale) @ k^T
    Lc  = L + conv_k(L) + b          (depthwise (k,1) conv over query axis)
    A   = softmax(Lc)
    out = A @ v

Given g = d(out), per (region-block, head) tile entirely in VMEM:

    dv  = A^T g
    dA  = g v^T
    dLc = A * (dA - rowsum(dA * A))              (softmax backward)
    dL  = dLc + conv_k^T(dLc)                    (transposed conv = taps with
                                                  negated offsets)
    dq  = scale * dL k
    dk  = dL^T (q * scale)
    dw[t] = sum_ij dLc[i, j] * L[i + t - pad, j] (accumulated across regions)
    db  = sum_ij dLc                             (accumulated across regions)

Like the forward, RB regions are processed per program (grid = (R/RB, H),
block (RB, 1, P, hd), batched dot_generals) to amortize per-program dispatch
overhead over the tiny per-region matmuls.

The dw/db accumulation uses the revisited-output-block pattern: their block
index map is constant along the region grid axis, so the same VMEM buffer
persists across the r-loop and is zero-initialized at r == 0.

Recomputing L from q/k (flash-attention style) keeps residuals at O(P*hd)
instead of materializing the (R, H, P, P) probability tensor in HBM.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .region_attn import _shift_q, pick_rb


def _bwd_kernel(q_ref, k_ref, v_ref, w_ref, b_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dw_ref, db_ref,
                *, kk: int, scale: float, has_bias: bool, mm_dtype):
    head = pl.program_id(1)
    rblk = pl.program_id(0)
    q = q_ref[:, 0]                     # (RB, P, hd)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    g = g_ref[:, 0]
    pad = kk // 2

    # recompute forward logits / probabilities (same mm_dtype as forward so
    # the recomputed softmax matches the forward bit-for-bit)
    logits = jax.lax.dot_general(
        (q * scale).astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (RB, P, P)
    lc = logits
    if kk > 0:
        pe = jnp.zeros_like(logits)
        for t in range(kk):
            pe = pe + w_ref[head, t] * _shift_q(logits, t - pad)
        if has_bias:
            pe = pe + b_ref[head, 0]
        lc = logits + pe
    m = jnp.max(lc, axis=-1, keepdims=True)
    e = jnp.exp(lc - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)

    # dv = A^T g
    dv_ref[:, 0] = jax.lax.dot_general(
        attn.astype(mm_dtype), g.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    # softmax backward
    da = jax.lax.dot_general(
        g.astype(mm_dtype), v.astype(mm_dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dlc = attn * (da - jnp.sum(da * attn, axis=-1, keepdims=True))

    # conv backward: dL = dLc + conv^T(dLc); accumulate dw, db
    if kk > 0:
        # zero-init once, at the very first program (region blocks iterate
        # outermost, head innermost; every program accumulates only into its
        # own row but the init clears the whole shared block)
        @pl.when((rblk == 0) & (head == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        dl = dlc
        taps = []
        for t in range(kk):
            d = t - pad
            # forward: pe[i] += w[t] * L[i + d]  =>  dL[i'] += w[t]*dLc[i'-d]
            dl = dl + w_ref[head, t] * _shift_q(dlc, -d)
            # dw[t] = sum_rij dLc[r, i, j] * L[r, i + d, j]
            taps.append(jnp.sum(dlc * _shift_q(logits, d)))
        # row-wise accumulation (scalar VMEM stores are not supported)
        row = jnp.stack(taps).reshape(1, kk)
        dw_ref[pl.ds(head, 1), :] += row
        if has_bias:
            db_ref[pl.ds(head, 1), :] += jnp.sum(dlc).reshape(1, 1)
    else:
        dl = dlc

    # dq = scale * dL k ; dk = dL^T (q * scale)
    dq_ref[:, 0] = (scale * jax.lax.dot_general(
        dl.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)).astype(dq_ref.dtype)
    dk_ref[:, 0] = jax.lax.dot_general(
        dl.astype(mm_dtype), (q * scale).astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def region_attention_bwd_pallas(q, k, v, w, b, g, *, scale: float,
                                interpret: Optional[bool] = None,
                                mm_dtype=jnp.bfloat16,
                                rb: Optional[int] = None):
    """Returns (dq, dk, dv, dw, db); dw/db are None when w/b are None."""
    r, h, p, hd = q.shape
    kk = 0 if w is None else w.shape[1]
    has_bias = b is not None
    w_in = w if w is not None else jnp.zeros((h, 1), jnp.float32)
    b_in = (b if b is not None else jnp.zeros((h,), jnp.float32)).reshape(h, 1)
    if rb is None:
        rb = pick_rb(r, p, c_tiles=30, env="RRTMIL_PALLAS_RB_BWD", default=4)
    assert r % rb == 0, (r, rb)
    if interpret is None:
        from .region_attn import env_interpret
        interpret = env_interpret()

    qkv_spec = pl.BlockSpec((rb, 1, p, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((h, max(kk, 1)), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((h, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)

    # dq/dk/dv come back in the primals' dtypes (bf16 halves the DMA in
    # bfloat16 mode, and custom_vjp requires cotangents matching primal
    # avals); dw/db stay fp32 like their params.
    out_shapes = (
        jax.ShapeDtypeStruct((r, h, p, hd), q.dtype),        # dq
        jax.ShapeDtypeStruct((r, h, p, hd), k.dtype),        # dk
        jax.ShapeDtypeStruct((r, h, p, hd), v.dtype),        # dv
        jax.ShapeDtypeStruct((h, max(kk, 1)), jnp.float32),  # dw
        jax.ShapeDtypeStruct((h, 1), jnp.float32),           # db
    )
    out_specs = (qkv_spec, qkv_spec, qkv_spec, w_spec, b_spec)

    dq, dk, dv, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, kk=kk, scale=scale, has_bias=has_bias,
                          mm_dtype=mm_dtype),
        grid=(r // rb, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, w_spec, b_spec, qkv_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=r * h * (5 * 2 * p * p * hd + 3 * kk * p * p),
            bytes_accessed=8 * r * h * p * hd * 4,
            transcendentals=r * h * p * p),
        interpret=interpret,
    )(q, k, v, w_in, b_in, g)

    if w is None:
        return dq, dk, dv, None, None
    return dq, dk, dv, dw, (db[:, 0] if has_bias else None)
