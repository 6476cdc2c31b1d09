"""Pallas TPU kernel: fused backward for region attention + EPEG.

Differentiates the forward of ops/pallas/region_attn.py in its Toeplitz
formulation (M = I + T_h, build_epeg_toeplitz):

    Y   = M (q * scale)
    Lc  = Y k^T + pb
    A   = softmax(Lc)
    out = A v

Given g = d(out), per (region-block, head) tile entirely in VMEM:

    dv  = A^T g
    dA  = g v^T
    dLc = A * (dA - rowsum(dA * A))          (softmax backward)
    dY  = dLc k
    dq  = scale * M^T dY
    dk  = dLc^T Y
    dw[t] = sum_rij dLc[r,i,j] * L[r,i+d,j]  with L = (q*scale) k^T
          = sum(E_d * sum_r dLc_r L_r^T)     (diagonal sums via the E_d
                                              eye stack -- one VPU reduce,
                                              no unrolled taps)
    db  = sum dLc                            (accumulated across regions)

Everything is batched dot_generals + reductions; there are NO unrolled
k-tap loops (the round-2 version's 3x15-tap unrolling made Mosaic programs
big enough that the sandbox's remote compiler took minutes per shape).

The dw/db accumulation uses the revisited-output-block pattern: their block
index map is constant along the region grid axis, so the same VMEM buffer
persists across the r-loop and is zero-initialized at r == 0.

Recomputing Lc from q/k (flash-attention style) keeps residuals at O(P*hd)
instead of materializing the (R, H, P, P) probability tensor in HBM; the
recompute uses the same mm_dtype casts as the forward so the softmax
matches it bit-for-bit.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .region_attn import build_epeg_eyes, build_epeg_toeplitz, pick_rb


def _bwd_kernel(q_ref, k_ref, v_ref, pm_ref, b_ref, eyes_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dw_ref, db_ref,
                *, kk: int, scale: float, has_bias: bool, mm_dtype):
    head = pl.program_id(1)
    rblk = pl.program_id(0)
    rb, _, p, hd = q_ref.shape
    q = q_ref[:, 0]                     # (RB, P, hd)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    g = g_ref[:, 0]

    qs = (q * scale).astype(mm_dtype)
    if kk > 0:
        m_b = jnp.broadcast_to(pm_ref[head], (rb, p, p)).astype(mm_dtype)
        y = jax.lax.dot_general(
            m_b, qs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (RB, P, hd)
    else:
        y = qs.astype(jnp.float32)
    lc = jax.lax.dot_general(
        y.astype(mm_dtype), k.astype(mm_dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (RB, P, P)
    if kk > 0 and has_bias:
        lc = lc + b_ref[head, 0]
    m = jnp.max(lc, axis=-1, keepdims=True)
    e = jnp.exp(lc - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)

    # dv = A^T g
    dv_ref[:, 0] = jax.lax.dot_general(
        attn.astype(mm_dtype), g.astype(mm_dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    # softmax backward
    da = jax.lax.dot_general(
        g.astype(mm_dtype), v.astype(mm_dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dlc = attn * (da - jnp.sum(da * attn, axis=-1, keepdims=True))
    dlc_m = dlc.astype(mm_dtype)

    # dY = dLc k ; dq = scale * M^T dY ; dk = dLc^T Y
    dy = jax.lax.dot_general(
        dlc_m, k.astype(mm_dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (RB, P, hd)
    if kk > 0:
        dq = scale * jax.lax.dot_general(
            m_b, dy.astype(mm_dtype), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # M^T dY
    else:
        dq = scale * dy
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = jax.lax.dot_general(
        dlc_m, y.astype(mm_dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)

    if kk > 0:
        # zero-init once, at the very first program (region blocks iterate
        # outermost, head innermost; every program accumulates only into
        # its own row but the init clears the whole shared block)
        @pl.when((rblk == 0) & (head == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        # dw via diagonal sums: S = sum_r dLc_r L_r^T with L = qs k^T
        l_pre = jax.lax.dot_general(
            qs, k.astype(mm_dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (RB, P, P)
        s = jax.lax.dot_general(
            dlc_m, l_pre.astype(mm_dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (RB, P, P)
        s_sum = jnp.sum(s, axis=0, keepdims=True)        # (1, P, P)
        # all-2D reductions (rank-1 values trip the Mosaic compiler):
        # (kk, P, P) * (1, P, P) -> sum axis 2 -> (kk, P) -> sum axis 1
        # keepdims -> (kk, 1), accumulated into the TRANSPOSED (kk, H)
        # output so no in-kernel transpose is needed.
        t1 = jnp.sum(eyes_ref[...] * s_sum, axis=2)      # (kk, P)
        dw_col = jnp.sum(t1, axis=1, keepdims=True)      # (kk, 1)
        # full-block one-hot accumulation: dynamic lane-dim slice stores
        # (dw_ref[:, pl.ds(head, 1)] +=) SIGABRT the Mosaic compiler, and
        # rank-0 reductions do too -- everything stays 2-D full-block.
        h_n = dw_ref.shape[1]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, h_n), 1)
                  == head).astype(jnp.float32)
        dw_ref[...] += dw_col * onehot                   # (kk, 1)*(1, H)
        if has_bias:
            db0 = jnp.sum(dlc, axis=0)                   # (P, P)
            db1 = jnp.sum(db0, axis=1, keepdims=True)    # (P, 1)
            total = jnp.sum(db1, axis=0, keepdims=True)  # (1, 1)
            db_ref[...] += total * onehot


def region_attention_bwd_pallas(q, k, v, w, b, g, *, scale: float,
                                interpret: Optional[bool] = None,
                                mm_dtype=jnp.bfloat16,
                                rb: Optional[int] = None):
    """Returns (dq, dk, dv, dw, db); dw/db are None when w/b are None."""
    r, h, p, hd = q.shape
    kk = 0 if w is None else w.shape[1]
    has_bias = b is not None
    pm_in = (build_epeg_toeplitz(w, p) if w is not None
             else jnp.zeros((h, 1, 1), jnp.float32))
    eyes_in = (build_epeg_eyes(kk, p) if kk
               else jnp.zeros((1, 1, 1), jnp.float32))
    b_in = (b if b is not None else jnp.zeros((h,), jnp.float32)).reshape(h, 1)
    if rb is None:
        rb = pick_rb(r, p, c_tiles=30, env="RRTMIL_PALLAS_RB_BWD", default=4)
    assert r % rb == 0, (r, rb)
    if interpret is None:
        from .region_attn import env_interpret
        interpret = env_interpret()

    qkv_spec = pl.BlockSpec((rb, 1, p, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    pm_spec = pl.BlockSpec(pm_in.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    eyes_spec = pl.BlockSpec(eyes_in.shape, lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    # dw/db accumulate TRANSPOSED -- (kk, H) / (1, H) -- so the per-head
    # column update needs no in-kernel transpose; transposed back below.
    w_spec = pl.BlockSpec((max(kk, 1), h), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, h), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_in_spec = pl.BlockSpec((h, 1), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)

    # dq/dk/dv come back in the primals' dtypes (bf16 halves the DMA in
    # bfloat16 mode, and custom_vjp requires cotangents matching primal
    # avals); dw/db stay fp32 like their params.
    out_shapes = (
        jax.ShapeDtypeStruct((r, h, p, hd), q.dtype),        # dq
        jax.ShapeDtypeStruct((r, h, p, hd), k.dtype),        # dk
        jax.ShapeDtypeStruct((r, h, p, hd), v.dtype),        # dv
        jax.ShapeDtypeStruct((max(kk, 1), h), jnp.float32),  # dw^T
        jax.ShapeDtypeStruct((1, h), jnp.float32),           # db^T
    )
    out_specs = (qkv_spec, qkv_spec, qkv_spec, w_spec, b_spec)

    dq, dk, dv, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, kk=kk, scale=scale, has_bias=has_bias,
                          mm_dtype=mm_dtype),
        grid=(r // rb, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, pm_spec, bias_in_spec,
                  eyes_spec, qkv_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=r * h * (5 * 2 * p * p * hd
                           + (3 * 2 * p * p * hd + 2 * p * p * p
                              if kk else 0)),
            bytes_accessed=8 * r * h * p * hd * 4,
            transcendentals=r * h * p * p),
        interpret=interpret,
    )(q, k, v, pm_in, b_in, eyes_in, g)

    if w is None:
        return dq, dk, dv, None, None
    return dq, dk, dv, dw.T, (db[0] if has_bias else None)
