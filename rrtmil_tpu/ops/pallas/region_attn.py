"""Pallas TPU kernel: fused region-batched attention with EPEG.

The hot op of the framework (SURVEY.md §2.1): for every (region, head) the
reference computes

    logits = (q * scale) @ k^T                       (rmsa.py:103-104)
    logits += depthwise_conv1d_k(logits, axis=query) (rmsa.py:83,106-108)
    attn   = softmax(logits)                         (rmsa.py:110)
    out    = attn @ v                                (rmsa.py:122)

XLA materializes the (R, H, P, P) logit tensor in HBM several times (conv
read/write, add, softmax, AV).  This kernel keeps the whole logit tile in
VMEM: one batched MXU matmul for logits, a k-tap shift-and-add for the
depthwise (k, 1) conv along the *query* axis (zero padding, cross-correlation
-- exact torch Conv2d semantics), row softmax, and the AV matmul -- a single
HBM round trip for q/k/v/out.

Grid layout: regions are processed RB at a time per program (grid =
(R/RB, H), block (RB, 1, P, hd)).  The per-region attention is tiny
(P ~ 144 tokens), so one program per (region, head) -- 512 programs at the
N~9k flagship config -- is dominated by per-program dispatch overhead;
batching RB regions into one program with a batched dot_general cuts the
program count by RB with the same total FLOPs.  RB is the largest divisor
of R <= RRTMIL_PALLAS_RB (env, default 4: measured on v5e at the flagship
shape, fwd 0.55->0.42 ms and bwd 1.36->0.97 ms vs RB=1; the backward
overflows VMEM at RB>=8).

The public wrapper `region_attention_fused` carries a custom_vjp whose
backward is the fused Pallas kernel in region_attn_bwd.py (flash-style
recompute); `_fused_fwd_xla` remains as the math reference for tests.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def env_interpret() -> bool:
    """RRTMIL_PALLAS_INTERPRET=1 runs both fused kernels in interpreter mode
    (any backend): used to exercise the Pallas code path -- including under
    shard_map sequence sharding -- on CPU test meshes."""
    return os.environ.get("RRTMIL_PALLAS_INTERPRET", "0") not in ("0", "")


def _shift_q(mat, d: int):
    """(RB, P, P) shifted by d along the query axis (1), zero-filled.

    |d| >= P (EPEG taps reaching past a small region, e.g. P=4 tokens with
    epeg_k=15) contributes only conv zero-padding: all zeros."""
    if d == 0:
        return mat
    rb, p, _ = mat.shape
    if abs(d) >= p:
        return jnp.zeros_like(mat)
    zeros = jnp.zeros((rb, abs(d), p), jnp.float32)
    if d < 0:
        return jnp.concatenate([zeros, mat[:, : p + d]], axis=1)
    return jnp.concatenate([mat[:, d:], zeros], axis=1)


def build_epeg_toeplitz(pw, p: int):
    """M_h = I + T_h: the (k,1) query-axis EPEG conv as a banded Toeplitz
    matrix per head (tap t of pe[i] reads logit row i + t - k//2; taps past
    the region are conv zero-padding, naturally absent from eye(p, k=d)).

    Applying M to q (or to the logit rows) replaces a k-tap unrolled
    shift-and-add with ONE batched MXU dot -- faster on the VPU-bound tap
    path AND an order of magnitude less Mosaic code, which matters because
    the sandbox's remote compiler scales badly with kernel size.

    pw: (H, kk) -> (H, p, p) fp32."""
    kk = pw.shape[1]
    pad = kk // 2
    eyes = jnp.stack([jnp.eye(p, k=t - pad, dtype=jnp.float32)
                      for t in range(kk)])
    return jnp.eye(p, dtype=jnp.float32)[None] + jnp.einsum(
        "hk,kij->hij", pw.astype(jnp.float32), eyes)


def build_epeg_eyes(kk: int, p: int):
    """(kk, p, p) stack of shifted identities E_d, d = t - kk//2 -- the
    masks extracting each tap's diagonal in dw accumulation."""
    pad = kk // 2
    return jnp.stack([jnp.eye(p, k=t - pad, dtype=jnp.float32)
                      for t in range(kk)])


def pick_rb(r: int, p: int, *, c_tiles: int, env: str, default: int) -> int:
    """Regions per program: largest divisor of r <= cap, where cap is the
    env override (RRTMIL_PALLAS_RB[_BWD]) or min(default, VMEM budget).

    The VMEM budget models Mosaic's scoped allocation as ~c_tiles live
    (P, P) fp32 tiles per region (empirical on v5e at kk=15: the rb=8
    backward allocates 19.4 MB => ~30 tiles/region; forward fits at rb=16
    => <=12).  Budget 12 MB of the 16 MB VMEM."""
    env_v = os.environ.get(env)
    if env_v:
        cap = int(env_v)
    else:
        budget = 12 * 1024 * 1024
        cap = min(default, max(1, budget // (p * p * 4 * c_tiles)))
    rb = 1
    for c in range(1, min(cap, r) + 1):
        if r % c == 0:
            rb = c
    return rb


def _kernel(q_ref, k_ref, v_ref, pm_ref, b_ref, o_ref, *, kk: int,
            scale: float, has_bias: bool, mm_dtype):
    head = pl.program_id(1)
    rb = q_ref.shape[0]
    p = q_ref.shape[2]
    q = q_ref[:, 0]                     # (RB, P, hd)
    k = k_ref[:, 0]
    v = v_ref[:, 0]

    # MXU inputs in mm_dtype (bf16 by default: fp32 matmuls take the slow
    # multi-pass MXU path, ~10x slower; accumulation stays fp32, matching
    # XLA's default-precision einsums on TPU)
    if kk > 0:
        # EPEG via the Toeplitz form: conv(q k^T) = (M q) k^T
        # (build_epeg_toeplitz) -- one batched dot, no unrolled taps
        m_b = jnp.broadcast_to(pm_ref[head], (rb, p, p))
        q = jax.lax.dot_general(
            m_b.astype(mm_dtype), (q * scale).astype(mm_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    else:
        q = q * scale
    logits = jax.lax.dot_general(
        q.astype(mm_dtype), k.astype(mm_dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (RB, P, P)
    if kk > 0 and has_bias:
        # pe_bias is key-constant (cancels in the row softmax; zero-grad in
        # the reference too) but added for bit-parity with the conv form
        logits = logits + b_ref[head, 0]

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[:, 0] = jax.lax.dot_general(
        attn.astype(mm_dtype), v.astype(mm_dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fused_fwd_pallas(q, k, v, w, b, *, scale: float,
                      interpret: Optional[bool] = None,
                      mm_dtype=jnp.bfloat16, rb: Optional[int] = None):
    """q, k, v: (R, H, P, hd); w: (H, kk) or None; b: (H,) or None.
    mm_dtype: MXU input dtype (bf16 default; fp32 for bit-level tests).
    rb: regions per program (must divide R; auto-picked when None)."""
    r, h, p, hd = q.shape
    kk = 0 if w is None else w.shape[1]
    has_bias = b is not None
    pm_in = (build_epeg_toeplitz(w, p) if w is not None
             else jnp.zeros((h, 1, 1), jnp.float32))
    b_in = (b if b is not None else jnp.zeros((h,), jnp.float32)).reshape(h, 1)
    if rb is None:
        rb = pick_rb(r, p, c_tiles=12, env="RRTMIL_PALLAS_RB", default=4)
    assert r % rb == 0, (r, rb)
    if interpret is None:
        interpret = env_interpret()

    qkv_spec = pl.BlockSpec((rb, 1, p, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    # Full Toeplitz stack / (H, 1) bias per program: constant index maps,
    # DMA'd once; full-array blocks satisfy the TPU tiling rules.
    pm_spec = pl.BlockSpec(pm_in.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((h, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)

    flops_per = 2 * p * p * hd * 2 + (2 * p * p * hd if kk else 0)
    # output DMA in the STREAM dtype (q's): halves the (R, H, P, hd) write +
    # downstream read in bfloat16 mode, while fp32-stream runs (including
    # all parity tests) keep bit-exact fp32 outputs.  The AV accumulation
    # itself is always fp32 regardless.
    out_dtype = q.dtype
    return pl.pallas_call(
        functools.partial(_kernel, kk=kk, scale=scale, has_bias=has_bias,
                          mm_dtype=mm_dtype),
        grid=(r // rb, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, pm_spec, b_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((r, h, p, hd), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=r * h * flops_per,
            bytes_accessed=4 * r * h * p * hd * 4,
            transcendentals=r * h * p * p),
        interpret=interpret,
    )(q, k, v, pm_in, b_in)


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
