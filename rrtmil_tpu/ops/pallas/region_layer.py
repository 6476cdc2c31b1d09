"""Pallas TPU kernel: the ENTIRE R-MSA TransLayer in one pass.

Fuses LayerNorm -> mask -> region partition -> per-region EPEG attention
(qkv + Toeplitz-EPEG logits + softmax + AV + out-projection) -> region
reverse -> mask -> residual add (reference modules/rrt.py:43-131 +
rmsa.py:56-230) into a single pallas_call over grid-row blocks.

Why: with the round-4 block kernel the attention math itself ran at ~45%
of peak, but the surrounding XLA ops -- the fp32 LayerNorm stream, two
mask multiplies, the HBM partition/reverse relayouts, and the residual
add -- cost ~0.35 ms/slide of pure HBM traffic at batch 16 (profiler
trace, VERDICT r4 work).  Here the layer reads x once (bf16), does the
norm/rearrange/attention entirely in VMEM, and writes x_out once: HBM
traffic per layer drops from ~10 passes over the stream to 2.

Layout trick: the token stream (B, G*G, C) is VIEWED as (B, G, G, C) --
a free reshape -- and each program takes one (rs, cb*rs, C) slab: `rs`
grid rows by `cb` regions.  The qkv and output projections run on the
slab's natural (rs*cb*rs, C) token order (region order is irrelevant to
a per-token matmul); only the small per-head q/k/v (M, hd) tensors are
rearranged to (cb, P, hd) region batches for the attention dots, in VMEM.

Training with proj-dropout/drop-path active uses `add_residual=False`:
the kernel returns the masked attention branch and the caller applies
dropout + residual (elementwise mask and dropout commute).  The backward
is the XLA composition of identical math whose attention core runs the
fused Pallas backward kernel (see region_block._block_ref).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .region_attn import env_interpret
from .region_block import _block_ref


def _layer_kernel(x_ref, m_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                  pm_ref, pb_ref, wp_ref, bp_ref, o_ref,
                  *, heads: int, kk: int, has_pb: bool, mm_dtype,
                  add_residual: bool, eps: float):
    _, rs, w, c = x_ref.shape          # m_ref is (1, rs, w, 1)
    cb = w // rs
    p = rs * rs
    hd = wp_ref.shape[1]
    n = rs * w

    xin = x_ref[0]                                  # (rs, w, C)
    xf = xin.astype(jnp.float32).reshape(n, c)
    # flax LayerNorm (fast variance): var = max(0, E[x^2] - E[x]^2)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu)
    z = (xf - mu) * jax.lax.rsqrt(var + eps)
    z = z * ls_ref[0][None, :] + lb_ref[0][None, :]
    mflat = m_ref[0].astype(jnp.float32).reshape(n, 1)
    z = (z * mflat).astype(mm_dtype)                # (M, C) masked tokens

    def to_regions(t):
        # (rs, cb, rs, hd) -> (cb, rs, rs, hd) -> (cb, P, hd)
        return t.reshape(rs, cb, rs, hd).transpose(1, 0, 2, 3) \
                .reshape(cb, p, hd)

    def head_attn(h):
        qkv = jax.lax.dot_general(
            z, wqkv_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[h][None, :]
        qb = to_regions(qkv[:, :hd])
        kb = to_regions(qkv[:, hd:2 * hd]).astype(mm_dtype)
        vb = to_regions(qkv[:, 2 * hd:]).astype(mm_dtype)
        if kk > 0:
            # EPEG (k,1) conv on the logit map == Toeplitz matrix applied
            # to q (see region_block._block_kernel)
            m_b = jnp.broadcast_to(pm_ref[h], (cb, p, p))
            qb = jax.lax.dot_general(
                m_b.astype(mm_dtype), qb.astype(mm_dtype),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        logits = jax.lax.dot_general(
            qb.astype(mm_dtype), kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # (cb, P, P)
        if kk > 0 and has_pb:
            logits = logits + pb_ref[h, 0]
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            attn.astype(mm_dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # (cb, P, hd)
        # regions -> token order
        return o.reshape(cb, rs, rs, hd).transpose(1, 0, 2, 3) \
                .reshape(n, hd)

    o_all = jnp.concatenate(
        [head_attn(h).astype(mm_dtype) for h in range(heads)], axis=-1)
    proj = jax.lax.dot_general(
        o_all, wp_ref[...].reshape(heads * hd, c), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bp_ref[...]
    proj = proj * mflat                             # zero the pad rows
    if add_residual:
        out = xin.astype(jnp.float32).reshape(n, c) + proj
    else:
        out = proj
    o_ref[0] = out.reshape(rs, w, c).astype(o_ref.dtype)


def legal_cb(nrs: int, rs: int, cap: int) -> Optional[int]:
    """Largest regions-per-program that (a) divides the nrs regions per
    grid row, (b) fits the VMEM cap, and (c) keeps the (cb*rs) block dim
    legal under the TPU layout rule (second-to-last block dim divisible
    by 8, or equal to the full grid side when cb == nrs).  None when no
    legal choice exists (caller falls back to the unfused path)."""
    for cand in sorted((d for d in range(1, nrs + 1) if nrs % d == 0),
                       reverse=True):
        if cand > cap:
            continue
        if (cand * rs) % 8 == 0 or cand == nrs:
            return cand
    return None


def _pick_cb(nrs: int, rs: int, c: int, heads: int, hd: int,
             itemsize: int = 2) -> Optional[int]:
    env = os.environ.get("RRTMIL_LAYER_CB")
    if env:
        cap = int(env)
    else:
        p = rs * rs
        # live-set estimate; halved because Mosaic reuses freed buffers
        # (calibrated on v5e: cb=8 fits and is fastest at the flagship
        # bf16 G=96/rs=12/C=512/H=8 shape -- 0.320 vs 0.339 ms at cb=4;
        # the f32-stream P=196 survival shape must drop lower or the
        # compiler hits the 16 MB scoped-vmem stack limit)
        per_region = (p * c * (3 * itemsize + 12)       # xin+o, xf, z, oall, proj
                      + 4 * p * 3 * hd * 4              # qkv + region copies
                      + 4 * p * p * 4) // 2             # logit tiles
        weights = 4 * heads * c * hd * 2 + heads * p * p * 4
        cap = max(1, (13 * 1024 * 1024 - weights) // max(per_region, 1))
    return legal_cb(nrs, rs, cap)


def layer_fusable_geometry(nrs: int, rs: int, c: int, heads: int, hd: int,
                           itemsize: int = 2) -> bool:
    """True when a legal VMEM-fitting block decomposition exists AND the
    channel dim is lane-aligned (the kernel's last block dim must divide
    128)."""
    return c % 128 == 0 and _pick_cb(nrs, rs, c, heads, hd,
                                     itemsize) is not None


def _layer_fwd_pallas(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb,
                      wp, bp, *, grid_side: int, region_size: int,
                      add_residual: bool, mm_dtype, eps: float = 1e-6,
                      interpret: Optional[bool] = None,
                      cb: Optional[int] = None):
    """x: (B, G*G, C) stream dtype; mask (B, G*G) bool; weights as
    region_block._block_fwd_pallas (wq/bq pre-scaled).  Returns x-shaped
    output: the full post-layer stream (add_residual) or the masked
    attention branch."""
    b, nn_, c = x.shape
    g, rs = grid_side, region_size
    assert nn_ == g * g, (nn_, g)
    nrs = g // rs
    p = rs * rs
    h, _, hd = wq.shape
    kk = 0 if pw is None else pw.shape[1]
    has_pb = pb is not None
    mmd = jnp.dtype(mm_dtype)
    if pw is not None:
        pad = kk // 2
        eyes = jnp.stack([jnp.eye(p, k=t - pad, dtype=jnp.float32)
                          for t in range(kk)])
        pm_in = jnp.eye(p, dtype=jnp.float32)[None] + jnp.einsum(
            "hk,kij->hij", pw.astype(jnp.float32), eyes)
    else:
        pm_in = jnp.zeros((h, 1, 1), jnp.float32)
    pb_in = (pb if pb is not None else jnp.zeros((h,), jnp.float32))
    pb_in = pb_in.reshape(h, 1)
    wqkv = jnp.concatenate([w_.astype(mmd) for w_ in (wq, wk, wv)], axis=-1)
    bqkv = jnp.concatenate([b_.astype(jnp.float32) for b_ in (bq, bk, bv)],
                           axis=-1)
    wp = wp.astype(mmd)
    bp2 = bp.astype(jnp.float32).reshape(1, c)
    ls = ln_s.astype(jnp.float32).reshape(1, c)
    lb = ln_b.astype(jnp.float32).reshape(1, c)
    if cb is None:
        cb = _pick_cb(nrs, rs, c, h, hd, x.dtype.itemsize)
        if cb is None:
            raise ValueError(
                f"no legal block decomposition for grid {g}/rs {rs} "
                f"(callers gate on layer_fusable_geometry)")
    assert nrs % cb == 0, (nrs, cb)
    if interpret is None:
        interpret = env_interpret()

    xg = x.reshape(b, g, g, c)
    # trailing unit dim keeps the mask block legal under the TPU layout
    # rule (last two block dims must divide (8, 128) or equal the array's)
    mg = mask.astype(x.dtype).reshape(b, g, g, 1)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((h, c, 3 * hd), lambda bi, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((h, 3 * hd), lambda bi, i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    pm_spec = pl.BlockSpec(pm_in.shape, lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    pb_spec = pl.BlockSpec((h, 1), lambda bi, i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((h, hd, c), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    r_total = b * nrs * nrs
    flops = r_total * h * (3 * 2 * p * c * hd + 2 * 2 * p * p * hd
                           + (2 * p * p * hd if kk else 0)
                           + 2 * p * hd * c)
    out = pl.pallas_call(
        functools.partial(_layer_kernel, heads=h, kk=kk, has_pb=has_pb,
                          mm_dtype=mmd, add_residual=add_residual, eps=eps),
        grid=(b, nrs, nrs // cb),
        in_specs=[x_spec, m_spec, vec_spec, vec_spec, wqkv_spec, b2_spec,
                  pm_spec, pb_spec, wp_spec, bp_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, g, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * nn_ * c * x.dtype.itemsize,
            transcendentals=r_total * h * p * p),
        interpret=interpret,
    )(xg, mg, ls, lb, wqkv, bqkv, pm_in, pb_in, wp, bp2)
    return out.reshape(b, nn_, c)


def _layer_bwd_kernel(x_ref, m_ref, g_ref, ls_ref, lb_ref, wqkv_ref,
                      bqkv_ref, pm_ref, pb_ref, wp_ref, eyes_ref,
                      dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                      dpw_ref, dpb_ref, dwp_ref, dbp_ref,
                      *, heads: int, kk: int, has_pb: bool, mm_dtype,
                      add_residual: bool, eps: float, unroll: bool):
    """Backward of _layer_kernel in one pass: recomputes the layer's
    forward (flash-style -- residuals are just the primals) and emits dx
    plus every parameter gradient.  HBM traffic: read x + g, write dx;
    param grads live in VMEM accumulators (constant index maps) across the
    sequential TPU grid and are flushed once at the end."""
    bi, ii, jj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _, rs, w, c = x_ref.shape
    cb = w // rs
    p = rs * rs
    hd = wp_ref.shape[1]
    n = rs * w

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dpw_ref[...] = jnp.zeros_like(dpw_ref)
        dpb_ref[...] = jnp.zeros_like(dpb_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)

    # ---- recompute the LayerNorm stream (VPU; residuals stay O(P*hd)) ----
    xin = x_ref[0]
    xf = xin.astype(jnp.float32).reshape(n, c)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    zhat = (xf - mu) * rstd
    ls = ls_ref[0][None, :]
    zs = zhat * ls + lb_ref[0][None, :]
    mflat = m_ref[0].astype(jnp.float32).reshape(n, 1)
    z = (zs * mflat).astype(mm_dtype)               # (M, C) masked tokens

    gf = g_ref[0].astype(jnp.float32).reshape(n, c)
    gm = gf * mflat                                 # d(pre-mask proj)
    gmm = gm.astype(mm_dtype)
    dbp_ref[...] += jnp.sum(gm, axis=0, keepdims=True)

    def to_regions(t):
        return t.reshape(rs, cb, rs, hd).transpose(1, 0, 2, 3) \
                .reshape(cb, p, hd)

    def to_tokens(t):
        return t.reshape(cb, rs, rs, hd).transpose(1, 0, 2, 3) \
                .reshape(n, hd)

    def head_bwd(h, dz):
        # -- forward recompute (same casts as _layer_kernel => the softmax
        # matches the primal bit-for-bit) --
        qkv = jax.lax.dot_general(
            z, wqkv_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[h][None, :]
        qb = to_regions(qkv[:, :hd])
        kb = to_regions(qkv[:, hd:2 * hd]).astype(mm_dtype)
        vb = to_regions(qkv[:, 2 * hd:]).astype(mm_dtype)
        qm = qb.astype(mm_dtype)
        if kk > 0:
            m_b = jnp.broadcast_to(pm_ref[h], (cb, p, p)).astype(mm_dtype)
            y = jax.lax.dot_general(
                m_b, qm, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            y = qb
        logits = jax.lax.dot_general(
            y.astype(mm_dtype), kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # (cb, P, P)
        if kk > 0 and has_pb:
            logits = logits + pb_ref[h, 0]
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        attn_m = attn.astype(mm_dtype)
        o = jax.lax.dot_general(
            attn_m, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # (cb, P, hd)
        o_tok = to_tokens(o).astype(mm_dtype)       # (M, hd)

        # -- output projection grads --
        dwp_ref[h] += jax.lax.dot_general(
            o_tok, gmm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (hd, C)
        d_o = jax.lax.dot_general(
            gmm, wp_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # (M, hd)
        g_o = to_regions(d_o).astype(mm_dtype)      # (cb, P, hd)

        # -- attention core backward (math of region_attn_bwd.py) --
        dv = jax.lax.dot_general(
            attn_m, g_o, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # A^T g
        da = jax.lax.dot_general(
            g_o, vb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dlc = attn * (da - jnp.sum(da * attn, axis=-1, keepdims=True))
        dlc_m = dlc.astype(mm_dtype)
        dy = jax.lax.dot_general(
            dlc_m, kb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # dLc k
        if kk > 0:
            dq = jax.lax.dot_general(
                m_b, dy.astype(mm_dtype), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # M^T dY
        else:
            dq = dy
        dk = jax.lax.dot_general(
            dlc_m, y.astype(mm_dtype), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # dLc^T Y

        if kk > 0:
            # EPEG tap grads via diagonal sums (region_attn_bwd.py:119-138)
            l_pre = jax.lax.dot_general(
                qm, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = jax.lax.dot_general(
                dlc_m, l_pre.astype(mm_dtype), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s_sum = jnp.sum(s, axis=0, keepdims=True)        # (1, P, P)
            t1 = jnp.sum(eyes_ref[...] * s_sum, axis=2)      # (kk, P)
            dw_col = jnp.sum(t1, axis=1, keepdims=True)      # (kk, 1)
            h_n = dpw_ref.shape[1]
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, h_n), 1)
                      == h).astype(jnp.float32)
            dpw_ref[...] += dw_col * onehot                  # (kk, H)
            if has_pb:
                db0 = jnp.sum(dlc, axis=0)                   # (P, P)
                db1 = jnp.sum(db0, axis=1, keepdims=True)
                dpb_ref[...] += jnp.sum(db1, axis=0,
                                        keepdims=True) * onehot

        # -- qkv projection grads + dz accumulation --
        dqkv = jnp.concatenate(
            [to_tokens(dq), to_tokens(dk), to_tokens(dv)],
            axis=-1)                                         # (M, 3hd) f32
        dbqkv_ref[pl.ds(h, 1)] += jnp.sum(dqkv, axis=0, keepdims=True)
        dqkv_m = dqkv.astype(mm_dtype)
        dwqkv_ref[h] += jax.lax.dot_general(
            z, dqkv_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (C, 3hd)
        return dz + jax.lax.dot_general(
            dqkv_m, wqkv_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (M, C)

    dz = jnp.zeros((n, c), jnp.float32)
    if unroll:
        for h in range(heads):
            dz = head_bwd(h, dz)
    else:
        dz = jax.lax.fori_loop(0, heads, head_bwd, dz)

    # ---- LayerNorm backward ----
    dzs = dz * mflat
    dls_ref[...] += jnp.sum(dzs * zhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dzs, axis=0, keepdims=True)
    dzh = dzs * ls
    m1 = jnp.mean(dzh, axis=-1, keepdims=True)
    m2 = jnp.mean(dzh * zhat, axis=-1, keepdims=True)
    dxf = rstd * (dzh - m1 - zhat * m2)
    if add_residual:
        dxf = dxf + gf
    dx_ref[0] = dxf.reshape(rs, w, c).astype(dx_ref.dtype)


def _bwd_vmem_limit_mb() -> int:
    """Scoped-vmem ceiling for the bwd kernel.  The Mosaic default (16 MB)
    is ~0.4 MB short of the bwd live set even at the smallest legal block
    on the flagship shape; v5e cores have far more physical VMEM, and
    measured on chip the kernel is fastest at the LARGEST legal block
    (cb=8: 1.03 ms/slide vs 1.18 at cb=2), so default high."""
    return int(os.environ.get("RRTMIL_LAYER_BWD_VMEM_MB", "100"))


def _pick_cb_bwd(nrs: int, rs: int, c: int, heads: int, hd: int, kk: int,
                 itemsize: int = 2) -> Optional[int]:
    env = os.environ.get("RRTMIL_LAYER_BWD_CB")
    if env:
        cap = int(env)
    else:
        p = rs * rs
        # live set ~2x the forward's: the stream has ~8 live fp32 copies
        # (xf, zhat, gf/gm, dz, dzs/dzh, temps) + x/g/dx blocks, ~8 live
        # (P, P) logit-sized tiles and ~8 per-region qkv-grad tensors;
        # halved for Mosaic buffer reuse.  Calibrated on v5e at the
        # flagship bf16 G=96/rs=12 shape: measured scoped usage 16.4 MB at
        # cb=2, and cb=8 compiles and runs fastest under a 64 MB limit.
        per_region = (p * c * (3 * itemsize + 32)
                      + 8 * p * 3 * hd * 4
                      + 8 * p * p * 4) // 2
        weights = (4 * heads * c * hd * 2        # wqkv + wp (mm dtype)
                   + heads * p * p * 4           # Toeplitz stack
                   + kk * p * p * 4              # eye stack
                   + 4 * heads * c * hd * 4      # dwqkv + dwp accumulators
                   + 6 * c * 4)
        budget = (_bwd_vmem_limit_mb() - 3) * 1024 * 1024
        cap = max(1, (budget - weights) // max(per_region, 1))
    return legal_cb(nrs, rs, cap)


def layer_bwd_fusable_geometry(nrs: int, rs: int, c: int, heads: int,
                               hd: int, kk: int, itemsize: int = 2) -> bool:
    return (c % 128 == 0
            and os.environ.get("RRTMIL_FUSED_LAYER_BWD", "1") != "0"
            and _pick_cb_bwd(nrs, rs, c, heads, hd, kk, itemsize)
            is not None)


def _layer_bwd_pallas(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb,
                      wp, bp, g, *, grid_side: int, region_size: int,
                      add_residual: bool, mm_dtype, eps: float = 1e-6,
                      interpret: Optional[bool] = None,
                      cb: Optional[int] = None):
    """Fused backward: returns grads for (x, ln_s, ln_b, wq, wk, wv, bq,
    bk, bv, pw, pb, wp, bp) given upstream g shaped like x."""
    b, nn_, c = x.shape
    gs, rs = grid_side, region_size
    nrs = gs // rs
    p = rs * rs
    h, _, hd = wq.shape
    kk = 0 if pw is None else pw.shape[1]
    has_pb = pb is not None
    mmd = jnp.dtype(mm_dtype)
    if pw is not None:
        from .region_attn import build_epeg_eyes, build_epeg_toeplitz
        pm_in = build_epeg_toeplitz(pw, p)
        eyes_in = build_epeg_eyes(kk, p)
    else:
        pm_in = jnp.zeros((h, 1, 1), jnp.float32)
        eyes_in = jnp.zeros((1, 1, 1), jnp.float32)
    pb_in = (pb if pb is not None else jnp.zeros((h,), jnp.float32))
    pb_in = pb_in.reshape(h, 1)
    wqkv = jnp.concatenate([w_.astype(mmd) for w_ in (wq, wk, wv)], axis=-1)
    bqkv = jnp.concatenate([b_.astype(jnp.float32) for b_ in (bq, bk, bv)],
                           axis=-1)
    wp_m = wp.astype(mmd)
    ls = ln_s.astype(jnp.float32).reshape(1, c)
    lb = ln_b.astype(jnp.float32).reshape(1, c)
    if cb is None:
        cb = _pick_cb_bwd(nrs, rs, c, h, hd, kk, x.dtype.itemsize)
        if cb is None:
            raise ValueError("no legal bwd decomposition (callers gate on "
                             "layer_bwd_fusable_geometry)")
    assert nrs % cb == 0, (nrs, cb)
    if interpret is None:
        interpret = env_interpret()
    # fori over heads beats the unrolled body here (0.968 vs 1.027 ms/slide
    # at the flagship shape) AND halves the remote-compile time -- unlike
    # the forward, the bwd's per-head block is big enough that Mosaic
    # schedules the rolled loop well.
    unroll = os.environ.get("RRTMIL_LAYER_BWD_UNROLL", "0") != "0"

    xg = x.reshape(b, gs, gs, c)
    gg = g.reshape(b, gs, gs, c)
    mg = mask.astype(x.dtype).reshape(b, gs, gs, 1)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((h, c, 3 * hd), lambda bi, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((h, 3 * hd), lambda bi, i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    pm_spec = pl.BlockSpec(pm_in.shape, lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    pbi_spec = pl.BlockSpec((h, 1), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((h, hd, c), lambda bi, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    eyes_spec = pl.BlockSpec(eyes_in.shape, lambda bi, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    dpw_spec = pl.BlockSpec((max(kk, 1), h), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    dpb_spec = pl.BlockSpec((1, h), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((b, gs, gs, c), x.dtype),          # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),              # dls
        jax.ShapeDtypeStruct((1, c), jnp.float32),              # dlb
        jax.ShapeDtypeStruct((h, c, 3 * hd), jnp.float32),      # dwqkv
        jax.ShapeDtypeStruct((h, 3 * hd), jnp.float32),         # dbqkv
        jax.ShapeDtypeStruct((max(kk, 1), h), jnp.float32),     # dpw^T
        jax.ShapeDtypeStruct((1, h), jnp.float32),              # dpb^T
        jax.ShapeDtypeStruct((h, hd, c), jnp.float32),          # dwp
        jax.ShapeDtypeStruct((1, c), jnp.float32),              # dbp
    )
    out_specs = (x_spec, vec_spec, vec_spec, wqkv_spec, b2_spec,
                 dpw_spec, dpb_spec, wp_spec, vec_spec)

    r_total = b * nrs * nrs
    # fwd recompute + ~2x for the grad dots
    flops = 3 * r_total * h * (3 * 2 * p * c * hd + 2 * 2 * p * p * hd
                               + (2 * p * p * hd if kk else 0)
                               + 2 * p * hd * c)
    limit_mb = _bwd_vmem_limit_mb()
    outs = pl.pallas_call(
        functools.partial(_layer_bwd_kernel, heads=h, kk=kk, has_pb=has_pb,
                          mm_dtype=mmd, add_residual=add_residual, eps=eps,
                          unroll=unroll),
        grid=(b, nrs, nrs // cb),
        in_specs=[x_spec, m_spec, x_spec, vec_spec, vec_spec, wqkv_spec,
                  b2_spec, pm_spec, pbi_spec, wp_spec, eyes_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * b * nn_ * c * x.dtype.itemsize,
            transcendentals=r_total * h * p * p),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_mb * 1024 * 1024),
        interpret=interpret,
    )(xg, mg, gg, ls, lb, wqkv, bqkv, pm_in, pb_in, wp_m, eyes_in)
    (dxg, dls, dlb, dwqkv, dbqkv, dpw_t, dpb_t, dwp, dbp) = outs

    dx = dxg.reshape(b, nn_, c)
    dwq = dwqkv[:, :, :hd].astype(wq.dtype)
    dwk = dwqkv[:, :, hd:2 * hd].astype(wk.dtype)
    dwv = dwqkv[:, :, 2 * hd:].astype(wv.dtype)
    dbq = dbqkv[:, :hd].astype(bq.dtype)
    dbk = dbqkv[:, hd:2 * hd].astype(bk.dtype)
    dbv = dbqkv[:, 2 * hd:].astype(bv.dtype)
    dpw = dpw_t.T.astype(pw.dtype) if pw is not None else None
    dpb = dpb_t[0].astype(pb.dtype) if has_pb else None
    return (dx, dls.reshape(ln_s.shape).astype(ln_s.dtype),
            dlb.reshape(ln_b.shape).astype(ln_b.dtype),
            dwq, dwk, dwv, dbq, dbk, dbv, dpw, dpb,
            dwp.astype(wp.dtype), dbp.reshape(bp.shape).astype(bp.dtype))


def _layer_ref(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp,
               *, grid_side: int, region_size: int, add_residual: bool,
               mm_dtype, eps: float = 1e-6):
    """XLA composition of the identical math (backward path: the attention
    core inside _block_ref runs the fused Pallas backward kernel)."""
    from ...ops.regions import region_partition, region_reverse

    b, nn_, c = x.shape
    g, rs = grid_side, region_size
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu)
    z = (xf - mu) * jax.lax.rsqrt(var + eps)
    z = z * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    mf = mask.astype(jnp.float32)[..., None]
    z = (z * mf).astype(jnp.dtype(mm_dtype))
    regions = region_partition(z.reshape(b, g, g, c), rs)
    y = _block_ref(regions, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp,
                   mm_dtype=mm_dtype)
    out = region_reverse(y, rs, g, g).astype(jnp.float32) * mf
    if add_residual:
        out = xf + out
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def region_layer_fused(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb,
                       wp, bp, grid_side, region_size, add_residual,
                       mm_dtype=jnp.bfloat16):
    return _layer_fwd_pallas(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv,
                             pw, pb, wp, bp, grid_side=grid_side,
                             region_size=region_size,
                             add_residual=add_residual, mm_dtype=mm_dtype)


def _fwd(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp,
         grid_side, region_size, add_residual, mm_dtype):
    out = _layer_fwd_pallas(x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv,
                            pw, pb, wp, bp, grid_side=grid_side,
                            region_size=region_size,
                            add_residual=add_residual, mm_dtype=mm_dtype)
    return out, (x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb,
                 wp, bp)


def _bwd(grid_side, region_size, add_residual, mm_dtype, residuals, g):
    (x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp) = residuals
    h, _, hd = wq.shape
    kk = 0 if pw is None else pw.shape[1]
    nrs = grid_side // region_size
    if layer_bwd_fusable_geometry(nrs, region_size, x.shape[-1], h, hd, kk,
                                  x.dtype.itemsize):
        (dx, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv, dpw, dpb, dwp,
         dbp) = _layer_bwd_pallas(
            x, mask, ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp, g,
            grid_side=grid_side, region_size=region_size,
            add_residual=add_residual, mm_dtype=mm_dtype)
        return (dx, None, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv,
                dpw, dpb, dwp, dbp)
    diff = (x, ln_s, ln_b, wq, wk, wv, bq, bk, bv, wp, bp)

    def f(x_, ls_, lb_, wq_, wk_, wv_, bq_, bk_, bv_, wp_, bp_, pw_, pb_):
        return _layer_ref(x_, mask, ls_, lb_, wq_, wk_, wv_, bq_, bk_, bv_,
                          pw_, pb_, wp_, bp_, grid_side=grid_side,
                          region_size=region_size,
                          add_residual=add_residual, mm_dtype=mm_dtype)

    if pw is None:
        fn = lambda *a: f(*a, None, None)
        _, vjp = jax.vjp(fn, *diff)
        dx, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp = vjp(g)
        return (dx, None, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv,
                None, None, dwp, dbp)
    if pb is None:
        fn = lambda *a: f(*a[:-1], a[-1], None)
        _, vjp = jax.vjp(fn, *diff, pw)
        dx, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp, dpw = vjp(g)
        return (dx, None, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv,
                dpw, None, dwp, dbp)
    _, vjp = jax.vjp(f, *diff, pw, pb)
    dx, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp, dpw, dpb = vjp(g)
    return (dx, None, dls, dlb, dwq, dwk, dwv, dbq, dbk, dbv,
            dpw, dpb, dwp, dbp)


region_layer_fused.defvjp(_fwd, _bwd)
