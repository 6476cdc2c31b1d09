"""Pallas TPU kernel: fully-fused per-region attention block.

Fuses the ENTIRE InnerAttention body (reference modules/rmsa.py:56-134) --
qkv projection, scaled-dot-product logits, EPEG (k,1) depthwise conv on the
logit map, softmax, AV, and the output projection -- into one kernel over
region blocks:

    y = proj( softmax((z Wq + bq) s (z Wk + bk)^T + conv_k(L) + pb)
              (z Wv + bv) ) Wp + bp

Why: the round-2 design ran only logits+conv+softmax+AV in Pallas; XLA then
materialized the (R, P, 3*H*hd) qkv tensor, a 5-D head transpose, the
(R, H, P, hd) kernel operands/outputs and the reverse transpose in HBM --
~4.3 ms of the 7.4 ms R-MSA layer at the batch-8 flagship shape (profiled
in tools/profile_fwd.py, VERDICT r3).  Here every intermediate lives in
VMEM; HBM traffic is one read of z and one write of y plus weights (DMA'd
once thanks to constant index maps).

Layout: per-head weight slices are pre-arranged OUTSIDE the kernel
(Wq/Wk/Wv: (H, C, hd); Wproj: (H, hd, C)) so the kernel's per-head compute
is plain 2-D dots -- (rb*P, C) @ (C, hd) keeps the full C=512 contraction
on the MXU for the FLOP-dominant projections, and no channel slicing of
activations (a lane-dim relayout) ever happens in VMEM.  The q scale is
folded into Wq/bq by the caller (exact: s*(zW+b) = z(sW) + sb).

The public wrapper `region_block_fused` carries a custom_vjp whose backward
is the XLA composition of the same math built on region_attention_fused --
so the attention core of the backward still runs the fused Pallas bwd
kernel (region_attn_bwd.py) while XLA differentiates the projections.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .region_attn import env_interpret, region_attention_fused


def _block_kernel(x_ref, wqkv_ref, bqkv_ref,
                  pm_ref, pb_ref, wp_ref, bp_ref, o_ref,
                  *, heads: int, kk: int, has_pb: bool, mm_dtype,
                  unroll: bool):
    rb, p, c = x_ref.shape
    hd = wp_ref.shape[1]
    z2 = x_ref[...].reshape(rb * p, c).astype(mm_dtype)

    def head_attn(h):
        """One head's attention output, (rb*P, hd) fp32.

        q/k/v come from ONE merged dot against the (C, 3*hd) per-head
        weight slab: N=192 output columns keep the MXU ~75% busy where
        round 3's three separate N=64 dots ran it at 50% (the qkv
        projections are ~60% of the kernel's FLOPs)."""
        qkv = jax.lax.dot_general(
            z2, wqkv_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[h][None, :]
        q = qkv[:, :hd]
        k = qkv[:, hd:2 * hd]
        v = qkv[:, 2 * hd:]
        qb = q.reshape(rb, p, hd)
        if kk > 0:
            # EPEG as ONE batched MXU dot: the (k,1) conv over the query
            # axis of the logit map is a banded Toeplitz matrix T_h, and
            # conv(q k^T) = (T_h q) k^T, so applying M_h = I + T_h
            # (precomputed by the wrapper) to q replaces the k-tap VPU
            # shift-and-add over the logit tile (~1.5 ms/layer at the
            # flagship batch-8 shape) with an O(P^2 hd) matmul.
            m_b = jnp.broadcast_to(pm_ref[h], (rb, p, p))
            qb = jax.lax.dot_general(
                m_b.astype(mm_dtype), qb.astype(mm_dtype),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        kb = k.reshape(rb, p, hd).astype(mm_dtype)
        logits = jax.lax.dot_general(
            qb.astype(mm_dtype), kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (rb, P, P)
        if kk > 0 and has_pb:
            # pe_bias is key-constant (softmax-shift-invariant, zero-grad
            # in the reference too) but added for bit-parity with the
            # conv-on-logits formulation
            logits = logits + pb_ref[h, 0]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            attn.astype(mm_dtype), v.reshape(rb, p, hd).astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (rb, P, hd)
        return o.reshape(rb * p, hd)

    if unroll:
        # Unrolled heads let the output projection run as ONE
        # (rb*P, H*hd) @ (H*hd, C) dot with the full K=512 contraction on
        # the MXU instead of H accumulated K=64 dots (50% utilization).
        o_all = jnp.concatenate(
            [head_attn(h).astype(mm_dtype) for h in range(heads)], axis=-1)
        out = jax.lax.dot_general(
            o_all, wp_ref[...].reshape(heads * hd, c),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bp_ref[...]
    else:
        # fori fallback (dynamic leading-dim weight indexing): much
        # smaller Mosaic program, kept for configs where the unrolled
        # compile is prohibitive through a remote compiler.
        def head_body(h, acc):
            return acc + jax.lax.dot_general(
                head_attn(h).astype(mm_dtype), wp_ref[h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, heads, head_body,
                                jnp.zeros((rb * p, c), jnp.float32))
        out = acc + bp_ref[...]
    o_ref[...] = out.reshape(rb, p, c).astype(o_ref.dtype)


def _pick_rb_block(r: int, p: int, c: int, heads: int, hd: int,
                   itemsize: int = 2) -> int:
    """Regions per program bounded by a VMEM model: z in/out (stream
    dtype!), mm-cast copy, fp32 acc, ~5 live (P, P) fp32 logit tiles, and
    per-head operands; weights DMA'd once.  Calibrated on v5e: fp32 stream
    at rb=8 measured 17.5 MB scoped (OOM), bf16 at rb=8 fits."""
    import os
    env = os.environ.get("RRTMIL_BLOCK_RB")
    if env:
        cap = int(env)
    else:
        per_region = (p * c * (2 * itemsize + 2 + 4)  # z in/out + cast + acc
                      + 5 * p * p * 4                 # live logit tiles
                      + 6 * p * hd * 4)               # q/k/v fp32 + casts
        weights = 3 * heads * c * hd * 2 + heads * hd * c * 2
        budget = 12 * 1024 * 1024 - weights
        cap = max(1, budget // max(per_region, 1))
    rb = 1
    for cand in range(1, min(cap, r) + 1):
        if r % cand == 0:
            rb = cand
    return rb


def _block_fwd_pallas(x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp, *,
                      mm_dtype, interpret: Optional[bool] = None,
                      rb: Optional[int] = None):
    """x: (R, P, C); wq/wk/wv: (H, C, hd) [wq,bq pre-scaled]; bq/bk/bv:
    (H, hd); pw: (H, kk) or None; pb: (H,) or None; wp: (H, hd, C);
    bp: (C,).  Returns (R, P, C) in x.dtype."""
    r, p, c = x.shape
    h, _, hd = wq.shape
    kk = 0 if pw is None else pw.shape[1]
    has_pb = pb is not None
    if pw is not None:
        # M_h = I + T_h: Toeplitz form of the (k,1) query-axis conv
        # (tap t of pe[i] reads logit row i + t - k//2)
        pad = kk // 2
        eyes = jnp.stack([jnp.eye(p, k=t - pad, dtype=jnp.float32)
                          for t in range(kk)])
        pm_in = jnp.eye(p, dtype=jnp.float32)[None] + jnp.einsum(
            "hk,kij->hij", pw.astype(jnp.float32), eyes)
    else:
        pm_in = jnp.zeros((h, 1, 1), jnp.float32)
    pb_in = (pb if pb is not None else jnp.zeros((h,), jnp.float32))
    pb_in = pb_in.reshape(h, 1)
    mmd = jnp.dtype(mm_dtype)
    # merged per-head qkv slab (H, C, 3*hd): one N=3*hd dot per head
    wqkv = jnp.concatenate([w.astype(mmd) for w in (wq, wk, wv)], axis=-1)
    bqkv = jnp.concatenate([b.astype(jnp.float32) for b in (bq, bk, bv)],
                           axis=-1)
    wp = wp.astype(mmd)
    bp2 = bp.astype(jnp.float32).reshape(1, c)
    if rb is None:
        rb = _pick_rb_block(r, p, c, h, hd, x.dtype.itemsize)
    assert r % rb == 0, (r, rb)
    if interpret is None:
        interpret = env_interpret()
    import os
    unroll = os.environ.get("RRTMIL_BLOCK_UNROLL", "1") != "0"

    x_spec = pl.BlockSpec((rb, p, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((h, c, 3 * hd), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((h, hd, c), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((h, 3 * hd), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    pm_spec = pl.BlockSpec(pm_in.shape, lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    pb_spec = pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)

    flops = r * h * (3 * 2 * p * c * hd        # qkv
                     + 2 * 2 * p * p * hd      # logits + AV
                     + (2 * p * p * hd if kk else 0)  # EPEG Toeplitz dot
                     + 2 * p * hd * c)         # proj
    return pl.pallas_call(
        functools.partial(_block_kernel, heads=h, kk=kk, has_pb=has_pb,
                          mm_dtype=mmd, unroll=unroll),
        grid=(r // rb,),
        in_specs=[x_spec, wqkv_spec, b2_spec, pm_spec, pb_spec, wp_spec,
                  bp_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * r * p * c * x.dtype.itemsize
            + (4 * h * c * hd) * mmd.itemsize,
            transcendentals=r * h * p * p),
        interpret=interpret,
    )(x, wqkv, bqkv, pm_in, pb_in, wp, bp2)


def _block_ref(x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp, *, mm_dtype):
    """XLA composition of the identical math (the attention core goes
    through region_attention_fused, so differentiating THIS function runs
    the fused Pallas backward kernel for the attention part)."""
    r, p, c = x.shape
    h = wq.shape[0]
    mmd = jnp.dtype(mm_dtype)
    z = x.astype(mmd)

    def heads_proj(w, b):
        y = jnp.einsum("rpc,hcd->rhpd", z, w.astype(mmd),
                       preferred_element_type=jnp.float32)
        return y + b.astype(jnp.float32)[None, :, None, :]

    q = heads_proj(wq, bq)
    k = heads_proj(wk, bk)
    v = heads_proj(wv, bv)
    # scale already folded into wq/bq by the caller
    out = region_attention_fused(q.astype(mmd), k.astype(mmd),
                                 v.astype(mmd), pw, pb, 1.0, mmd)
    y = jnp.einsum("rhpd,hdc->rpc", out.astype(mmd), wp.astype(mmd),
                   preferred_element_type=jnp.float32)
    y = y + bp.astype(jnp.float32)[None, None, :]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def region_block_fused(x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp,
                       mm_dtype=jnp.bfloat16):
    return _block_fwd_pallas(x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp,
                             mm_dtype=mm_dtype)


def _fwd(x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp, mm_dtype):
    out = _block_fwd_pallas(x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp,
                            mm_dtype=mm_dtype)
    return out, (x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp)


def _bwd(mm_dtype, residuals, g):
    x, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp = residuals
    diff_args = (x, wq, wk, wv, bq, bk, bv, wp, bp)

    def f(x_, wq_, wk_, wv_, bq_, bk_, bv_, wp_, bp_, pw_, pb_):
        return _block_ref(x_, wq_, wk_, wv_, bq_, bk_, bv_, pw_, pb_,
                          wp_, bp_, mm_dtype=mm_dtype)

    if pw is None:
        fn = lambda *a: f(*a, None, None)
        out, vjp = jax.vjp(fn, *diff_args)
        dx, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp = vjp(g)
        return (dx, dwq, dwk, dwv, dbq, dbk, dbv, None, None, dwp, dbp)
    if pb is None:
        fn = lambda *a: f(*a[:-1], a[-1], None)
        out, vjp = jax.vjp(fn, *diff_args, pw)
        dx, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp, dpw = vjp(g)
        return (dx, dwq, dwk, dwv, dbq, dbk, dbv, dpw, None, dwp, dbp)
    out, vjp = jax.vjp(f, *diff_args, pw, pb)
    dx, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp, dpw, dpb = vjp(g)
    return (dx, dwq, dwk, dwv, dbq, dbk, dbv, dpw, dpb, dwp, dbp)


region_block_fused.defvjp(_fwd, _bwd)
