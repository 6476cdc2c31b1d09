"""Pallas TPU kernels for CR-MSA's per-region compress / redistribute.

CR-MSA (reference modules/rmsa.py:232-337) touches the full token stream
twice around a tiny cross-region attention: (1) compress each region to
crmsa_k representative tokens via the phi-logit dual softmax, (2)
redistribute the attended representatives back to tokens.  In XLA these are
einsums + softmaxes that stream the (R, P, C) regions through HBM ~5 times
(~2.5 ms of the batch-8 flagship forward, tools/profile_fwd.py r3); here
each side is one pallas_call that reads/writes the stream once.

compress (per region r):
    logits   = phi^T x_r^T                 (k, P)   (rmsa.py:304-307)
    combine  = softmax_P(logits)                    (rmsa.py:309)
    dispatch = softmax_k(logits)                    (rmsa.py:310)
    mm       = (logits - min_P) / (max_P - min_P + 1e-8)   (rmsa.py:312-314)
    reps_r   = combine @ x_r               (k, C)   (rmsa.py:316)
    w_r      = mm * dispatch               (k, P)   (rmsa.py:324 weights)

redistribute (per region r):
    out_r = w_r^T @ reps_att_r             (P, C)   (rmsa.py:324-325)

The cross-region attention between the two runs on (B*k, nR, C) -- tiny --
through the regular InnerAttention (itself the fused block kernel on TPU).
Both ops carry custom_vjps whose backwards differentiate the equivalent
XLA math (compress/redistribute are cheap relative to R-MSA; fwd fusion is
what matters).  The crmsa_mlp phi variant keeps the XLA path.
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


def _pick_rb(r: int, per_region_bytes: int, cap_default: int = 16) -> int:
    budget = 10 * 1024 * 1024
    cap = min(cap_default, max(1, budget // max(per_region_bytes, 1)))
    rb = 1
    for cand in range(1, min(cap, r) + 1):
        if r % cand == 0:
            rb = cand
    return rb


def _compress_kernel(x_ref, phi_ref, reps_ref, w_ref, *, mm_dtype):
    rb, p, c = x_ref.shape
    k = phi_ref.shape[0]
    x = x_ref[...]
    phi_b = jnp.broadcast_to(phi_ref[...], (rb, k, c))
    logits = jax.lax.dot_general(
        phi_b.astype(mm_dtype), x.astype(mm_dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (rb, k, P)
    combine = jax.nn.softmax(logits, axis=-1)            # over tokens
    dispatch = jax.nn.softmax(logits, axis=-2)           # over k
    lmin = jnp.min(logits, axis=-1, keepdims=True)
    lmax = jnp.max(logits, axis=-1, keepdims=True)
    mm = (logits - lmin) / (lmax - lmin + 1e-8)
    reps_ref[...] = jax.lax.dot_general(
        combine.astype(mm_dtype), x.astype(mm_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (rb, k, C)
    w_ref[...] = mm * dispatch


def _compress_ref(x, phi, *, mm_dtype):
    """XLA math (identical): x (R, P, C), phi (C, k)."""
    mmd = jnp.dtype(mm_dtype)
    logits = jnp.einsum("rpc,ck->rkp", x.astype(mmd), phi.astype(mmd),
                        preferred_element_type=jnp.float32)
    combine = jax.nn.softmax(logits, axis=-1)
    dispatch = jax.nn.softmax(logits, axis=-2)
    lmin = jnp.min(logits, axis=-1, keepdims=True)
    lmax = jnp.max(logits, axis=-1, keepdims=True)
    mm = (logits - lmin) / (lmax - lmin + 1e-8)
    reps = jnp.einsum("rkp,rpc->rkc", combine.astype(mmd), x.astype(mmd),
                      preferred_element_type=jnp.float32)
    return reps, mm * dispatch


def _compress_pallas(x, phi, *, mm_dtype, interpret: Optional[bool] = None):
    r, p, c = x.shape
    k = phi.shape[1]
    phi_t = phi.astype(jnp.float32).T                    # (k, C)
    rb = _pick_rb(r, p * c * x.dtype.itemsize * 3 + 4 * k * p * 4)
    if interpret is None:
        interpret = env_interpret()
    x_spec = pl.BlockSpec((rb, p, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    phi_spec = pl.BlockSpec((k, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((rb, k, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((rb, k, p), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_compress_kernel, mm_dtype=jnp.dtype(mm_dtype)),
        grid=(r // rb,),
        in_specs=[x_spec, phi_spec],
        out_specs=(reps_spec, w_spec),
        out_shape=(jax.ShapeDtypeStruct((r, k, c), jnp.float32),
                   jax.ShapeDtypeStruct((r, k, p), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * p * c * 2,
            bytes_accessed=r * p * c * x.dtype.itemsize,
            transcendentals=2 * r * k * p),
        interpret=interpret,
    )(x, phi_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def crmsa_compress(x, phi, mm_dtype=jnp.bfloat16):
    """x (R, P, C), phi (C, k) -> (reps (R, k, C), w (R, k, P))."""
    return _compress_pallas(x, phi, mm_dtype=mm_dtype)


def _compress_fwd(x, phi, mm_dtype):
    return _compress_pallas(x, phi, mm_dtype=mm_dtype), (x, phi)


def _compress_bwd(mm_dtype, res, g):
    x, phi = res
    _, vjp = jax.vjp(lambda x_, p_: _compress_ref(x_, p_, mm_dtype=mm_dtype),
                     x, phi)
    return vjp(g)


crmsa_compress.defvjp(_compress_fwd, _compress_bwd)


def _redistribute_kernel(w_ref, reps_ref, o_ref, *, mm_dtype):
    o_ref[...] = jax.lax.dot_general(
        w_ref[...].astype(mm_dtype), reps_ref[...].astype(mm_dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _redistribute_ref(w, reps, *, mm_dtype, out_dtype):
    mmd = jnp.dtype(mm_dtype)
    out = jnp.einsum("rkp,rkc->rpc", w.astype(mmd), reps.astype(mmd),
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _redistribute_pallas(w, reps, out_dtype, *, mm_dtype,
                         interpret: Optional[bool] = None):
    r, k, p = w.shape
    c = reps.shape[2]
    rb = _pick_rb(r, p * c * 4 * 2)
    if interpret is None:
        interpret = env_interpret()
    w_spec = pl.BlockSpec((rb, k, p), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((rb, k, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((rb, p, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_redistribute_kernel,
                          mm_dtype=jnp.dtype(mm_dtype)),
        grid=(r // rb,),
        in_specs=[w_spec, reps_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * p * c,
            bytes_accessed=r * p * c * 4,
            transcendentals=0),
        interpret=interpret,
    )(w, reps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def crmsa_redistribute(w, reps, out_dtype=jnp.float32,
                       mm_dtype=jnp.bfloat16):
    """w (R, k, P), reps (R, k, C) -> out (R, P, C)."""
    return _redistribute_pallas(w, reps, out_dtype, mm_dtype=mm_dtype)


def _redistribute_fwd(w, reps, out_dtype, mm_dtype):
    return _redistribute_pallas(w, reps, out_dtype, mm_dtype=mm_dtype), \
        (w, reps)


def _redistribute_bwd(out_dtype, mm_dtype, res, g):
    w, reps = res
    _, vjp = jax.vjp(
        lambda w_, r_: _redistribute_ref(w_, r_, mm_dtype=mm_dtype,
                                         out_dtype=out_dtype), w, reps)
    return vjp(g)


crmsa_redistribute.defvjp(_redistribute_fwd, _redistribute_bwd)


# ---------------------------------------------------------------------------
# Grid-layout variants: the whole CR-MSA TransLayer except the tiny
# cross-region attention.  compress_grid fuses LayerNorm + mask + region
# partition into the phi compression (reads the raw residual stream once);
# redistribute_grid fuses region reverse + mask + residual add into the
# redistribution (writes the post-layer stream once).  Together they remove
# the LN stream, the fp32->bf16 convert, and four HBM partition/reverse
# copies that cost ~0.2 ms/slide at batch 16 (profiler trace, round 4).
# ---------------------------------------------------------------------------


def _ln_mask(x_ref, m_ref, ls_ref, lb_ref, mm_dtype, eps):
    """Masked flax-LayerNorm of one (1, rs, w, C) block -> (M, C)."""
    _, rs, w, c = x_ref.shape
    n = rs * w
    xf = x_ref[0].astype(jnp.float32).reshape(n, c)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu)
    z = (xf - mu) * jax.lax.rsqrt(var + eps)
    z = z * ls_ref[0][None, :] + lb_ref[0][None, :]
    mflat = m_ref[0].astype(jnp.float32).reshape(n, 1)
    return (z * mflat).astype(mm_dtype), mflat


def _compress_grid_kernel(x_ref, m_ref, ls_ref, lb_ref, phi_ref,
                          reps_ref, w_ref, *, mm_dtype, eps):
    _, rs, w, c = x_ref.shape
    cb = w // rs
    p = rs * rs
    k = phi_ref.shape[0]
    z, _ = _ln_mask(x_ref, m_ref, ls_ref, lb_ref, mm_dtype, eps)
    z_r = z.reshape(rs, cb, rs, c).transpose(1, 0, 2, 3).reshape(cb, p, c)
    phi_b = jnp.broadcast_to(phi_ref[...], (cb, k, c))
    logits = jax.lax.dot_general(
        phi_b.astype(mm_dtype), z_r, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, P)
    combine = jax.nn.softmax(logits, axis=-1)
    dispatch = jax.nn.softmax(logits, axis=-2)
    lmin = jnp.min(logits, axis=-1, keepdims=True)
    lmax = jnp.max(logits, axis=-1, keepdims=True)
    mm = (logits - lmin) / (lmax - lmin + 1e-8)
    reps_ref[0, 0] = jax.lax.dot_general(
        combine.astype(mm_dtype), z_r, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, C)
    w_ref[0, 0] = mm * dispatch


def _redistribute_grid_kernel(x_ref, m_ref, w_ref, reps_ref, o_ref,
                              *, mm_dtype, add_residual: bool):
    _, rs, wd, c = x_ref.shape
    cb = wd // rs
    p = rs * rs
    out_r = jax.lax.dot_general(
        w_ref[0, 0].astype(mm_dtype), reps_ref[0, 0].astype(mm_dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, P, C)
    out = out_r.reshape(cb, rs, rs, c).transpose(1, 0, 2, 3) \
               .reshape(rs * wd, c)
    mflat = m_ref[0].astype(jnp.float32).reshape(rs * wd, 1)
    out = out * mflat
    if add_residual:
        out = x_ref[0].astype(jnp.float32).reshape(rs * wd, c) + out
    o_ref[0] = out.reshape(rs, wd, c).astype(o_ref.dtype)


def _grid_cb(nrs: int, rs: int, c: int, itemsize: int):
    """Regions per program bounded by a VMEM live-set model (the x/z/out
    slabs scale with the stream itemsize; an unbounded cb=8 at the f32
    P=196 survival shape exceeds the compiler's 16 MB scoped-vmem stack
    limit) and by the TPU block-layout legality rule (see
    region_layer.legal_cb).  None when no legal choice exists."""
    from .region_layer import legal_cb
    env = os.environ.get("RRTMIL_CRMSA_CB")
    if env:
        cap = int(env)
    else:
        p = rs * rs
        per_region = p * c * (3 * itemsize + 10)
        cap = max(1, (12 * 1024 * 1024) // max(per_region, 1))
    return legal_cb(nrs, rs, cap)


def crmsa_fusable_geometry(nrs: int, rs: int, c: int,
                           itemsize: int = 2) -> bool:
    return c % 128 == 0 and _grid_cb(nrs, rs, c, itemsize) is not None


def _compress_grid_pallas(x, mask, ln_s, ln_b, phi, *, grid_side: int,
                          region_size: int, mm_dtype, eps: float = 1e-6,
                          interpret: Optional[bool] = None):
    b, n, c = x.shape
    g, rs = grid_side, region_size
    assert n == g * g
    nrs = g // rs
    p = rs * rs
    k = phi.shape[1]
    cb = _grid_cb(nrs, rs, c, x.dtype.itemsize)
    if cb is None:
        raise ValueError(f"no legal block decomposition for grid {g}/rs "
                         f"{rs} (callers gate on crmsa_fusable_geometry)")
    if interpret is None:
        interpret = env_interpret()
    xg = x.reshape(b, g, g, c)
    mg = mask.astype(x.dtype).reshape(b, g, g, 1)
    phi_t = phi.astype(jnp.float32).T

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    phi_spec = pl.BlockSpec((k, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((1, 1, cb, k, c),
                             lambda bi, i, j: (bi, i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, cb, k, p),
                          lambda bi, i, j: (bi, i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    reps, w = pl.pallas_call(
        functools.partial(_compress_grid_kernel,
                          mm_dtype=jnp.dtype(mm_dtype), eps=eps),
        grid=(b, nrs, nrs // cb),
        in_specs=[x_spec, m_spec, vec_spec, vec_spec, phi_spec],
        out_specs=(reps_spec, w_spec),
        out_shape=(jax.ShapeDtypeStruct((b, nrs, nrs, k, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, nrs, nrs, k, p), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nrs * nrs * k * p * c * 2,
            bytes_accessed=b * n * c * x.dtype.itemsize,
            transcendentals=2 * b * nrs * nrs * k * p),
        interpret=interpret,
    )(xg, mg, ln_s.astype(jnp.float32).reshape(1, c),
      ln_b.astype(jnp.float32).reshape(1, c), phi_t)
    nr = nrs * nrs
    return reps.reshape(b, nr, k, c), w.reshape(b, nr, k, p)


def _compress_grid_ref(x, mask, ln_s, ln_b, phi, *, grid_side: int,
                       region_size: int, mm_dtype, eps: float = 1e-6):
    from ...ops.regions import region_partition

    b, n, c = x.shape
    g, rs = grid_side, region_size
    nr = (g // rs) ** 2
    k = phi.shape[1]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu)
    z = (xf - mu) * jax.lax.rsqrt(var + eps)
    z = z * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    z = (z * mask.astype(jnp.float32)[..., None]).astype(jnp.dtype(mm_dtype))
    regions = region_partition(z.reshape(b, g, g, c), rs)
    reps, w = _compress_ref(regions, phi, mm_dtype=mm_dtype)
    return reps.reshape(b, nr, k, c), w.reshape(b, nr, k, regions.shape[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def crmsa_compress_grid(x, mask, ln_s, ln_b, phi, grid_side, region_size,
                        mm_dtype=jnp.bfloat16):
    """Raw stream (B, G*G, C) + mask -> (reps (B, nR, k, C),
    w (B, nR, k, P)); LayerNorm/mask/partition fused in."""
    return _compress_grid_pallas(x, mask, ln_s, ln_b, phi,
                                 grid_side=grid_side,
                                 region_size=region_size, mm_dtype=mm_dtype)


def _cgrid_fwd(x, mask, ln_s, ln_b, phi, grid_side, region_size, mm_dtype):
    out = _compress_grid_pallas(x, mask, ln_s, ln_b, phi,
                                grid_side=grid_side,
                                region_size=region_size, mm_dtype=mm_dtype)
    return out, (x, mask, ln_s, ln_b, phi)


def _cgrid_bwd_kernel(x_ref, m_ref, ls_ref, lb_ref, phi_ref,
                      dreps_ref, dw_ref,
                      dx_ref, dls_ref, dlb_ref, dphi_ref,
                      *, mm_dtype, eps: float):
    """Fused backward of _compress_grid_kernel: recomputes the LN stream +
    phi logits + the dual softmax / min-max weights, then emits dx and the
    dls/dlb/dphi accumulators in one pass (the XLA composition streamed the
    (B, N, C) tokens ~5x per train step -- the dominant non-kernel cost in
    the r5 train trace, docs/traces/train)."""
    bi, ii, jj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _, rs, w, c = x_ref.shape
    cb = w // rs
    p = rs * rs
    k = phi_ref.shape[0]
    n = rs * w

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dphi_ref[...] = jnp.zeros_like(dphi_ref)

    # ---- recompute forward ----
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
    z = (zs * mflat).astype(mm_dtype)
    z_r = z.reshape(rs, cb, rs, c).transpose(1, 0, 2, 3).reshape(cb, p, c)
    phi_b = jnp.broadcast_to(phi_ref[...], (cb, k, c))
    logits = jax.lax.dot_general(
        phi_b.astype(mm_dtype), z_r, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, P)
    combine = jax.nn.softmax(logits, axis=-1)
    dispatch = jax.nn.softmax(logits, axis=-2)
    lmin = jnp.min(logits, axis=-1, keepdims=True)
    lmax = jnp.max(logits, axis=-1, keepdims=True)
    rng = lmax - lmin + 1e-8
    mm = (logits - lmin) / rng

    dreps = dreps_ref[0, 0].astype(jnp.float32)          # (cb, k, C)
    dw = dw_ref[0, 0].astype(jnp.float32)                # (cb, k, P)
    dreps_m = dreps.astype(mm_dtype)

    # reps = combine @ z_r
    d_comb = jax.lax.dot_general(
        dreps_m, z_r, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, P)
    dz_r = jax.lax.dot_general(
        combine.astype(mm_dtype), dreps_m, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, P, C)

    # w_out = mm * dispatch
    d_mm = dw * dispatch
    d_disp = dw * mm
    # softmax over tokens (axis -1)
    dl = combine * (d_comb - jnp.sum(d_comb * combine, axis=-1,
                                     keepdims=True))
    # softmax over k (axis -2)
    dl = dl + dispatch * (d_disp - jnp.sum(d_disp * dispatch, axis=-2,
                                           keepdims=True))
    # min-max normalization (ties split equally, matching jnp.min/max vjp)
    dl = dl + d_mm / rng
    lz = logits - lmin                                    # (cb, k, P)
    dlmin = jnp.sum(d_mm * (lz - rng), axis=-1, keepdims=True) / (rng * rng)
    dlmax = -jnp.sum(d_mm * lz, axis=-1, keepdims=True) / (rng * rng)
    eqmin = (logits == lmin).astype(jnp.float32)
    eqmax = (logits == lmax).astype(jnp.float32)
    dl = dl + dlmin * eqmin / jnp.sum(eqmin, axis=-1, keepdims=True)
    dl = dl + dlmax * eqmax / jnp.sum(eqmax, axis=-1, keepdims=True)

    dl_m = dl.astype(mm_dtype)
    # logits = phi z_r^T: dz_r += dl^T phi ; dphi += sum_r dl z_r
    dz_r = dz_r + jax.lax.dot_general(
        dl_m, phi_b, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, P, C)
    dphi_c = jax.lax.dot_general(
        dl_m, z_r, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, C)
    dphi_ref[...] += jnp.sum(dphi_c, axis=0)             # (k, C)

    # regions -> tokens, then the LayerNorm backward
    dz = dz_r.reshape(cb, rs, rs, c).transpose(1, 0, 2, 3).reshape(n, c)
    dzs = dz * mflat
    dls_ref[...] += jnp.sum(dzs * zhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dzs, axis=0, keepdims=True)
    dzh = dzs * ls
    m1 = jnp.mean(dzh, axis=-1, keepdims=True)
    m2 = jnp.mean(dzh * zhat, axis=-1, keepdims=True)
    dxf = rstd * (dzh - m1 - zhat * m2)
    dx_ref[0] = dxf.reshape(rs, w, c).astype(dx_ref.dtype)


def _cgrid_bwd_pallas(x, mask, ln_s, ln_b, phi, dreps, dw, *,
                      grid_side: int, region_size: int, mm_dtype,
                      eps: float = 1e-6,
                      interpret: Optional[bool] = None):
    b, n, c = x.shape
    g, rs = grid_side, region_size
    nrs = g // rs
    p = rs * rs
    k = phi.shape[1]
    cb = _grid_cb(nrs, rs, c, x.dtype.itemsize)
    if interpret is None:
        interpret = env_interpret()
    xg = x.reshape(b, g, g, c)
    mg = mask.astype(x.dtype).reshape(b, g, g, 1)
    phi_t = phi.astype(jnp.float32).T
    drg = dreps.reshape(b, nrs, nrs, k, c)
    dwg = dw.reshape(b, nrs, nrs, k, p)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    phi_spec = pl.BlockSpec((k, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((1, 1, cb, k, c),
                             lambda bi, i, j: (bi, i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, cb, k, p),
                          lambda bi, i, j: (bi, i, j, 0, 0),
                          memory_space=pltpu.VMEM)

    dx, dls, dlb, dphi_t = pl.pallas_call(
        functools.partial(_cgrid_bwd_kernel, mm_dtype=jnp.dtype(mm_dtype),
                          eps=eps),
        grid=(b, nrs, nrs // cb),
        in_specs=[x_spec, m_spec, vec_spec, vec_spec, phi_spec, reps_spec,
                  w_spec],
        out_specs=(x_spec, vec_spec, vec_spec, phi_spec),
        out_shape=(jax.ShapeDtypeStruct((b, g, g, c), x.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((k, c), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * nrs * nrs * k * p * c,
            bytes_accessed=2 * b * n * c * x.dtype.itemsize,
            transcendentals=2 * b * nrs * nrs * k * p),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xg, mg, ln_s.astype(jnp.float32).reshape(1, c),
      ln_b.astype(jnp.float32).reshape(1, c), phi_t, drg, dwg)
    return (dx.reshape(b, n, c),
            dls.reshape(ln_s.shape).astype(ln_s.dtype),
            dlb.reshape(ln_b.shape).astype(ln_b.dtype),
            dphi_t.T.astype(phi.dtype))


def _cgrid_bwd(grid_side, region_size, mm_dtype, res, g):
    x, mask, ln_s, ln_b, phi = res
    nrs = grid_side // region_size
    if (os.environ.get("RRTMIL_FUSED_CRMSA_BWD", "1") != "0"
            and crmsa_fusable_geometry(nrs, region_size, x.shape[-1],
                                       x.dtype.itemsize)):
        dreps, dw = g
        dx, dls, dlb, dphi = _cgrid_bwd_pallas(
            x, mask, ln_s, ln_b, phi, dreps, dw, grid_side=grid_side,
            region_size=region_size, mm_dtype=mm_dtype)
        return dx, None, dls, dlb, dphi
    _, vjp = jax.vjp(
        lambda x_, ls_, lb_, p_: _compress_grid_ref(
            x_, mask, ls_, lb_, p_, grid_side=grid_side,
            region_size=region_size, mm_dtype=mm_dtype),
        x, ln_s, ln_b, phi)
    dx, dls, dlb, dphi = vjp(g)
    return dx, None, dls, dlb, dphi


crmsa_compress_grid.defvjp(_cgrid_fwd, _cgrid_bwd)


def _redistribute_grid_pallas(x, mask, w, reps, *, grid_side: int,
                              region_size: int, add_residual: bool,
                              mm_dtype,
                              interpret: Optional[bool] = None):
    b, n, c = x.shape
    g, rs = grid_side, region_size
    nrs = g // rs
    p = rs * rs
    k = w.shape[2]
    cb = _grid_cb(nrs, rs, c, x.dtype.itemsize)
    if cb is None:
        raise ValueError(f"no legal block decomposition for grid {g}/rs "
                         f"{rs} (callers gate on crmsa_fusable_geometry)")
    if interpret is None:
        interpret = env_interpret()
    xg = x.reshape(b, g, g, c)
    mg = mask.astype(x.dtype).reshape(b, g, g, 1)
    wg = w.reshape(b, nrs, nrs, k, p)
    rg = reps.reshape(b, nrs, nrs, k, c)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, cb, k, p),
                          lambda bi, i, j: (bi, i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((1, 1, cb, k, c),
                             lambda bi, i, j: (bi, i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_redistribute_grid_kernel,
                          mm_dtype=jnp.dtype(mm_dtype),
                          add_residual=add_residual),
        grid=(b, nrs, nrs // cb),
        in_specs=[x_spec, m_spec, w_spec, reps_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, g, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nrs * nrs * k * p * c,
            bytes_accessed=2 * b * n * c * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xg, mg, wg, rg)
    return out.reshape(b, n, c)


def _redistribute_grid_ref(x, mask, w, reps, *, grid_side: int,
                           region_size: int, add_residual: bool, mm_dtype):
    from ...ops.regions import region_reverse

    b, n, c = x.shape
    g, rs = grid_side, region_size
    nr = (g // rs) ** 2
    p = rs * rs
    y = _redistribute_ref(w.reshape(b * nr, w.shape[2], p),
                          reps.reshape(b * nr, reps.shape[2], c),
                          mm_dtype=mm_dtype, out_dtype=jnp.float32)
    out = region_reverse(y, rs, g, g).astype(jnp.float32)
    out = out * mask.astype(jnp.float32)[..., None]
    if add_residual:
        out = x.astype(jnp.float32) + out
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def crmsa_redistribute_grid(x, mask, w, reps, grid_side, region_size,
                            add_residual, mm_dtype=jnp.bfloat16):
    """(B, nR, k, P) weights + attended reps -> post-layer stream
    (B, G*G, C); reverse/mask/residual fused in."""
    return _redistribute_grid_pallas(x, mask, w, reps, grid_side=grid_side,
                                     region_size=region_size,
                                     add_residual=add_residual,
                                     mm_dtype=mm_dtype)


def _rgrid_fwd(x, mask, w, reps, grid_side, region_size, add_residual,
               mm_dtype):
    out = _redistribute_grid_pallas(x, mask, w, reps, grid_side=grid_side,
                                    region_size=region_size,
                                    add_residual=add_residual,
                                    mm_dtype=mm_dtype)
    return out, (x, mask, w, reps)


def _rgrid_bwd_kernel(g_ref, m_ref, w_ref, reps_ref, dw_ref, dreps_ref,
                      *, mm_dtype):
    """Backward of _redistribute_grid_kernel: out_r = w^T reps (masked,
    reversed, + residual).  dx is the upstream g itself (handled by the
    wrapper); here one pass computes dw = reps . g_r and dreps = w . g_r."""
    _, rs, wd, c = g_ref.shape
    cb = wd // rs
    p = rs * rs
    mflat = m_ref[0].astype(jnp.float32).reshape(rs * wd, 1)
    gm = (g_ref[0].astype(jnp.float32).reshape(rs * wd, c)
          * mflat).astype(mm_dtype)
    g_r = gm.reshape(rs, cb, rs, c).transpose(1, 0, 2, 3).reshape(cb, p, c)
    dw_ref[0, 0] = jax.lax.dot_general(
        reps_ref[0, 0].astype(mm_dtype), g_r, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, P)
    dreps_ref[0, 0] = jax.lax.dot_general(
        w_ref[0, 0].astype(mm_dtype), g_r, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, C)


def _rgrid_bwd_pallas(mask, w, reps, g, *, grid_side: int,
                      region_size: int, mm_dtype,
                      interpret: Optional[bool] = None):
    b, n, c = g.shape
    gs, rs = grid_side, region_size
    nrs = gs // rs
    p = rs * rs
    k = w.shape[2]
    cb = _grid_cb(nrs, rs, c, g.dtype.itemsize)
    if interpret is None:
        interpret = env_interpret()
    gg = g.reshape(b, gs, gs, c)
    mg = mask.astype(g.dtype).reshape(b, gs, gs, 1)
    wg = w.reshape(b, nrs, nrs, k, p)
    rg = reps.reshape(b, nrs, nrs, k, c)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, cb, k, p),
                          lambda bi, i, j: (bi, i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((1, 1, cb, k, c),
                             lambda bi, i, j: (bi, i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    dw, dreps = pl.pallas_call(
        functools.partial(_rgrid_bwd_kernel, mm_dtype=jnp.dtype(mm_dtype)),
        grid=(b, nrs, nrs // cb),
        in_specs=[x_spec, m_spec, w_spec, reps_spec],
        out_specs=(w_spec, reps_spec),
        out_shape=(jax.ShapeDtypeStruct((b, nrs, nrs, k, p), jnp.float32),
                   jax.ShapeDtypeStruct((b, nrs, nrs, k, c), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nrs * nrs * k * p * c,
            bytes_accessed=b * n * c * g.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(gg, mg, wg, rg)
    nr = nrs * nrs
    return dw.reshape(b, nr, k, p), dreps.reshape(b, nr, k, c)


def _rgrid_bwd(grid_side, region_size, add_residual, mm_dtype, res, g):
    x, mask, w, reps = res
    nrs = grid_side // region_size
    if (os.environ.get("RRTMIL_FUSED_CRMSA_BWD", "1") != "0"
            and crmsa_fusable_geometry(nrs, region_size, x.shape[-1],
                                       x.dtype.itemsize)):
        dw, dreps = _rgrid_bwd_pallas(mask, w, reps, g,
                                      grid_side=grid_side,
                                      region_size=region_size,
                                      mm_dtype=mm_dtype)
        dx = g.astype(x.dtype) if add_residual else jnp.zeros_like(x)
        return dx, None, dw.astype(w.dtype), dreps.astype(reps.dtype)
    _, vjp = jax.vjp(
        lambda x_, w_, r_: _redistribute_grid_ref(
            x_, mask, w_, r_, grid_side=grid_side, region_size=region_size,
            add_residual=add_residual, mm_dtype=mm_dtype),
        x, w, reps)
    dx, dw, dreps = vjp(g)
    return dx, None, dw, dreps


crmsa_redistribute_grid.defvjp(_rgrid_fwd, _rgrid_bwd)


# ---------------------------------------------------------------------------
# Final-LayerNorm-fused redistribute: the CR-MSA layer is the LAST encoder
# layer (reference modules/rrt.py:133-202 orders (n_layers-1) R-MSA ->
# CR-MSA -> norm), so the encoder's final LayerNorm + mask can ride the
# redistribution's single stream write instead of paying its own
# read+write pass.  The round-4 trace pinned that pass
# (convert_reduce_fusion: the final LN + fp32 converts) at 0.66 ms/iter at
# batch 16 -- the last unfused stream op and the cause of the b4->b16
# throughput droop (VERDICT r4 weak #3).  Output is fp32: pooling and the
# head consume fp32, so this also replaces the bf16->fp32 convert.
# ---------------------------------------------------------------------------


def _rgrid_ln_kernel(*refs, mm_dtype, eps: float, has_sc: bool):
    if has_sc:
        (x_ref, m_ref, w_ref, reps_ref, ls_ref, lb_ref, sc_ref,
         o_ref) = refs
    else:
        x_ref, m_ref, w_ref, reps_ref, ls_ref, lb_ref, o_ref = refs
    _, rs, wd, c = x_ref.shape
    cb = wd // rs
    p = rs * rs
    n = rs * wd
    out_r = jax.lax.dot_general(
        w_ref[0, 0].astype(mm_dtype), reps_ref[0, 0].astype(mm_dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, P, C)
    out = out_r.reshape(cb, rs, rs, c).transpose(1, 0, 2, 3).reshape(n, c)
    mflat = m_ref[0].astype(jnp.float32).reshape(n, 1)
    out = x_ref[0].astype(jnp.float32).reshape(n, c) + out * mflat
    if has_sc:
        # the encoder's global shortcut (all_shortcut, rrt.py:192-193)
        # joins the stream between the layer and the final norm
        out = out + sc_ref[0].astype(jnp.float32).reshape(n, c)
    mu = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(out * out, axis=-1, keepdims=True)
                      - mu * mu)
    z = (out - mu) * jax.lax.rsqrt(var + eps)
    z = z * ls_ref[0][None, :] + lb_ref[0][None, :]
    o_ref[0] = (z * mflat).reshape(rs, wd, c).astype(o_ref.dtype)


def _rgrid_ln_pallas(x, mask, w, reps, ln_s, ln_b, shortcut=None, *,
                     grid_side: int,
                     region_size: int, mm_dtype, eps: float = 1e-6,
                     interpret: Optional[bool] = None):
    b, n, c = x.shape
    g, rs = grid_side, region_size
    nrs = g // rs
    p = rs * rs
    k = w.shape[2]
    cb = _grid_cb(nrs, rs, c, x.dtype.itemsize)
    if cb is None:
        raise ValueError(f"no legal block decomposition for grid {g}/rs "
                         f"{rs} (callers gate on crmsa_fusable_geometry)")
    if interpret is None:
        interpret = env_interpret()
    xg = x.reshape(b, g, g, c)
    mg = mask.astype(x.dtype).reshape(b, g, g, 1)
    wg = w.reshape(b, nrs, nrs, k, p)
    rg = reps.reshape(b, nrs, nrs, k, c)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, cb, k, p),
                          lambda bi, i, j: (bi, i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((1, 1, cb, k, c),
                             lambda bi, i, j: (bi, i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    has_sc = shortcut is not None
    ins = [xg, mg, wg, rg, ln_s.astype(jnp.float32).reshape(1, c),
           ln_b.astype(jnp.float32).reshape(1, c)]
    in_specs = [x_spec, m_spec, w_spec, reps_spec, vec_spec, vec_spec]
    if has_sc:
        ins.append(shortcut.reshape(b, g, g, c))
        in_specs.append(pl.BlockSpec((1, rs, cb * rs, c),
                                     lambda bi, i, j: (bi, i, j, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_rgrid_ln_kernel, mm_dtype=jnp.dtype(mm_dtype),
                          eps=eps, has_sc=has_sc),
        grid=(b, nrs, nrs // cb),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, g, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nrs * nrs * k * p * c,
            bytes_accessed=b * n * c * (x.dtype.itemsize + 4),
            transcendentals=b * n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return out.reshape(b, n, c)


def _rgrid_ln_ref(x, mask, w, reps, ln_s, ln_b, shortcut=None, *,
                  grid_side: int,
                  region_size: int, mm_dtype, eps: float = 1e-6):
    out = _redistribute_grid_ref(x, mask, w, reps, grid_side=grid_side,
                                 region_size=region_size, add_residual=True,
                                 mm_dtype=mm_dtype).astype(jnp.float32)
    if shortcut is not None:
        out = out + shortcut.astype(jnp.float32)
    mu = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(out * out, axis=-1, keepdims=True)
                      - mu * mu)
    z = (out - mu) * jax.lax.rsqrt(var + eps)
    z = z * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    return z * mask.astype(jnp.float32)[..., None]


def _rgrid_ln_bwd_kernel(*refs, mm_dtype, eps: float, has_sc: bool):
    """Backward of _rgrid_ln_kernel in one pass: recomputes the post-layer
    stream (w^T reps is tiny: k~3 representatives), runs the LayerNorm
    backward, and emits dx plus dw/dreps and the dls/dlb accumulators.
    With the global shortcut present its cotangent equals dx (both enter
    the normed sum additively), so the wrapper reuses dx for it."""
    if has_sc:
        (x_ref, m_ref, w_ref, reps_ref, ls_ref, lb_ref, sc_ref, g_ref,
         dx_ref, dw_ref, dreps_ref, dls_ref, dlb_ref) = refs
    else:
        (x_ref, m_ref, w_ref, reps_ref, ls_ref, lb_ref, g_ref,
         dx_ref, dw_ref, dreps_ref, dls_ref, dlb_ref) = refs
    bi, ii, jj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _, rs, wd, c = x_ref.shape
    cb = wd // rs
    p = rs * rs
    n = rs * wd

    @pl.when((bi == 0) & (ii == 0) & (jj == 0))
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    # ---- recompute the forward stream ----
    out_r = jax.lax.dot_general(
        w_ref[0, 0].astype(mm_dtype), reps_ref[0, 0].astype(mm_dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, P, C)
    red = out_r.reshape(cb, rs, rs, c).transpose(1, 0, 2, 3).reshape(n, c)
    mflat = m_ref[0].astype(jnp.float32).reshape(n, 1)
    out = x_ref[0].astype(jnp.float32).reshape(n, c) + red * mflat
    if has_sc:
        out = out + sc_ref[0].astype(jnp.float32).reshape(n, c)
    mu = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(out * out, axis=-1, keepdims=True)
                      - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    zhat = (out - mu) * rstd
    ls = ls_ref[0][None, :]

    # ---- LayerNorm backward (y = LN(out) * mask) ----
    gym = g_ref[0].astype(jnp.float32).reshape(n, c) * mflat
    dls_ref[...] += jnp.sum(gym * zhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(gym, axis=0, keepdims=True)
    dzh = gym * ls
    m1 = jnp.mean(dzh, axis=-1, keepdims=True)
    m2 = jnp.mean(dzh * zhat, axis=-1, keepdims=True)
    g_out = rstd * (dzh - m1 - zhat * m2)                # d(out)
    dx_ref[0] = g_out.reshape(rs, wd, c).astype(dx_ref.dtype)

    # ---- redistribution backward (d redist = g_out * mask) ----
    gm = (g_out * mflat).astype(mm_dtype)
    g_r = gm.reshape(rs, cb, rs, c).transpose(1, 0, 2, 3).reshape(cb, p, c)
    dw_ref[0, 0] = jax.lax.dot_general(
        reps_ref[0, 0].astype(mm_dtype), g_r, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, P)
    dreps_ref[0, 0] = jax.lax.dot_general(
        w_ref[0, 0].astype(mm_dtype), g_r, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (cb, k, C)


def _rgrid_ln_bwd_pallas(x, mask, w, reps, ln_s, ln_b, g, shortcut=None, *,
                         grid_side: int,
                         region_size: int, mm_dtype, eps: float = 1e-6,
                         interpret: Optional[bool] = None):
    b, n, c = x.shape
    gs, rs = grid_side, region_size
    nrs = gs // rs
    p = rs * rs
    k = w.shape[2]
    cb = _grid_cb(nrs, rs, c, x.dtype.itemsize)
    if interpret is None:
        interpret = env_interpret()
    xg = x.reshape(b, gs, gs, c)
    gg = g.astype(jnp.float32).reshape(b, gs, gs, c)
    mg = mask.astype(x.dtype).reshape(b, gs, gs, 1)
    wg = w.reshape(b, nrs, nrs, k, p)
    rg = reps.reshape(b, nrs, nrs, k, c)

    x_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, rs, cb * rs, c), lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, rs, cb * rs, 1),
                          lambda bi, i, j: (bi, i, j, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 1, cb, k, p),
                          lambda bi, i, j: (bi, i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    reps_spec = pl.BlockSpec((1, 1, cb, k, c),
                             lambda bi, i, j: (bi, i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    has_sc = shortcut is not None
    ins = [xg, mg, wg, rg, ln_s.astype(jnp.float32).reshape(1, c),
           ln_b.astype(jnp.float32).reshape(1, c)]
    in_specs = [x_spec, m_spec, w_spec, reps_spec, vec_spec, vec_spec]
    if has_sc:
        ins.append(shortcut.reshape(b, gs, gs, c))
        in_specs.append(pl.BlockSpec((1, rs, cb * rs, c),
                                     lambda bi, i, j: (bi, i, j, 0),
                                     memory_space=pltpu.VMEM))
    ins.append(gg)
    in_specs.append(g_spec)
    dx, dw, dreps, dls, dlb = pl.pallas_call(
        functools.partial(_rgrid_ln_bwd_kernel,
                          mm_dtype=jnp.dtype(mm_dtype), eps=eps,
                          has_sc=has_sc),
        grid=(b, nrs, nrs // cb),
        in_specs=in_specs,
        out_specs=(x_spec, w_spec, reps_spec, vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((b, gs, gs, c), x.dtype),
                   jax.ShapeDtypeStruct((b, nrs, nrs, k, p), jnp.float32),
                   jax.ShapeDtypeStruct((b, nrs, nrs, k, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * nrs * nrs * k * p * c,
            bytes_accessed=b * n * c * (2 * x.dtype.itemsize + 4),
            transcendentals=b * n),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    nr = nrs * nrs
    return (dx.reshape(b, n, c), dw.reshape(b, nr, k, p),
            dreps.reshape(b, nr, k, c),
            dls.reshape(ln_s.shape).astype(ln_s.dtype),
            dlb.reshape(ln_b.shape).astype(ln_b.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def crmsa_redistribute_grid_ln(x, mask, w, reps, ln_s, ln_b, shortcut,
                               grid_side, region_size,
                               mm_dtype=jnp.bfloat16):
    """Redistribution + residual (+ optional global shortcut) + the
    ENCODER-FINAL LayerNorm + mask in one kernel; returns the fp32
    encoder output stream (pooling input).  The layer residual is always
    applied (the final norm follows the full layer)."""
    return _rgrid_ln_pallas(x, mask, w, reps, ln_s, ln_b, shortcut,
                            grid_side=grid_side, region_size=region_size,
                            mm_dtype=mm_dtype)


def _rgrid_ln_fwd(x, mask, w, reps, ln_s, ln_b, shortcut, grid_side,
                  region_size, mm_dtype):
    out = _rgrid_ln_pallas(x, mask, w, reps, ln_s, ln_b, shortcut,
                           grid_side=grid_side, region_size=region_size,
                           mm_dtype=mm_dtype)
    return out, (x, mask, w, reps, ln_s, ln_b, shortcut)


def _rgrid_ln_bwd(grid_side, region_size, mm_dtype, res, g):
    x, mask, w, reps, ln_s, ln_b, shortcut = res
    nrs = grid_side // region_size
    if (os.environ.get("RRTMIL_FUSED_CRMSA_BWD", "1") != "0"
            and crmsa_fusable_geometry(nrs, region_size, x.shape[-1],
                                       x.dtype.itemsize)):
        dx, dw, dreps, dls, dlb = _rgrid_ln_bwd_pallas(
            x, mask, w, reps, ln_s, ln_b, g, shortcut, grid_side=grid_side,
            region_size=region_size, mm_dtype=mm_dtype)
        dsc = None if shortcut is None else dx.astype(shortcut.dtype)
        return (dx, None, dw.astype(w.dtype), dreps.astype(reps.dtype),
                dls, dlb, dsc)
    if shortcut is None:
        _, vjp = jax.vjp(
            lambda x_, w_, r_, ls_, lb_: _rgrid_ln_ref(
                x_, mask, w_, r_, ls_, lb_, None, grid_side=grid_side,
                region_size=region_size, mm_dtype=mm_dtype),
            x, w, reps, ln_s, ln_b)
        dx, dw, dreps, dls, dlb = vjp(g)
        return dx, None, dw, dreps, dls, dlb, None
    _, vjp = jax.vjp(
        lambda x_, w_, r_, ls_, lb_, sc_: _rgrid_ln_ref(
            x_, mask, w_, r_, ls_, lb_, sc_, grid_side=grid_side,
            region_size=region_size, mm_dtype=mm_dtype),
        x, w, reps, ln_s, ln_b, shortcut)
    dx, dw, dreps, dls, dlb, dsc = vjp(g)
    return dx, None, dw, dreps, dls, dlb, dsc


crmsa_redistribute_grid_ln.defvjp(_rgrid_ln_fwd, _rgrid_ln_bwd)
