"""Fused region-attention Pallas kernel: math parity vs. the XLA path
(interpret mode on CPU; the same kernel is compile-tested on TPU by bench.py
and used automatically by InnerAttention there)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmil_tpu.ops.pallas.region_attn import (_fused_fwd_pallas,
                                               _fused_fwd_xla,
                                               region_attention_fused)


def _inputs(r=4, h=8, p=144, hd=64, kk=15, seed=0):
    key = jax.random.PRNGKey(seed)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (r, h, p, hd),
                                 jnp.float32) for i in range(3))
    w = jax.random.normal(jax.random.fold_in(key, 3), (h, kk)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 4), (h,)) * 0.1
    return q, k, v, w, b


@pytest.mark.parametrize("kk", [15, 9, 21, 1])
def test_kernel_matches_xla_with_epeg(kk):
    q, k, v, w, b = _inputs(kk=kk)
    ref = _fused_fwd_xla(q, k, v, w, b, scale=0.125)
    got = _fused_fwd_pallas(q, k, v, w, b, scale=0.125, interpret=True,
                            mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_kernel_matches_xla_no_epeg():
    q, k, v, _, _ = _inputs()
    ref = _fused_fwd_xla(q, k, v, None, None, scale=0.125)
    got = _fused_fwd_pallas(q, k, v, None, None, scale=0.125, interpret=True,
                            mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_kernel_xla_path_matches_conv_formulation():
    """The tap-sum formulation must equal the lax.conv EPEG used by the
    non-fused InnerAttention path."""
    from rrtmil_tpu.ops.epeg import epeg_logit_conv
    q, k, v, w, b = _inputs(r=2)
    logits = jnp.einsum("rhid,rhjd->rhij", q * 0.125, k)
    kernel_hwio = w.T[:, None, None, :]        # (kk,1,1,H)
    pe_conv = epeg_logit_conv(logits, kernel_hwio, b, w.shape[1], False)

    kk = w.shape[1]
    pad = kk // 2
    padded = jnp.pad(logits, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    pe_taps = sum(w[None, :, t, None, None] *
                  jax.lax.slice_in_dim(padded, t, t + logits.shape[2], axis=2)
                  for t in range(kk)) + b[None, :, None, None]
    np.testing.assert_allclose(np.asarray(pe_taps), np.asarray(pe_conv),
                               atol=1e-5)


def test_custom_vjp_gradients():
    """Backward (XLA vjp) must match differentiating the XLA forward."""
    q, k, v, w, b = _inputs(r=2, p=64)

    def loss_fused(q, k, v, w, b):
        return region_attention_fused(q, k, v, w, b, 0.125,
                                      jnp.float32).sum()

    def loss_xla(q, k, v, w, b):
        return _fused_fwd_xla(q, k, v, w, b, scale=0.125).sum()

    # interpret mode for the pallas fwd inside grad
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, w, b)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, w, b)
    for a, c in zip(g_fused, g_xla):
        # 3e-4: the Toeplitz-form dw (diagonal sums of a P^3 matmul)
        # reassociates the fp32 tap reductions
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-4)


@pytest.mark.parametrize("kk", [9, 15, 0])
def test_bwd_kernel_matches_vjp(kk):
    """Fused backward kernel vs jax.vjp of the XLA forward."""
    from rrtmil_tpu.ops.pallas.region_attn_bwd import region_attention_bwd_pallas
    q, k, v, w, b = _inputs(r=3, p=64, hd=32, kk=max(kk, 1))
    if kk == 0:
        w = b = None
    g = jax.random.normal(jax.random.PRNGKey(9), q.shape)
    scale = 32 ** -0.5

    args = (q, k, v) if kk == 0 else (q, k, v, w, b)
    def f(*a):
        if kk == 0:
            return _fused_fwd_xla(a[0], a[1], a[2], None, None, scale=scale)
        return _fused_fwd_xla(*a, scale=scale)
    _, vjp = jax.vjp(f, *args)
    refs = vjp(g)
    outs = region_attention_bwd_pallas(q, k, v, w, b, g, scale=scale,
                                       interpret=True, mm_dtype=jnp.float32)
    names = ["dq", "dk", "dv", "dw", "db"]
    for name, got, want in zip(names, outs, list(refs) + [None, None]):
        if got is None:
            continue
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, err_msg=name)


@pytest.mark.parametrize("kk", [15, 9, 1])
def test_epeg_fold_matches_conv_on_logits(kk):
    """epeg_fold_q: conv_q(qs) @ k^T == conv_q(qs @ k^T) -- the algebraic
    identity that lets InnerAttention run the plain kk=0 kernel (fwd AND
    gradients, including dw through the fold)."""
    from rrtmil_tpu.ops.epeg import epeg_fold_q
    q, k, v, w, b = _inputs(r=2, p=64, kk=kk)
    scale = 0.125

    def loss_ref(q, k, v, w):
        # bias omitted: key-constant, cancels in the row softmax
        return (_fused_fwd_xla(q, k, v, w, None, scale=scale) * v).sum()

    def loss_fold(q, k, v, w):
        qf = q + epeg_fold_q(q, w)
        return (_fused_fwd_xla(qf, k, v, None, None, scale=scale) * v).sum()

    ref = _fused_fwd_xla(q, k, v, w, b, scale=scale)
    got = _fused_fwd_xla(q + epeg_fold_q(q, w), k, v, None, None, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, w)
    g_fold = jax.grad(loss_fold, argnums=(0, 1, 2, 3))(q, k, v, w)
    for a, c in zip(g_fold, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-4)


def test_inner_attention_fold_matches_unfolded_module(monkeypatch):
    """InnerAttention with epeg_fold on/off: same params, same output
    (pallas backend, interpret mode)."""
    import dataclasses
    from rrtmil_tpu.config import EPEGConfig, InnerAttentionConfig
    from rrtmil_tpu.models.rrt import InnerAttention

    monkeypatch.setenv("RRTMIL_PALLAS_INTERPRET", "1")
    base = InnerAttentionConfig(
        dim=64, num_heads=4, backend="pallas", mm_dtype="float32",
        epeg=EPEGConfig(enabled=True, k=9, bias=True))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 36, 64))
    m_fold = InnerAttention(dataclasses.replace(base, epeg_fold=True))
    m_ref = InnerAttention(dataclasses.replace(base, epeg_fold=False))
    params = m_ref.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    ref = m_ref.apply({"params": params}, x)
    got = m_fold.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)


def test_tiny_region_epeg_taps_exceed_tokens():
    """P=4 tokens with epeg_k=15: taps reaching past the region contribute
    only conv zero-padding (torch Conv2d semantics).  Round-3 regression:
    _shift_q built (P+|d|)-row tensors when |d| >= P, breaking every
    small-bucket geometry once epeg_fold defaulted off."""
    q, k, v, w, b = _inputs(r=4, h=2, p=4, hd=8, kk=15)
    got = _fused_fwd_pallas(q, k, v, w, b, scale=0.125, interpret=True,
                            mm_dtype=jnp.float32)
    want = _fused_fwd_xla(q, k, v, w, b, scale=0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    # backward too
    from rrtmil_tpu.ops.pallas.region_attn_bwd import (
        region_attention_bwd_pallas)
    g = jnp.ones_like(q)
    dq, dk, dv, dw, db = region_attention_bwd_pallas(
        q, k, v, w, b, g, scale=0.125, interpret=True,
        mm_dtype=jnp.float32)
    def loss(q, k, v, w, b):
        return _fused_fwd_xla(q, k, v, w, b, scale=0.125).sum()
    gr = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, w, b)
    for a, r in zip((dq, dk, dv, dw, db), gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=5e-4)
