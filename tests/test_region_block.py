"""Fully-fused region-block kernel (qkv + EPEG attention + proj in one
pallas_call, ops/pallas/region_block.py): parity vs the XLA InnerAttention
path in interpret mode, forward AND gradients, plus param-tree
interchangeability between the fused and Dense-based paths."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmil_tpu.config import EPEGConfig, InnerAttentionConfig
from rrtmil_tpu.models.rrt import InnerAttention
from rrtmil_tpu.ops.pallas.region_block import (_block_fwd_pallas,
                                                _block_ref,
                                                region_block_fused)


def _weights(c=512, h=8, hd=64, kk=15, seed=0, scale=None):
    key = jax.random.PRNGKey(seed)
    scale = hd ** -0.5 if scale is None else scale
    mk = lambda i, shape, s=0.05: (
        jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32) * s)
    wq, wk, wv = mk(0, (h, c, hd)), mk(1, (h, c, hd)), mk(2, (h, c, hd))
    bq, bk, bv = mk(3, (h, hd)), mk(4, (h, hd)), mk(5, (h, hd))
    pw = mk(6, (h, kk), 0.1) if kk else None
    pb = mk(7, (h,), 0.1) if kk else None
    wp = mk(8, (h, hd, c))
    bp = mk(9, (c,))
    return (wq * scale, wk, wv, bq * scale, bk, bv, pw, pb, wp, bp)


@pytest.mark.parametrize("kk", [15, 0])
def test_block_kernel_matches_ref(kk):
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"   # _block_ref's inner
    try:                                          # attention kernel too
        x = jax.random.normal(jax.random.PRNGKey(42), (4, 144, 512),
                              jnp.float32)
        args = _weights(kk=kk)
        got = _block_fwd_pallas(x, *args, mm_dtype=jnp.float32,
                                interpret=True)
        want = _block_ref(x, *args, mm_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


def test_block_kernel_bf16_close():
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 144, 512),
                              jnp.bfloat16)
        args = _weights()
        got = _block_fwd_pallas(x, *args, mm_dtype=jnp.bfloat16,
                                interpret=True)
        want = _block_ref(x, *args, mm_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=0.15, rtol=0.1)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


@pytest.mark.parametrize("kk", [15, 0])
def test_block_custom_vjp_gradients(kk):
    """Gradients of the fused block (XLA-recompute backward built on the
    fused attention bwd kernel) vs jax.grad of the pure-XLA reference."""
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 512),
                              jnp.float32)
        args = _weights(kk=kk, seed=5)

        def loss_fused(x, *a):
            return region_block_fused(x, *a, jnp.float32).sum()

        def loss_ref(x, *a):
            return _block_ref(x, *a, mm_dtype=jnp.float32).sum()

        if kk == 0:
            grads_f = jax.grad(loss_fused, argnums=(0, 1, 4, 9, 10))(x, *args)
            grads_r = jax.grad(loss_ref, argnums=(0, 1, 4, 9, 10))(x, *args)
        else:
            grads_f = jax.grad(loss_fused,
                               argnums=(0, 1, 4, 7, 9, 10))(x, *args)
            grads_r = jax.grad(loss_ref,
                               argnums=(0, 1, 4, 7, 9, 10))(x, *args)
        for gf, gr in zip(grads_f, grads_r):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=5e-4, rtol=5e-4)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


def _module_out(x, backend, block_env, cfg_kw=None, params=None):
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    os.environ["RRTMIL_FUSED_BLOCK"] = block_env
    try:
        cfg = InnerAttentionConfig(
            dim=512, num_heads=8, backend=backend,
            mm_dtype="float32",
            epeg=EPEGConfig(enabled=True, k=9),
            **(cfg_kw or {}))
        mod = InnerAttention(cfg)
        if params is None:
            params = mod.init({"params": jax.random.PRNGKey(0)}, x,
                              deterministic=True)["params"]
        out = mod.apply({"params": params}, x, deterministic=True)
        return np.asarray(out), params
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        del os.environ["RRTMIL_FUSED_BLOCK"]


def test_inner_attention_block_path_matches_xla_module():
    """The module-level fused-block path must equal the XLA module path on
    the SAME params (tree interchangeability + numerics)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 100, 512), jnp.float32)
    want, params = _module_out(x, "xla", "0")
    got, params2 = _module_out(x, "pallas", "1", params=params)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # identical param trees from both paths' init
    t1 = jax.tree_util.tree_structure(params)
    _, params3 = _module_out(x, "pallas", "1")
    t2 = jax.tree_util.tree_structure(params3)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   err_msg="init values must match across "
                                           "fused/Dense paths")


def test_inner_attention_block_path_old_kernel_fallback():
    """RRTMIL_FUSED_BLOCK=0 must route to the round-2 attention-only kernel
    with identical results."""
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 100, 512), jnp.float32)
    want, params = _module_out(x, "pallas", "0")
    got, _ = _module_out(x, "pallas", "1", params=params)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# CR-MSA compress / redistribute kernels (ops/pallas/crmsa_kernels.py)
# ---------------------------------------------------------------------------

def test_crmsa_kernels_match_ref():
    from rrtmil_tpu.ops.pallas.crmsa_kernels import (
        _compress_pallas, _compress_ref, _redistribute_pallas,
        _redistribute_ref)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 144, 512), jnp.float32)
    phi = jax.random.normal(jax.random.fold_in(key, 1), (512, 3)) * 0.1
    reps, w = _compress_pallas(x, phi, mm_dtype=jnp.float32, interpret=True)
    reps_r, w_r = _compress_ref(x, phi, mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(reps), np.asarray(reps_r),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_r),
                               atol=2e-5, rtol=1e-5)
    out = _redistribute_pallas(w, reps, jnp.float32, mm_dtype=jnp.float32,
                               interpret=True)
    out_r = _redistribute_ref(w_r, reps_r, mm_dtype=jnp.float32,
                              out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               atol=2e-5, rtol=1e-5)


def test_crmsa_kernel_gradients():
    from rrtmil_tpu.ops.pallas.crmsa_kernels import (
        _compress_ref, _redistribute_ref, crmsa_compress,
        crmsa_redistribute)
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (4, 64, 512), jnp.float32)
        phi = jax.random.normal(jax.random.fold_in(key, 1), (512, 3)) * 0.1

        def loss_fused(x, phi):
            reps, w = crmsa_compress(x, phi, jnp.float32)
            return crmsa_redistribute(w, reps, jnp.float32,
                                      jnp.float32).sum()

        def loss_ref(x, phi):
            reps, w = _compress_ref(x, phi, mm_dtype=jnp.float32)
            return _redistribute_ref(w, reps, mm_dtype=jnp.float32,
                                     out_dtype=jnp.float32).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1))(x, phi)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, phi)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


def test_crmsa_module_fused_matches_xla():
    """CrossRegionAttention through the fused kernels must equal the XLA
    path on the same params (k in {1, 3}, same geometry semantics)."""
    from rrtmil_tpu.config import CRMSAConfig, RegionConfig
    from rrtmil_tpu.models.rrt import CrossRegionAttention
    for kk in (1, 3):
        cfg = CRMSAConfig(
            attn=InnerAttentionConfig(dim=512, num_heads=8, backend="xla",
                                      mm_dtype="float32"),
            region=RegionConfig(region_num=8), crmsa_k=kk)
        x = jax.random.normal(jax.random.PRNGKey(kk), (1, 937, 512),
                              jnp.float32)
        mod = CrossRegionAttention(cfg)
        params = mod.init({"params": jax.random.PRNGKey(0)}, x,
                          length=937, deterministic=True)["params"]
        want = np.asarray(mod.apply({"params": params}, x, length=937,
                                    deterministic=True))
        os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
        os.environ["RRTMIL_FUSED_CRMSA"] = "1"
        try:
            import dataclasses
            cfg_p = dataclasses.replace(
                cfg, attn=dataclasses.replace(cfg.attn, backend="pallas"))
            got = np.asarray(CrossRegionAttention(cfg_p).apply(
                {"params": params}, x, length=937, deterministic=True))
        finally:
            del os.environ["RRTMIL_PALLAS_INTERPRET"]
            del os.environ["RRTMIL_FUSED_CRMSA"]
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4,
                                   err_msg=f"crmsa_k={kk}")


def test_crmsa_module_fused_batch2_and_heads1():
    """Fused CR-MSA at batch 2 and with crmsa_heads=1 (hd=512, the
    nsclc_plip/brca_r50 configs) must match the XLA path."""
    import dataclasses
    from rrtmil_tpu.config import CRMSAConfig, RegionConfig
    from rrtmil_tpu.models.rrt import CrossRegionAttention
    cfg = CRMSAConfig(
        attn=InnerAttentionConfig(dim=512, num_heads=1, head_dim=512,
                                  backend="xla", mm_dtype="float32"),
        region=RegionConfig(region_num=8), crmsa_k=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 500, 512), jnp.float32)
    mod = CrossRegionAttention(cfg)
    params = mod.init({"params": jax.random.PRNGKey(0)}, x, length=500,
                      deterministic=True)["params"]
    want = np.asarray(mod.apply({"params": params}, x, length=500,
                                deterministic=True))
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg_p = dataclasses.replace(
            cfg, attn=dataclasses.replace(cfg.attn, backend="pallas"))
        got = np.asarray(CrossRegionAttention(cfg_p).apply(
            {"params": params}, x, length=500, deterministic=True))
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_block_path_no_qkv_bias():
    """qkv_bias=False (--qkv_bias store_false): the fused block path must
    create the same bias-free tree as nn.Dense and match the XLA path."""
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 100, 512), jnp.float32)
    want, params = _module_out(x, "xla", "0", cfg_kw={"qkv_bias": False})
    got, _ = _module_out(x, "pallas", "1", cfg_kw={"qkv_bias": False},
                         params=params)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    assert "bias" not in params["qkv"]
