"""Sequence-parallel correctness: the shard_map forward over the region
axis must match the single-device model bit-for-fp32-bit."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmil_tpu.config import RRTEncoderConfig, RRTMILConfig
from rrtmil_tpu.models import RRTMIL
from rrtmil_tpu.parallel.mesh import make_mesh
from rrtmil_tpu.parallel.seqshard import (check_shardable,
                                          make_seqshard_forward,
                                          make_seqshard_train_step)
from rrtmil_tpu.train.losses import cross_entropy
from rrtmil_tpu.train.optim import make_optimizer


def _cfg(input_dim=32, region_num=16):
    return RRTMILConfig(
        input_dim=input_dim, dropout=0.0,
        encoder=RRTEncoderConfig(region_num=region_num, epeg_k=9, crmsa_k=3,
                                 dropout=0.0))


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_seqshard_forward_matches_single_device(sp):
    if len(jax.devices()) < sp:
        pytest.skip("not enough devices")
    cfg = _cfg()
    # length whose unified grid (mult of 16) matches both layers' grids
    length = 1000            # ceil(sqrt)=32 -> rmsa grid 32, crmsa grid 32
    n_pad = check_shardable(length, dataclasses.replace(
        cfg.encoder, sp_shards=sp, sp_axis="sp"), sp)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, n_pad, cfg.input_dim), jnp.float32)
    mask = (jnp.arange(n_pad) < length)[None]
    ref_model = RRTMIL(cfg)
    params = ref_model.init({"params": key}, x, mask=mask, length=length,
                            deterministic=True)["params"]
    ref = ref_model.apply({"params": params}, x, mask=mask, length=length,
                          deterministic=True)

    mesh = make_mesh(dp=1, sp=sp, devices=jax.devices()[:sp])
    _, fwd, n_pad2 = make_seqshard_forward(cfg, mesh, length)
    assert n_pad2 == n_pad
    with mesh:
        got = fwd(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_seqshard_train_step_matches_single_device():
    cfg = _cfg()
    length = 1000
    sp = 4
    mesh = make_mesh(dp=2, sp=sp)
    tx = make_optimizer("adam", 1e-5)

    n_pad = check_shardable(length, dataclasses.replace(
        cfg.encoder, sp_shards=sp, sp_axis="sp"), sp)
    key = jax.random.PRNGKey(0)
    batch = 2
    x = jax.random.normal(key, (batch, n_pad, cfg.input_dim), jnp.float32)
    mask = jnp.broadcast_to((jnp.arange(n_pad) < length)[None],
                            (batch, n_pad))
    labels = jnp.asarray([0, 1], jnp.int32)

    ref_model = RRTMIL(cfg)
    params = ref_model.init({"params": key, "dropout": key}, x[:1],
                            mask=mask[:1], length=length,
                            deterministic=True)["params"]

    def ref_loss(p):
        logits = ref_model.apply({"params": p}, x, mask=mask, length=length,
                                 deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(7)})
        return cross_entropy(logits, labels)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)

    from rrtmil_tpu.train.engine import TrainState
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    _, step, _ = make_seqshard_train_step(cfg, mesh, length, tx,
                                          cross_entropy)
    with mesh:
        new_state, l_sh = step(state, x, mask, labels, jnp.float32(2e-4),
                               jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=3e-5)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(new_state.params)[0])).all()


def test_seqshard_with_fused_pallas_kernels(monkeypatch):
    """The fused Pallas fwd+bwd kernels (interpret mode on the CPU mesh)
    compose with shard_map sequence sharding: sp forward and train-step loss
    match the single-device model running the SAME kernels."""
    monkeypatch.setenv("RRTMIL_PALLAS_INTERPRET", "1")
    cfg = _cfg(region_num=8)
    # fp32 MXU inputs: the sharding comparison is exact (bf16 would add
    # rounding-cliff noise unrelated to the collectives under test)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, backend="pallas",
                                         mm_dtype="float32"))
    length = 1000            # grid 32, rs=4: P=16 tokens per region
    sp = 4
    if len(jax.devices()) < sp:
        pytest.skip("not enough devices")
    n_pad = check_shardable(length, dataclasses.replace(
        cfg.encoder, sp_shards=sp, sp_axis="sp"), sp)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, n_pad, cfg.input_dim), jnp.float32)
    mask = (jnp.arange(n_pad) < length)[None]
    labels = jnp.asarray([0], jnp.int32)

    ref_model = RRTMIL(cfg)
    params = ref_model.init({"params": key}, x, mask=mask, length=length,
                            deterministic=True)["params"]
    ref = ref_model.apply({"params": params}, x, mask=mask, length=length,
                          deterministic=True)

    def ref_loss(p):
        logits = ref_model.apply({"params": p}, x, mask=mask, length=length,
                                 deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(7)})
        return cross_entropy(logits, labels)

    l_ref, g_ref = jax.value_and_grad(ref_loss)(params)

    mesh = make_mesh(dp=1, sp=sp, devices=jax.devices()[:sp])
    _, fwd, _ = make_seqshard_forward(cfg, mesh, length)
    from rrtmil_tpu.parallel.seqshard import make_seqshard_value_and_grad
    _, vag, _ = make_seqshard_value_and_grad(cfg, mesh, length, cross_entropy)
    with mesh:
        got = fwd(params, x, mask)
        l_sh, g_sh = jax.jit(vag)(params, x, mask, labels,
                                  jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=3e-5)

    # the fused Pallas BACKWARD under shard_map: psum-reduced param grads
    # must match single-device grads
    flat_sh = jax.tree_util.tree_leaves_with_path(g_sh)
    flat_ref = jax.tree.leaves(g_ref)
    for (path, a), b in zip(flat_sh, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_check_shardable_rejects_misaligned():
    cfg = dataclasses.replace(_cfg().encoder, region_num=8, sp_shards=16,
                              sp_axis="sp")
    with pytest.raises(ValueError):
        # grid 16 with rs=2 cannot split across 16 shards in whole
        # region-rows
        check_shardable(200, cfg, 16)
