"""Fused whole-TransLayer kernel (ops/pallas/region_layer.py): parity vs
the unfused TransLayer path in interpret mode -- forward, gradients, param
trees, and the train-mode no-residual variant."""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmil_tpu.config import RRTEncoderConfig
from rrtmil_tpu.models.rrt import TransLayer
from rrtmil_tpu.ops.pallas.region_layer import (_layer_fwd_pallas,
                                                _layer_ref)


def _weights(c=512, h=8, hd=64, kk=9, seed=0):
    key = jax.random.PRNGKey(seed)
    mk = lambda i, shape, s=0.05: (
        jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32) * s)
    scale = hd ** -0.5
    wq, wk, wv = mk(0, (h, c, hd)), mk(1, (h, c, hd)), mk(2, (h, c, hd))
    bq, bk, bv = mk(3, (h, hd)), mk(4, (h, hd)), mk(5, (h, hd))
    pw = mk(6, (h, kk), 0.1) if kk else None
    pb = mk(7, (h,), 0.1) if kk else None
    wp = mk(8, (h, hd, c))
    bp = mk(9, (c,))
    ln_s = 1.0 + mk(10, (c,), 0.1)
    ln_b = mk(11, (c,), 0.1)
    return (ln_s, ln_b, wq * scale, wk, wv, bq * scale, bk, bv, pw, pb,
            wp, bp)


@pytest.mark.parametrize("kk,add_residual", [(9, True), (9, False),
                                             (0, True)])
def test_layer_kernel_matches_ref(kk, add_residual):
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        g, rs = 16, 8                       # 2x2 regions of P=64 tokens
        b = 2
        x = jax.random.normal(jax.random.PRNGKey(42), (b, g * g, 512),
                              jnp.float32)
        mask = jnp.arange(g * g)[None] < 200
        mask = jnp.broadcast_to(mask, (b, g * g))
        args = _weights(kk=kk)
        got = _layer_fwd_pallas(x, mask, *args, grid_side=g, region_size=rs,
                                add_residual=add_residual,
                                mm_dtype=jnp.float32, interpret=True)
        want = _layer_ref(x, mask, *args, grid_side=g, region_size=rs,
                          add_residual=add_residual, mm_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


def _translayer_cfg():
    enc = RRTEncoderConfig(epeg_k=9, crmsa_k=1, backend="pallas")
    return enc.rmsa_layer()


def _inputs(b=2, length=150, c=512, seed=3):
    # length 150 -> grid 16 (ceil(sqrt)=13 -> pad to mult of 8) -> N=256
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (b, 256, c), jnp.float32)
    mask = jnp.broadcast_to(jnp.arange(256)[None] < length, (b, 256))
    x = x * mask[..., None]
    return x, mask, length


def test_translayer_fused_path_matches_unfused():
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _translayer_cfg()
        layer = TransLayer(cfg)
        x, mask, length = _inputs()
        params = layer.init({"params": jax.random.PRNGKey(0)}, x, mask=mask,
                            length=length, deterministic=True)["params"]
        fused = layer.apply({"params": params}, x, mask=mask, length=length,
                            deterministic=True)
        os.environ["RRTMIL_FUSED_LAYER"] = "0"
        unfused = layer.apply({"params": params}, x, mask=mask,
                              length=length, deterministic=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=5e-5, rtol=1e-4)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_FUSED_LAYER", None)


def test_translayer_fused_param_tree_and_init_match():
    """The fused path's parameter SHELLS must produce the identical tree
    (paths, shapes, values) as the unfused modules, so checkpoints are
    interchangeable and init is bit-identical."""
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _translayer_cfg()
        layer = TransLayer(cfg)
        x, mask, length = _inputs()
        p_fused = layer.init({"params": jax.random.PRNGKey(7)}, x,
                             mask=mask, length=length,
                             deterministic=True)["params"]
        os.environ["RRTMIL_FUSED_LAYER"] = "0"
        p_unfused = layer.init({"params": jax.random.PRNGKey(7)}, x,
                               mask=mask, length=length,
                               deterministic=True)["params"]
        flat_f = jax.tree_util.tree_flatten_with_path(p_fused)[0]
        flat_u = jax.tree_util.tree_flatten_with_path(p_unfused)[0]
        assert [k for k, _ in flat_f] == [k for k, _ in flat_u]
        for (k, a), (_, b) in zip(flat_f, flat_u):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(k))
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_FUSED_LAYER", None)


def test_translayer_fused_grads_match():
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _translayer_cfg()
        layer = TransLayer(cfg)
        x, mask, length = _inputs(b=1)
        params = layer.init({"params": jax.random.PRNGKey(0)}, x, mask=mask,
                            length=length, deterministic=True)["params"]

        def loss(p, x):
            out = layer.apply({"params": p}, x, mask=mask, length=length,
                              deterministic=True)
            return (out.astype(jnp.float32) ** 2).mean()

        gf_p, gf_x = jax.grad(loss, argnums=(0, 1))(params, x)
        os.environ["RRTMIL_FUSED_LAYER"] = "0"
        gu_p, gu_x = jax.grad(loss, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gu_x),
                                   atol=1e-4, rtol=1e-3)
        for (k, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(gf_p)[0],
                jax.tree_util.tree_flatten_with_path(gu_p)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
                err_msg=str(k))
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_FUSED_LAYER", None)


@pytest.mark.parametrize("kk,add_residual,unroll",
                         [(9, True, True), (9, False, True), (0, True, True),
                          (9, True, False)])
def test_layer_bwd_kernel_matches_vjp(kk, add_residual, unroll):
    """Fused Pallas layer backward (r5): every gradient -- dx, LN, qkv,
    EPEG taps, out-proj -- must match jax.vjp of the XLA composition at
    fp32 tolerance.  dbk/dpb are mathematically zero (key-constant logit
    shifts cancel in the row softmax), so both sides return only fp noise
    there -- compared with atol."""
    from rrtmil_tpu.ops.pallas.region_layer import _layer_bwd_pallas
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    if not unroll:
        os.environ["RRTMIL_LAYER_BWD_UNROLL"] = "0"
    try:
        g_side, rs, b = 16, 8, 2
        x = jax.random.normal(jax.random.PRNGKey(42), (b, g_side * g_side,
                                                       512), jnp.float32)
        mask = jnp.broadcast_to(jnp.arange(g_side * g_side)[None] < 200,
                                (b, g_side * g_side))
        args = _weights(kk=kk)
        (ln_s, ln_b, wq, wk, wv, bq, bk, bv, pw, pb, wp, bp) = args
        g_out = jax.random.normal(jax.random.PRNGKey(7), x.shape,
                                  jnp.float32) * 0.1

        def f(x_, ls_, lb_, wq_, wk_, wv_, bq_, bk_, bv_, wp_, bp_,
              pw_=None, pb_=None):
            return _layer_ref(x_, mask, ls_, lb_, wq_, wk_, wv_, bq_, bk_,
                              bv_, pw_, pb_, wp_, bp_, grid_side=g_side,
                              region_size=rs, add_residual=add_residual,
                              mm_dtype=jnp.float32)

        diff = (x, ln_s, ln_b, wq, wk, wv, bq, bk, bv, wp, bp)
        if pw is None:
            _, vjp = jax.vjp(f, *diff)
            w_ = vjp(g_out)
            want = w_[:9] + (None, None) + w_[9:]
        else:
            _, vjp = jax.vjp(f, *diff, pw, pb)
            w_ = vjp(g_out)
            want = w_[:9] + (w_[11], w_[12]) + (w_[9], w_[10])

        got = _layer_bwd_pallas(x, mask, *args, g_out, grid_side=g_side,
                                region_size=rs, add_residual=add_residual,
                                mm_dtype=jnp.float32, interpret=True)
        names = ["dx", "dls", "dlb", "dwq", "dwk", "dwv", "dbq", "dbk",
                 "dbv", "dpw", "dpb", "dwp", "dbp"]
        for nm, gg, ww in zip(names, got, want):
            if ww is None:
                assert gg is None, nm
                continue
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       atol=5e-5, rtol=1e-3, err_msg=nm)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_LAYER_BWD_UNROLL", None)


def test_translayer_train_mode_applies_dropout_outside():
    """With proj-dropout active the kernel returns the no-residual branch;
    train-mode output must differ from eval and stay finite."""
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _translayer_cfg()
        assert cfg.rmsa.attn.proj_dropout > 0
        layer = TransLayer(cfg)
        x, mask, length = _inputs(b=1)
        params = layer.init({"params": jax.random.PRNGKey(0)}, x, mask=mask,
                            length=length, deterministic=True)["params"]
        out_tr = layer.apply({"params": params}, x, mask=mask, length=length,
                             deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(5)})
        out_ev = layer.apply({"params": params}, x, mask=mask, length=length,
                             deterministic=True)
        assert np.isfinite(np.asarray(out_tr)).all()
        assert np.abs(np.asarray(out_tr) - np.asarray(out_ev)).max() > 1e-6
        # pad rows carry no new mass: residual stream stays equal to x there
        pad = ~np.asarray(mask[0])
        np.testing.assert_allclose(np.asarray(out_tr)[0, pad],
                                   np.asarray(x)[0, pad], atol=1e-6)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


def test_crmsa_grid_bwd_kernels_match_vjp():
    """Fused CR-MSA grid backwards (r5): compress (LN+phi dual-softmax
    min-max) and redistribute grads vs jax.vjp of the XLA composition."""
    from rrtmil_tpu.ops.pallas import crmsa_kernels as CK
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        g_side, rs, b, c, k = 16, 8, 2, 512, 3
        nrs = g_side // rs
        p = rs * rs
        nr = nrs * nrs
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, g_side * g_side, c), jnp.float32)
        mask = jnp.broadcast_to(jnp.arange(g_side * g_side)[None] < 200,
                                (b, g_side * g_side))
        ls = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (c,))
        lb = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (c,))
        phi = 0.3 * jax.random.normal(jax.random.fold_in(key, 3), (c, k))
        dreps = 0.1 * jax.random.normal(jax.random.fold_in(key, 4),
                                        (b, nr, k, c))
        dwg = 0.1 * jax.random.normal(jax.random.fold_in(key, 5),
                                      (b, nr, k, p))

        _, vjp = jax.vjp(lambda x_, ls_, lb_, p_: CK._compress_grid_ref(
            x_, mask, ls_, lb_, p_, grid_side=g_side, region_size=rs,
            mm_dtype=jnp.float32), x, ls, lb, phi)
        want = vjp((dreps, dwg))
        got = CK._cgrid_bwd_pallas(x, mask, ls, lb, phi, dreps, dwg,
                                   grid_side=g_side, region_size=rs,
                                   mm_dtype=jnp.float32, interpret=True)
        for nm, gg, ww in zip(["dx", "dls", "dlb", "dphi"], got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       atol=5e-5, rtol=1e-3, err_msg=nm)

        w_in = jax.nn.softmax(jax.random.normal(jax.random.fold_in(key, 6),
                                                (b, nr, k, p)))
        reps_in = jax.random.normal(jax.random.fold_in(key, 7),
                                    (b, nr, k, c))
        gout = 0.1 * jax.random.normal(jax.random.fold_in(key, 8), x.shape)
        _, vjp2 = jax.vjp(lambda x_, w_, r_: CK._redistribute_grid_ref(
            x_, mask, w_, r_, grid_side=g_side, region_size=rs,
            add_residual=True, mm_dtype=jnp.float32), x, w_in, reps_in)
        wx, wwt, wrp = vjp2(gout)
        dw2, dreps2 = CK._rgrid_bwd_pallas(
            mask, w_in, reps_in, gout, grid_side=g_side, region_size=rs,
            mm_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(dw2), np.asarray(wwt),
                                   atol=5e-5, rtol=1e-3, err_msg="dw")
        np.testing.assert_allclose(np.asarray(dreps2), np.asarray(wrp),
                                   atol=5e-5, rtol=1e-3, err_msg="dreps")
        np.testing.assert_allclose(np.asarray(gout), np.asarray(wx),
                                   atol=0, err_msg="dx == g (residual)")
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]


def _crmsa_cfg(crmsa_k=3):
    # mm float32: XLA:CPU's DotThunk cannot execute some bf16 dots that
    # appear in the grid-kernel backward compositions (TPU is unaffected)
    enc = RRTEncoderConfig(epeg_k=9, crmsa_k=crmsa_k, backend="pallas",
                           mm_dtype="float32")
    return enc.crmsa_layer()


@pytest.mark.parametrize("crmsa_k", [1, 3])
def test_crmsa_fused_layer_matches_unfused(crmsa_k):
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _crmsa_cfg(crmsa_k)
        layer = TransLayer(cfg)
        x, mask, length = _inputs()
        params = layer.init({"params": jax.random.PRNGKey(0)}, x, mask=mask,
                            length=length, deterministic=True)["params"]
        fused = layer.apply({"params": params}, x, mask=mask, length=length,
                            deterministic=True)
        os.environ["RRTMIL_FUSED_CRMSA_LAYER"] = "0"
        unfused = layer.apply({"params": params}, x, mask=mask,
                              length=length, deterministic=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=5e-5, rtol=1e-4)
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_FUSED_CRMSA_LAYER", None)


def test_crmsa_fused_param_tree_and_init_match():
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _crmsa_cfg()
        layer = TransLayer(cfg)
        x, mask, length = _inputs()
        p_f = layer.init({"params": jax.random.PRNGKey(9)}, x, mask=mask,
                         length=length, deterministic=True)["params"]
        os.environ["RRTMIL_FUSED_CRMSA_LAYER"] = "0"
        p_u = layer.init({"params": jax.random.PRNGKey(9)}, x, mask=mask,
                         length=length, deterministic=True)["params"]
        ff = jax.tree_util.tree_flatten_with_path(p_f)[0]
        fu = jax.tree_util.tree_flatten_with_path(p_u)[0]
        assert [k for k, _ in ff] == [k for k, _ in fu]
        for (k, a), (_, b) in zip(ff, fu):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(k))
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_FUSED_CRMSA_LAYER", None)


def test_crmsa_fused_grads_match():
    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        cfg = _crmsa_cfg()
        layer = TransLayer(cfg)
        x, mask, length = _inputs(b=1)
        params = layer.init({"params": jax.random.PRNGKey(0)}, x, mask=mask,
                            length=length, deterministic=True)["params"]

        def loss(p, x):
            out = layer.apply({"params": p}, x, mask=mask, length=length,
                              deterministic=True)
            return (out.astype(jnp.float32) ** 2).mean()

        gf_p, gf_x = jax.grad(loss, argnums=(0, 1))(params, x)
        os.environ["RRTMIL_FUSED_CRMSA_LAYER"] = "0"
        gu_p, gu_x = jax.grad(loss, argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gu_x),
                                   atol=1e-4, rtol=1e-3)
        for (k, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(gf_p)[0],
                jax.tree_util.tree_flatten_with_path(gu_p)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
                err_msg=str(k))
    finally:
        del os.environ["RRTMIL_PALLAS_INTERPRET"]
        os.environ.pop("RRTMIL_FUSED_CRMSA_LAYER", None)
