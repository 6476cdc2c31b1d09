"""Parity tests for the encoder-final-LayerNorm-fused redistribution
(ops/pallas/crmsa_kernels.py: crmsa_redistribute_grid_ln).

The CR-MSA layer is the last encoder layer (reference modules/rrt.py:
133-202), so the encoder's final `norm` (+ the all_shortcut global
residual, rrt.py:192-195) can ride the redistribution kernel's single
stream write.  These tests pin the fused kernel (interpret mode) against
the XLA composition for forward AND gradients, with and without the
shortcut stream, and at the model level check the RRTMIL forward/backward
is unchanged when the fusion engages.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmil_tpu.ops.pallas.crmsa_kernels import (_rgrid_ln_bwd_pallas,
                                                 _rgrid_ln_pallas,
                                                 _rgrid_ln_ref,
                                                 crmsa_redistribute_grid_ln)

B, G, RS, C, K = 2, 24, 6, 128, 3
NRS = G // RS
NR = NRS * NRS
P = RS * RS
N = G * G


def _case(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
    w = jnp.asarray(rng.standard_normal((B, NR, K, P)), jnp.float32) * 0.2
    reps = jnp.asarray(rng.standard_normal((B, NR, K, C)), jnp.float32)
    ls = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    lb = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    return x, sc, mask, w, reps, ls, lb


@pytest.mark.parametrize("with_shortcut", [False, True])
def test_rgrid_ln_forward_matches_ref(with_shortcut):
    x, sc, mask, w, reps, ls, lb = _case()
    scut = sc if with_shortcut else None
    ref = _rgrid_ln_ref(x, mask, w, reps, ls, lb, scut, grid_side=G,
                        region_size=RS, mm_dtype=jnp.float32)
    out = _rgrid_ln_pallas(x, mask, w, reps, ls, lb, scut, grid_side=G,
                           region_size=RS, mm_dtype=jnp.float32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)
    # pad rows are exactly zero (LN of the pad row is masked back out)
    np.testing.assert_array_equal(
        np.asarray(out)[~np.asarray(mask)], 0.0)


@pytest.mark.parametrize("with_shortcut", [False, True])
def test_rgrid_ln_gradients_match_ref(with_shortcut):
    x, sc, mask, w, reps, ls, lb = _case(1)
    scut = sc if with_shortcut else None
    g = jnp.asarray(np.random.default_rng(2).standard_normal((B, N, C)),
                    jnp.float32)

    argnums = (0, 1, 2, 3, 4) + ((5,) if with_shortcut else ())

    def loss_ref(x_, w_, r_, ls_, lb_, sc_=None):
        out = _rgrid_ln_ref(x_, mask, w_, r_, ls_, lb_, sc_, grid_side=G,
                            region_size=RS, mm_dtype=jnp.float32)
        return (out * g).sum()

    grads_ref = jax.grad(loss_ref, argnums)(
        *((x, w, reps, ls, lb, sc) if with_shortcut
          else (x, w, reps, ls, lb)))
    grads = _rgrid_ln_bwd_pallas(x, mask, w, reps, ls, lb, g, scut,
                                 grid_side=G, region_size=RS,
                                 mm_dtype=jnp.float32, interpret=True)
    dx, dw, dreps, dls, dlb = grads
    got = (dx, dw, dreps, dls, dlb) + ((dx,) if with_shortcut else ())
    for name, a, b in zip(("dx", "dw", "dreps", "dls", "dlb", "dsc"),
                          got, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
            err_msg=name)


def test_rgrid_ln_custom_vjp_roundtrip():
    x, sc, mask, w, reps, ls, lb = _case(3)

    def loss_fused(x_, w_, r_, ls_, lb_, sc_):
        out = crmsa_redistribute_grid_ln(x_, mask, w_, r_, ls_, lb_, sc_,
                                         G, RS, jnp.float32)
        return (out ** 2).sum()

    def loss_ref(x_, w_, r_, ls_, lb_, sc_):
        out = _rgrid_ln_ref(x_, mask, w_, r_, ls_, lb_, sc_, grid_side=G,
                            region_size=RS, mm_dtype=jnp.float32)
        return (out ** 2).sum()

    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    try:
        gf = jax.grad(loss_fused, (0, 1, 2, 3, 4, 5))(x, w, reps, ls, lb,
                                                      sc)
        gr = jax.grad(loss_ref, (0, 1, 2, 3, 4, 5))(x, w, reps, ls, lb, sc)
    finally:
        os.environ.pop("RRTMIL_PALLAS_INTERPRET", None)
    for name, a, b in zip(("dx", "dw", "dreps", "dls", "dlb", "dsc"),
                          gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-3, err_msg=name)


def test_model_forward_and_grads_unchanged_by_final_ln_fusion():
    """RRTMIL (flagship c16_r50 config: all_shortcut=True) produces the
    same logits and parameter gradients whether the final LayerNorm runs
    fused into the redistribution kernel or as its own pass."""
    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.ops.regions import grid_geometry
    import rrtmil_tpu.ops.pallas.crmsa_kernels as ck

    cfg = c16_r50()
    n = 500
    enc = dataclasses.replace(cfg.encoder, backend="pallas",
                              mm_dtype="float32")
    model = RRTMIL(dataclasses.replace(cfg, encoder=enc))
    npad = grid_geometry(n, enc.rmsa_layer().rmsa.region).padded_length
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, npad, cfg.input_dim)),
                    jnp.float32)
    mask = (jnp.arange(npad) < n)[None]

    calls = []
    orig = ck.crmsa_redistribute_grid_ln

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    os.environ["RRTMIL_PALLAS_INTERPRET"] = "1"
    ck.crmsa_redistribute_grid_ln = spy
    try:
        params = model.init({"params": jax.random.PRNGKey(0)}, x,
                            mask=mask, length=n,
                            deterministic=True)["params"]

        def loss(p):
            out = model.apply({"params": p}, x, mask=mask, length=n,
                              deterministic=True)
            return (out ** 2).sum()

        os.environ["RRTMIL_FUSED_FINAL_LN"] = "1"
        out1 = model.apply({"params": params}, x, mask=mask, length=n,
                           deterministic=True)
        assert calls, "final-LN fusion did not engage"
        g1 = jax.grad(loss)(params)
        os.environ["RRTMIL_FUSED_FINAL_LN"] = "0"
        out0 = model.apply({"params": params}, x, mask=mask, length=n,
                           deterministic=True)
        g0 = jax.grad(loss)(params)
    finally:
        ck.crmsa_redistribute_grid_ln = orig
        os.environ.pop("RRTMIL_FUSED_FINAL_LN", None)
        os.environ.pop("RRTMIL_PALLAS_INTERPRET", None)

    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               atol=2e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat0 = dict(jax.tree_util.tree_flatten_with_path(g0)[0])
    for path, a in flat1:
        name = "/".join(str(p.key) for p in path)
        if "pe_bias" in name:
            # EPEG bias shifts every logit in a softmax row equally, so
            # its true gradient is 0 and the measured values are pure
            # roundoff noise -- relative comparison is meaningless
            continue
        b = flat0[path]
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b)))
        assert err / scale < 2e-2, (name, err, scale)
