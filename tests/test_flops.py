"""Analytic FLOPs model + schedules sanity."""
import numpy as np

from rrtmil_tpu.config import RRTEncoderConfig, RRTMILConfig, c16_r50
from rrtmil_tpu.utils.flops import (encoder_flops, inner_attention_flops,
                                    rrtmil_flops)
from rrtmil_tpu.train.optim import PlateauLR, cosine_lr, lr_at


def test_inner_attention_flops_matches_reference_formula():
    # reference modules/rmsa.py:139-150 with dim=512, heads=8
    n, dim, h = 144, 512, 8
    want = n * dim * 3 * dim + h * n * (dim // h) * n \
        + h * n * n * (dim // h) + n * dim * dim
    assert inner_attention_flops(n, dim, h) == want


def test_rrtmil_flops_reasonable():
    # thop protocol point: (1, 9000, 1024) (reference flops.ipynb)
    f = rrtmil_flops(9000, c16_r50())
    # one convention throughout (MACs): projection is exactly N*1024*512
    assert f["patch_to_emb"] == 9000 * 1024 * 512
    assert 1e9 < f["encoder"] < 2e10
    assert f["total"] == sum(v for k, v in f.items() if k != "total")


def test_cosine_matches_torch_formula():
    # lr_t = base * (1 + cos(pi t/T)) / 2
    for t in (0, 10, 100, 200):
        got = cosine_lr(2e-4, t, 200)
        want = 2e-4 * (1 + np.cos(np.pi * t / 200)) / 2
        np.testing.assert_allclose(got, want)
    np.testing.assert_allclose(lr_at("exp", 1e-3, 2, 30), 1e-5)


def test_plateau_lr():
    p = PlateauLR(1e-3, patience=2)
    lrs = [p.step(1.0) for _ in range(10)]     # no improvement
    assert lrs[-1] < 1e-3
    p2 = PlateauLR(1e-3, patience=2)
    for i in range(10):
        p2.step(1.0 / (i + 1))                 # always improving
    assert p2.lr == 1e-3
