"""Fresh-init distribution parity (VERDICT r4 weak #6 / next #8).

The reference has two init regimes: `initialize_weights` (xavier_normal on
Linear/Conv2d, zero bias) applied by most models, and torch DEFAULTS
(kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) on weight AND bias) for
module types the per-file initialize_weights does not cover.  These tests
pin the distributions our fresh inits draw from:

* DSMIL's Conv1d `fcc` head is NOT covered by dsmil.py:5-18 (Conv2d/Linear/
  LayerNorm only) => torch Conv1d default, fan_in = n_classes*512;
* TransMIL's bare-Parameter cls_token keeps torch.randn (std 1.0,
  transmil.py:80); the survival vendored copy re-inits it to std 1e-6
  (Survival/models/TransMIL/network.py:75-76);
* everything covered by initialize_weights stays xavier_normal with zero
  bias (e.g. RRTMIL, rrt.py:225).
"""
import math

import numpy as np

import jax
import jax.numpy as jnp

from rrtmil_tpu.models.dsmil import DSMIL
from rrtmil_tpu.models.transmil import TransMIL


def _init(model, n=300, dim=1024):
    x = jnp.zeros((1, n, dim))
    return model.init({"params": jax.random.PRNGKey(0)}, x,
                      deterministic=True)["params"]


def test_dsmil_fcc_uses_torch_conv1d_default():
    params = _init(DSMIL(input_dim=1024, n_classes=2, dropout=0.0))
    w = np.asarray(params["b_classifier"]["fcc_kernel"])
    b = np.asarray(params["b_classifier"]["fcc_bias"])
    bound = 1.0 / math.sqrt(2 * 512)
    assert np.max(np.abs(w)) <= bound
    # U(+-bound) std = bound/sqrt(3); 1024 samples per class-row
    assert abs(w.std() - bound / math.sqrt(3)) < 0.15 * bound
    # torch conv bias default is U(+-bound), NOT zeros
    assert np.max(np.abs(b)) <= bound and np.any(b != 0)
    # the rest of DSMIL is initialize_weights: xavier kernels, zero biases
    assert float(np.abs(params["i_classifier"]["bias"]).max()) == 0.0


def test_transmil_cls_token_std():
    p_cls = _init(TransMIL(input_dim=1024, n_classes=2, dropout=0.0))
    tok = np.asarray(p_cls["cls_token"])
    assert 0.6 < tok.std() < 1.6          # torch.randn (std 1.0), 512 draws
    p_surv = _init(TransMIL(input_dim=1024, n_classes=2, dropout=0.0,
                            cls_token_std=1e-6))
    assert np.abs(np.asarray(p_surv["cls_token"])).max() < 1e-4


def test_survival_factory_transmil_tiny_cls_token():
    from rrtmil_tpu.harness.survival import build_survival_model
    model, _ = build_survival_model("TransMIL", n_features=1024)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 300, 1024)),
                        deterministic=True)["params"]
    tok = np.asarray(params["backbone"]["cls_token"])
    assert np.abs(tok).max() < 1e-4


def test_rrtmil_xavier_with_zero_bias():
    from rrtmil_tpu.config import RRTMILConfig
    from rrtmil_tpu.models import RRTMIL
    cfg = RRTMILConfig(input_dim=1024)
    params = _init(RRTMIL(cfg))
    k = np.asarray(params["patch_to_emb"]["kernel"])
    want = math.sqrt(2.0 / (1024 + 512))   # xavier_normal std
    assert abs(k.std() - want) < 0.1 * want
    assert float(np.abs(params["patch_to_emb"]["bias"]).max()) == 0.0
