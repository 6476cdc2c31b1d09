"""Model-zoo parity vs. reference goldens (attmil, gattmil, mean/max,
CLAM SB/MB incl. instance loss, DSMIL, TransMIL, IBMIL)."""
import numpy as np
import pytest

import jax.numpy as jnp

from golden_utils import ensure_goldens, load

from rrtmil_tpu.models.abmil import ABMIL, GatedABMIL
from rrtmil_tpu.models.clam import CLAM_MB, CLAM_SB
from rrtmil_tpu.models.dsmil import DSMIL
from rrtmil_tpu.models.ibmil import IBMIL
from rrtmil_tpu.models.mean_max import MaxMIL, MeanMIL
from rrtmil_tpu.models.transmil import TransMIL

pytestmark = pytest.mark.skipif(not ensure_goldens(),
                                reason="no goldens and no /root/reference")


def apply(model, params, x, **kw):
    return model.apply({"params": params}, jnp.asarray(x),
                       deterministic=True, **kw)


def test_attmil():
    inputs, params, outputs, _ = load("attmil")
    got = apply(ABMIL(input_dim=1024, n_classes=2, dropout=0.25), params,
                inputs["x"])
    np.testing.assert_allclose(np.asarray(got), outputs["y"], atol=2e-5)


def test_gattmil():
    inputs, params, outputs, _ = load("gattmil")
    got = apply(GatedABMIL(input_dim=512, dropout=0.0), params, inputs["x"])
    np.testing.assert_allclose(np.asarray(got), outputs["y"], atol=2e-5)


@pytest.mark.parametrize("tag,cls", [("meanmil", MeanMIL), ("maxmil", MaxMIL)])
def test_mean_max(tag, cls):
    inputs, params, outputs, _ = load(tag)
    got = apply(cls(input_dim=1024, n_classes=2, dropout=0.25), params,
                inputs["x"])
    np.testing.assert_allclose(np.asarray(got), outputs["y"], atol=2e-5)


@pytest.mark.parametrize("tag,cls", [("clam_sb", CLAM_SB),
                                     ("clam_mb", CLAM_MB)])
def test_clam(tag, cls):
    inputs, params, outputs, _ = load(tag)
    model = cls(input_dim=1024, n_classes=2, dropout=0.0)
    logits, inst_loss, ps = apply(model, params, inputs["x"],
                                  labels=jnp.asarray(inputs["label"]))
    np.testing.assert_allclose(np.asarray(logits), outputs["logits"],
                               atol=3e-5)
    np.testing.assert_allclose(float(inst_loss), outputs["inst_loss"],
                               atol=1e-4)
    assert int(ps) == int(outputs["ps"])
    logits_eval = apply(model, params, inputs["x"])
    np.testing.assert_allclose(np.asarray(logits_eval),
                               outputs["logits_eval"], atol=3e-5)


def test_clam_masked_bucket():
    """CLAM under bucket padding must match the exact-length run."""
    inputs, params, outputs, _ = load("clam_sb")
    model = CLAM_SB(input_dim=1024, n_classes=2, dropout=0.0)
    x = jnp.asarray(inputs["x"])
    n = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (0, 1200 - n), (0, 0)))
    mask = (jnp.arange(1200) < n)[None]
    logits, inst_loss, _ = model.apply(
        {"params": params}, xp, mask=mask, length=n,
        labels=jnp.asarray(inputs["label"]), deterministic=True)
    np.testing.assert_allclose(np.asarray(logits), outputs["logits"],
                               atol=3e-5)
    np.testing.assert_allclose(float(inst_loss), outputs["inst_loss"],
                               atol=1e-4)


def test_dsmil():
    inputs, params, outputs, _ = load("dsmil")
    model = DSMIL(input_dim=1024, n_classes=2, dropout=0.0)
    bag_logits, max_inst, ps = apply(model, params, inputs["x"])
    np.testing.assert_allclose(np.asarray(bag_logits), outputs["bag_logits"],
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(max_inst)[0], outputs["classes"],
                               atol=3e-5)


def test_transmil():
    inputs, params, outputs, _ = load("transmil")
    got = apply(TransMIL(input_dim=1024, n_classes=2, dropout=0.0), params,
                inputs["x"])
    # 6 Newton pinv iterations per Nystrom layer amplify fp32 reduction-order
    # noise; observed drift ~3e-4 absolute (rel ~1e-4) through two layers.
    np.testing.assert_allclose(np.asarray(got), outputs["y"], atol=6e-4)


def test_ibmil():
    inputs, params, outputs, _ = load("ibmil")
    conf = tuple(tuple(float(v) for v in row) for row in inputs["confounders"])
    got = apply(IBMIL(input_dim=1024, n_classes=2, dropout=0.25,
                      confounders=conf), params, inputs["x"])
    np.testing.assert_allclose(np.asarray(got), outputs["y"], atol=2e-5)


def test_attmil_with_injected_rrt():
    """--only_rrt_enc path: AB-MIL with an injected RRT encoder
    (reference main.py:138-155,194)."""
    from rrtmil_tpu.config import RRTEncoderConfig
    inputs, params, outputs, _ = load("attmil_rrt")
    enc = RRTEncoderConfig(epeg_k=9, crmsa_k=1, dropout=0.0)
    model = ABMIL(input_dim=1024, n_classes=2, dropout=0.25, rrt=enc)
    got = apply(model, params, inputs["x"])
    np.testing.assert_allclose(np.asarray(got), outputs["y"], atol=2e-4)
