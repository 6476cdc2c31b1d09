"""General top-k SVM loss parity vs the reference topk library
(modules/topk/svm.py), on goldens with both smooth and hard-branch samples
(loss values AND input gradients)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from golden_utils import ensure_goldens, load
from rrtmil_tpu.train.losses import (log_esp, max_top1_svm, max_topk_svm,
                                     smooth_top1_svm, smooth_topk_svm)

pytestmark = pytest.mark.skipif(not ensure_goldens(),
                                reason="no goldens and no /root/reference")


def _case(name):
    inputs, _, outputs, _ = load("topk_svm")
    x = jnp.asarray(inputs["x"])
    y = jnp.asarray(inputs["y"])
    return x, y, float(outputs[f"{name}_loss"]), outputs[f"{name}_grad"]


@pytest.mark.parametrize("name,fn", [
    ("smooth_top1", lambda x, y: smooth_top1_svm(x, y, tau=1.0)),
    ("smooth_top1_tau05", lambda x, y: smooth_top1_svm(x, y, tau=0.5)),
    ("smooth_topk3", lambda x, y: smooth_topk_svm(x, y, k=3, tau=1.0)),
    ("smooth_topk5_tau07",
     lambda x, y: smooth_topk_svm(x, y, k=5, tau=0.7)),
    ("max_top1", max_top1_svm),
    ("max_topk3", lambda x, y: max_topk_svm(x, y, k=3)),
])
def test_topk_svm_matches_reference(name, fn):
    x, y, want_loss, want_grad = _case(name)
    loss, grad = jax.value_and_grad(fn)(x, y)
    np.testing.assert_allclose(float(loss), want_loss, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(grad), want_grad, atol=5e-6)


def test_log_esp_matches_bruteforce():
    """log sigma_j from the DP equals brute-force ESPs of exp(x)."""
    from itertools import combinations
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 6)).astype(np.float32)
    got = np.asarray(log_esp(jnp.asarray(x), 4))
    e = np.exp(x.astype(np.float64))
    for j in range(5):
        want = np.array([
            sum(np.prod([row[i] for i in comb])
                for comb in combinations(range(6), j)) if j else 1.0
            for row in e])
        np.testing.assert_allclose(np.exp(got[:, j].astype(np.float64)),
                                   want, rtol=1e-5)


def test_smooth_topk_reduces_to_top1():
    """k=1: the general ESP path equals the closed-form top-1 loss."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 5)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, 8))
    a = smooth_topk_svm(x, y, k=1, tau=0.9)
    b = smooth_top1_svm(x, y, tau=0.9)
    np.testing.assert_allclose(float(a), float(b), rtol=2e-6)
