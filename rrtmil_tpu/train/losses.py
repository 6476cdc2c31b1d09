"""Loss library.

Classification: CE / BCE-with-logits (reference main.py:224-227,452-455).
Survival: NLL and CE discrete-hazard losses (reference Survival/utils/loss.py).
CLAM instance loss: SmoothTop1SVM (reference modules/topk/svm.py:89-102); at
top-1 the general polynomial machinery of modules/topk/polynomial reduces to
a stable log-sum-exp over the margin-augmented scores, implemented directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax CE with integer labels (torch nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(ll)


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    n_classes: int = 2) -> jnp.ndarray:
    """BCEWithLogitsLoss against one-hot labels (reference main.py:455)."""
    onehot = jax.nn.one_hot(labels, n_classes, dtype=logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(onehot * log_p + (1.0 - onehot) * log_not_p)


# ---------------------------------------------------------------------------
# Survival losses (reference Survival/utils/loss.py:25-62)
# ---------------------------------------------------------------------------

def nll_surv_loss(hazards: jnp.ndarray, survival: jnp.ndarray,
                  label: jnp.ndarray, censorship: jnp.ndarray,
                  alpha: float = 0.4, eps: float = 1e-7) -> jnp.ndarray:
    """Discrete-hazard negative log likelihood (loss.py `nll_loss`).

    hazards: (B, K) sigmoid hazard per bin; survival: (B, K) cumprod(1-h);
    label: (B,) integer bin; censorship: (B,) 1 = censored.
    """
    label = label.astype(jnp.int32)[:, None]
    c = censorship.astype(hazards.dtype)[:, None]
    s_padded = jnp.concatenate(
        [jnp.ones_like(c), survival], axis=1)          # S(-1) = 1
    s_prev = jnp.take_along_axis(s_padded, label, axis=1)
    h_this = jnp.take_along_axis(hazards, label, axis=1)
    s_this = jnp.take_along_axis(s_padded, label + 1, axis=1)

    uncensored = -(1.0 - c) * (jnp.log(jnp.clip(s_prev, eps))
                               + jnp.log(jnp.clip(h_this, eps)))
    censored = -c * jnp.log(jnp.clip(s_this, eps))
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return jnp.mean(loss)


def ce_surv_loss(hazards: jnp.ndarray, survival: jnp.ndarray,
                 label: jnp.ndarray, censorship: jnp.ndarray,
                 alpha: float = 0.4, eps: float = 1e-7) -> jnp.ndarray:
    """CE variant (loss.py `ce_loss`), including its quirks: `+ eps` (not
    clamp) on the padded-survival log, and `log(1 - clamp(S[Y]))` without an
    outer clamp."""
    label = label.astype(jnp.int32)[:, None]
    c = censorship.astype(hazards.dtype)[:, None]
    s_padded = jnp.concatenate([jnp.ones_like(c), survival], axis=1)
    s_prev = jnp.take_along_axis(s_padded, label, axis=1)
    h_this = jnp.take_along_axis(hazards, label, axis=1)
    s_y = jnp.take_along_axis(survival, label, axis=1)

    reg = -(1.0 - c) * (jnp.log(s_prev + eps)
                        + jnp.log(jnp.clip(h_this, eps)))
    ce_l = -c * jnp.log(jnp.clip(s_y, eps)) \
        - (1.0 - c) * jnp.log(1.0 - jnp.clip(s_y, eps))
    return jnp.mean((1.0 - alpha) * ce_l + alpha * reg)


# ---------------------------------------------------------------------------
# SmoothTop1SVM (CLAM instance loss)
# ---------------------------------------------------------------------------

def smooth_top1_svm(scores: jnp.ndarray, labels: jnp.ndarray,
                    alpha: float = 1.0, tau: float = 1.0,
                    thresh: float = 1e3) -> jnp.ndarray:
    """Smooth top-1 SVM loss (reference modules/topk/svm.py:30-116).

    loss_i = tau * logsumexp((s_ij + alpha * [j != y_i]) / tau) - s_{i,y_i},
    with the reference's per-sample hard/smooth switch (`detect_large`,
    topk/utils.py:36-42): a sample uses the non-smooth max-hinge form when
    its top-1 raw score exceeds the runner-up by >= tau * log(thresh)
    (the smooth form would over/underflow there; both forms agree in the
    limit, so the switch is numerically seamless).
    """
    n, c = scores.shape
    delta = alpha * (1.0 - jax.nn.one_hot(labels, c, dtype=scores.dtype))
    aug = scores + delta
    truth = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]

    smooth = tau * jax.scipy.special.logsumexp(aug / tau, axis=1) - truth
    hard = jnp.max(aug, axis=1) - truth

    top2 = jax.lax.top_k(scores, 2)[0]
    is_hard = (top2[:, 0] - top2[:, 1]) >= tau * jnp.log(thresh)
    return jnp.mean(jnp.where(is_hard, hard, smooth))


# ---------------------------------------------------------------------------
# General top-k SVM losses (reference modules/topk/svm.py:49-136)
# ---------------------------------------------------------------------------
#
# The reference computes the smooth top-k loss through log-space elementary
# symmetric polynomials (ESPs) sigma_{k-1}, sigma_k of exp(x) via
# divide-and-conquer polynomial multiplication with a hand-written autograd
# Function (modules/topk/polynomial/{sp,divide_conquer,multiplication,
# grad}.py) -- machinery sized for 1000-class ImageNet.  At MIL class counts
# (C <= ~10) a direct O(C*k) log-space DP is exactly as stable and
# differentiates cleanly under JAX autodiff, so no custom_vjp is needed.

_NEG = -1e30      # log-space "zero" (finite: -inf poisons logaddexp grads)


def log_esp(x: jnp.ndarray, kmax: int) -> jnp.ndarray:
    """log sigma_j of exp(x) for j = 0..kmax; x: (n, m) log-space terms.

    DP over terms: sigma_j <- sigma_j + exp(x_i) * sigma_{j-1}, kept in log
    space (the stable equivalent of polynomial/divide_conquer.py).  ESPs are
    symmetric, so term order is irrelevant.
    """
    n, m = x.shape
    init = jnp.full((n, kmax + 1), _NEG, x.dtype).at[:, 0].set(0.0)

    def body(carry, xi):
        shifted = jnp.concatenate(
            [jnp.full((n, 1), _NEG, x.dtype), carry[:, :-1]], axis=1)
        return jnp.logaddexp(carry, shifted + xi[:, None]), None

    out, _ = jax.lax.scan(body, init, x.T)
    return out


def _split_mask(scores, labels):
    """delta-style masking: ground-truth slot replaced by the log-space zero
    so ESP/top-k over all C slots equals the reference's x_1 = non-gt scores
    (a zero factor drops out of every ESP term; reference topk/utils.py:24-33)."""
    n, c = scores.shape
    onehot = jax.nn.one_hot(labels, c, dtype=bool)
    x1 = jnp.where(onehot, _NEG, scores)
    x2 = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    return x1, x2


def max_top1_svm(scores: jnp.ndarray, labels: jnp.ndarray,
                 alpha: float = 1.0) -> jnp.ndarray:
    """MaxTop1SVM: hard top-1 hinge (svm.py:49-60, functional.py:10-17)."""
    n, c = scores.shape
    delta = alpha * (1.0 - jax.nn.one_hot(labels, c, dtype=scores.dtype))
    truth = jnp.take_along_axis(scores, labels[:, None], axis=1)[:, 0]
    return jnp.mean(jnp.max(scores + delta, axis=1) - truth)


def _topk_hard(scores, labels, k: int, alpha: float):
    """Topk_Hard_SVM per-sample loss (functional.py:20-32)."""
    x1, x2 = _split_mask(scores, labels)
    top_k = jax.lax.top_k(x1, k)[0]                  # top-k of non-gt
    max_1 = jnp.mean(top_k + alpha, axis=1)
    max_2 = (jnp.sum(top_k[:, : k - 1], axis=1) + x2) / k
    return jnp.maximum(max_1 - max_2, 0.0)


def max_topk_svm(scores: jnp.ndarray, labels: jnp.ndarray, k: int,
                 alpha: float = 1.0) -> jnp.ndarray:
    """MaxTopkSVM (svm.py:63-76)."""
    return jnp.mean(_topk_hard(scores, labels, k, alpha))


def _topk_smooth(scores, labels, k: int, alpha: float, tau: float):
    """Topk_Smooth_SVM per-sample loss (functional.py:35-71).

    tau * (log[sigma_k(e^{x1/ktau}) e^{alpha/tau}
              + sigma_{k-1}(e^{x1/ktau}) e^{x2/ktau}]
           - log[sigma_{k-1}(e^{x1/ktau}) e^{x2/ktau}])
    = tau * softplus(log sigma_k - log sigma_{k-1} + alpha/tau - x2/(k tau))
    """
    x1, x2 = _split_mask(scores, labels)
    esp = log_esp(x1 / (k * tau), k)
    log_sk, log_skm1 = esp[:, k], esp[:, k - 1]
    return tau * jax.nn.softplus(
        log_sk - log_skm1 + alpha / tau - x2 / (k * tau))


def smooth_topk_svm(scores: jnp.ndarray, labels: jnp.ndarray, k: int,
                    alpha: float = 1.0, tau: float = 1.0,
                    thresh: float = 1e3) -> jnp.ndarray:
    """SmoothTopkSVM (svm.py:108-136): per-sample smooth/hard switch via
    detect_large (topk/utils.py:36-42) -- a sample goes hard when the gap
    between its k-th and (k+1)-th largest raw score exceeds
    k * tau * log(thresh) (the smooth ESPs would saturate there; the two
    forms agree in that limit)."""
    smooth = _topk_smooth(scores, labels, k, alpha, tau)
    hard = _topk_hard(scores, labels, k, alpha)
    top = jax.lax.top_k(scores, k + 1)[0]
    is_hard = (top[:, k - 1] - top[:, k]) >= k * tau * jnp.log(thresh)
    return jnp.mean(jnp.where(is_hard, hard, smooth))
