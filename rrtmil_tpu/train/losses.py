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
