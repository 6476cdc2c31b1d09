"""Optimizers and LR schedules matching the reference's torch semantics.

Reference: Adam/AdamW + cosine/step/const schedules (main.py:229-243), with
per-epoch or per-iteration stepping (`lr_supi`, main.py:236).  Survival adds
RAdam / PlainRAdam / Lookahead (Survival/utils/optimizer.py) -- RAdam is
provided here; Lookahead as a wrapper transform.

The learning rate is passed into the jitted train step as a traced scalar
(the schedule index -- epoch or global iteration -- lives in host code, like
torch's `scheduler.step()`), so one compiled step serves the whole schedule.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def make_optimizer(name: str = "adam", weight_decay: float = 1e-5) -> optax.GradientTransformation:
    """Gradient transform WITHOUT the learning rate (applied by the caller).

    'adam': torch Adam semantics -- weight_decay is L2 (added to the gradient
    before the moment estimates).  'adamw': decoupled decay.
    """
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        )
    if name in ("radam", "plainradam"):
        # PlainRAdam = RAdam without the 4-step warmup fallback; optax's
        # scale_by_radam covers the variance-rectified behavior of both
        # (Survival/utils/optimizer.py:26-170).
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_radam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.trace(decay=0.9),
        )
    if name == "lookahead":
        # Lookahead(RAdam) as the survival harness offers (optimizer.py:20)
        return lookahead(optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_radam(b1=0.9, b2=0.999, eps=1e-8)))
    raise ValueError(f"unknown optimizer {name!r}")


def cosine_lr(base_lr: float, t: int, t_max: int, eta_min: float = 0.0) -> float:
    """torch CosineAnnealingLR(optimizer, T_max, eta_min) closed form."""
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t / t_max)) / 2


def step_lr(base_lr: float, t: int, step_size: float, gamma: float = 0.2) -> float:
    """torch StepLR (reference main.py:241 uses step=num_epoch/2, gamma=0.2)."""
    return base_lr * gamma ** int(t // step_size)


def lr_at(schedule: str, base_lr: float, t: int, t_max: int,
          step_gamma: float = 0.2) -> float:
    """Closed-form LR at schedule index t (epoch or iteration).

    Covers the classification schedules (main.py:235-243) and the survival
    scheduler zoo (Survival/utils/scheduler.py:4-17); 'plateau' requires
    metric feedback and is handled by PlateauLR below.  `step_gamma`:
    classification StepLR uses 0.2 (main.py:241), survival 0.1
    (scheduler.py:8)."""
    if schedule == "cosine":
        return cosine_lr(base_lr, min(t, t_max), t_max)
    if schedule == "step":
        return step_lr(base_lr, t, t_max / 2, step_gamma)
    if schedule == "exp":
        return base_lr * (0.1 ** t)           # ExponentialLR(0.1)
    if schedule in ("const", "None", "none"):
        return base_lr
    raise ValueError(f"unknown schedule {schedule!r}")


class PlateauLR:
    """torch ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01,
    patience=5) as used by the survival scheduler zoo (scheduler.py:10)."""

    def __init__(self, base_lr: float, factor: float = 0.2,
                 patience: int = 5, threshold: float = 0.01):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = math.inf
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


class LookaheadState(NamedTuple):
    slow: optax.Params
    inner: optax.OptState
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, k: int = 5,
              alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (reference Survival/utils/optimizer.py:174-262):
    every k inner steps, pull fast weights toward slow weights by alpha and
    reset fast weights to the interpolation."""

    def init(params):
        return LookaheadState(slow=jax.tree.map(jnp.copy, params),
                              inner=inner.init(params),
                              count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = count >= k

        def do_sync(args):
            upd, slow = args
            fast = jax.tree.map(lambda p, u: p + u, params, upd)
            new_slow = jax.tree.map(lambda s, f: s + alpha * (f - s), slow, fast)
            new_upd = jax.tree.map(lambda ns, p: ns - p, new_slow, params)
            return new_upd, new_slow

        updates, slow = jax.lax.cond(
            sync, do_sync, lambda args: args, (updates, state.slow))
        count = jnp.where(sync, 0, count)
        return updates, LookaheadState(slow=slow, inner=inner_state, count=count)

    return optax.GradientTransformation(init, update)
