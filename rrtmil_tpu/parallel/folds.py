"""Fold-parallel cross-validation: train all K folds simultaneously.

The reference runs its 5-fold CV as a sequential Python loop
(main.py:64-67); the folds are completely independent, which makes the fold
index a perfect extra device axis (SURVEY.md §2.5 "cross-fold/host
orchestration").  Here the fold axis is vmapped: K parameter trees are
stacked on a leading axis and one jitted step trains every fold on its own
bag at once -- on a (fold,) mesh the stacked axis shards across chips and
the folds train truly in parallel with zero communication.

Constraint: all folds must step on the same bucket shape at each call
(the driver groups per-fold bags by bucket; with batch 1 per fold this is
just "one bag of the same bucket per fold", padding bags to the largest
bucket in the group when they differ).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..train.engine import TrainState


def stack_states(states: Sequence[TrainState]) -> TrainState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked: TrainState, k: int) -> List[TrainState]:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(k)]


def make_fold_parallel_step(model, tx: optax.GradientTransformation,
                            loss_fn: Callable, length: int,
                            mesh=None, fold_axis: str = "dp"):
    """Returns step(stacked_state, x (K,B,N,C), mask, labels, lr, rngs (K,2))
    -> (stacked_state, losses (K,)).

    With `mesh` given, the fold axis is sharded over `fold_axis` so each
    chip trains its own fold(s)."""
    # tx.update is called with lr=lr; accept plain transforms (ADVICE r3).
    tx = optax.with_extra_args_support(tx)

    def one_fold_step(state, x, mask, labels, lr, rng):
        def loss(params):
            logits = model.apply({"params": params}, x, mask=mask,
                                 length=length, deterministic=False,
                                 rngs={"dropout": rng})
            if isinstance(logits, tuple):
                logits = logits[0]
            return loss_fn(logits, labels)

        l, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l

    vstep = jax.vmap(one_fold_step, in_axes=(0, 0, 0, 0, None, 0))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        fold_sharded = NamedSharding(mesh, P(fold_axis))
        repl = NamedSharding(mesh, P())

        def sharded(state, x, mask, labels, lr, rngs):
            x = jax.lax.with_sharding_constraint(x, NamedSharding(
                mesh, P(fold_axis, None, None, None)))
            return vstep(state, x, mask, labels, lr, rngs)

        return jax.jit(sharded)
    return jax.jit(vstep)


def make_fold_parallel_surv_step(model, tx: optax.GradientTransformation,
                                 loss_fn: Callable, length: int,
                                 mesh=None, fold_axis: str = "dp"):
    """Survival analog of make_fold_parallel_step: the model emits
    (hazards, survival), the loss is the censored hazard loss
    loss_fn(hazards, survival, label, censorship), and lr is PER FOLD
    ((K,) -- the survival harness's plateau scheduler decays each fold's
    lr on its own validation loss).

    step(stacked_state, x (K,1,N,C), mask (K,1,N), label (K,1),
         censorship (K,1), lr (K,), rngs (K,2))
      -> (stacked_state, losses (K,), risks (K, 1))
    """
    tx = optax.with_extra_args_support(tx)

    def one_fold_step(state, x, mask, label, censorship, lr, rng):
        def loss(params):
            hazards, survival = model.apply(
                {"params": params}, x, mask=mask, length=length,
                deterministic=False, rngs={"dropout": rng})
            l = loss_fn(hazards, survival, label, censorship)
            return l, -jnp.sum(survival, axis=-1)

        (l, risk), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params,
                                       lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l, risk

    vstep = jax.vmap(one_fold_step, in_axes=(0, 0, 0, 0, 0, 0, 0))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def sharded(state, x, mask, label, censorship, lr, rngs):
            x = jax.lax.with_sharding_constraint(x, NamedSharding(
                mesh, P(fold_axis, None, None, None)))
            return vstep(state, x, mask, label, censorship, lr, rngs)

        return jax.jit(sharded)
    return jax.jit(vstep)
