"""Multi-chip training step: data parallelism over bags + sequence
parallelism over tokens, via GSPMD sharding annotations.

Parameters and optimizer state are replicated; the bag batch is sharded
(B over `dp`, tokens over `sp`).  XLA inserts the gradient all-reduce over
ICI automatically because the loss mean contracts the dp-sharded batch axis
against replicated parameters.  Token (`sp`) sharding is exact for R-MSA --
attention never crosses region boundaries (reference rmsa.py:204-230) and
the partitioner keeps whole grid rows per shard -- while CR-MSA's tiny
cross-region attention induces the only all-gather (crmsa_k tokens/region).

A hand-scheduled shard_map path for the long-sequence survival configs lives
in parallel/seqshard.py; this module is the general pjit path.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.engine import TrainState


def shard_batch_specs(mesh: Mesh):
    """(x, mask, labels) shardings: bags over dp, tokens over sp."""
    return (NamedSharding(mesh, P("dp", "sp", None)),
            NamedSharding(mesh, P("dp", "sp")),
            NamedSharding(mesh, P("dp")))


def make_sharded_train_step(model, tx: optax.GradientTransformation,
                            loss_fn: Callable, mesh: Mesh, length: int):
    """Returns a jitted multi-chip train step.

    loss_fn(logits, labels) -> scalar; `length` is the static true-length
    hint for the bucket (see ops/regions.py).
    """
    repl = NamedSharding(mesh, P())
    x_s, m_s, l_s = shard_batch_specs(mesh)
    # step calls tx.update(..., lr=lr); plain GradientTransformations (e.g.
    # optax.adam()) reject extra kwargs, so normalize here (ADVICE r3).
    tx = optax.with_extra_args_support(tx)

    def step(state: TrainState, x, mask, labels, lr, rng):
        x = jax.lax.with_sharding_constraint(x, x_s)
        mask = jax.lax.with_sharding_constraint(mask, m_s)
        labels = jax.lax.with_sharding_constraint(labels, l_s)

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

    return jax.jit(
        step,
        in_shardings=(repl, x_s, m_s, l_s, repl, repl),
        out_shardings=(repl, repl),
    )
