"""Shared deterministic training case for the multi-process parity test.

Both the 2-process gloo workers (tests/_mp_worker.py) and the in-process
single-controller reference (tests/test_multiprocess.py) run exactly this
case; matching loss trajectories prove the multi-controller path computes
the same numerics as one process with the same global mesh shape.
"""
from __future__ import annotations

import dataclasses

import numpy as np


def run_case(mesh, steps: int = 3):
    """Train a tiny RRTMIL for `steps` dp-sharded steps on `mesh`.

    Returns (losses: list[float], param_fingerprint: float).  Everything is
    seeded; dropout is disabled so no RNG partitioning enters the compare.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.parallel.mesh import global_array
    from rrtmil_tpu.parallel.train import make_sharded_train_step
    from rrtmil_tpu.train.engine import TrainState
    from rrtmil_tpu.train.losses import cross_entropy
    from rrtmil_tpu.train.optim import make_optimizer

    input_dim, length, batch = 16, 64, 8
    cfg = dataclasses.replace(c16_r50(), input_dim=input_dim, dropout=0.0)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, dropout=0.0))
    model = RRTMIL(cfg)
    spec = bucket_for(length, cfg.encoder)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, spec.data_length, input_dim)
                            ).astype(np.float32)
    mask = np.broadcast_to(np.arange(spec.data_length)[None] < length,
                           (batch, spec.data_length))
    labels = (np.arange(batch) % 2).astype(np.int32)

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        jnp.asarray(x[:1]), mask=jnp.asarray(mask[:1]),
                        length=spec.repr_length, deterministic=True)["params"]
    tx = make_optimizer("adam", weight_decay=0.0)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step_fn = make_sharded_train_step(model, tx, cross_entropy, mesh,
                                      spec.repr_length)

    xg = global_array(x, mesh, P("dp", None, None))
    mg = global_array(mask, mesh, P("dp", None))
    lg = global_array(labels, mesh, P("dp"))

    losses = []
    with mesh:
        for _ in range(steps):
            state, loss = step_fn(state, xg, mg, lg, jnp.float32(1e-3),
                                  jax.random.PRNGKey(1))
            losses.append(float(jax.device_get(loss)))
    fingerprint = float(sum(float(jnp.linalg.norm(p.astype(jnp.float32)))
                            for p in jax.tree.leaves(state.params)))
    return losses, fingerprint
