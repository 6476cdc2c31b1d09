"""Classification DTFD trainer (reference standalone DTFD/main.py:419-551).

The reference trains two tiers with two Adams:
  loss0 = CE(pseudo-bag logits, label repeated G times) -> backward ->
  per-submodule grad clip (5.0) on dimReduction/attention/classifier;
  loss1 = CE(tier-2 logits, label) -> backward (flows into tier 1 through
  the distilled features, unclipped) + clip on UClassifier; then both
  optimizers step (DTFD/main.py:516-536).

Because Adam is elementwise and both optimizers share hyperparameters, two
Adams over disjoint parameter groups equal one Adam over the union; the JAX
step reproduces the exact gradient composition:
  tier-1 grads = clip_5(d loss0) + d loss1|tier1
  tier-2 grads = clip_5(d loss1|tier2)
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.dtfd import DTFD
from ..train.engine import Engine, EngineConfig, TrainState
from ..train.losses import cross_entropy

TIER2_KEYS = ("u_attention", "u_classifier_fc")
# per-submodule clip groups of tier 1 (DTFD/main.py:523-525)
TIER1_CLIP_GROUPS = (("dim_fc1",), ("attention",),
                     ("classifier_kernel", "classifier_bias"))


def _select(tree: Dict, keys) -> Dict:
    return {k: v for k, v in tree.items() if k in keys}


def _clip_group(grads: Dict, keys, max_norm: float) -> Dict:
    sub = _select(grads, keys)
    if not sub:
        return grads
    gnorm = optax.global_norm(sub)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return {k: (jax.tree.map(lambda g: g * scale, v) if k in keys else v)
            for k, v in grads.items()}


class DTFDClassificationEngine(Engine):
    """Engine for DTFD(survival=False); model output: train ->
    (pseudo_logits (G, C), bag_logits (1, C)); eval -> logits (1, C)."""

    def __init__(self, model: DTFD, cfg: EngineConfig, encoder_cfg=None,
                 grad_clipping: float = 5.0):
        super().__init__(model, cfg, encoder_cfg)
        self.grad_clipping = grad_clipping

    def init(self, rng, example_length, input_dim):
        from ..data.bucketing import bucket_for
        spec = bucket_for(example_length, self.encoder_cfg)
        x = jnp.zeros((1, spec.data_length, input_dim), jnp.float32)
        mask = jnp.ones((1, spec.data_length), bool)
        init_fn = jax.jit(lambda r, x_, m_: self.model.init(
            {"params": r, "dropout": r}, x_, mask=m_,
            length=spec.repr_length, deterministic=True, train=True))
        params = init_fn(rng, x, mask)["params"]
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @partial(jax.jit, static_argnames=("self", "length"), donate_argnums=(1,))
    def _train_step(self, state: TrainState, x, mask, labels, lr, rng,
                    length: int):
        group = self.model.group

        def loss0_fn(params):
            pseudo_logits, _ = self.model.apply(
                {"params": params}, x, mask=mask, length=length,
                deterministic=False, train=True, rngs={"dropout": rng})
            lbl = jnp.broadcast_to(labels[:1], (group,))
            return cross_entropy(pseudo_logits, lbl)

        def loss1_fn(params):
            _, bag_logits = self.model.apply(
                {"params": params}, x, mask=mask, length=length,
                deterministic=False, train=True, rngs={"dropout": rng})
            return cross_entropy(bag_logits, labels[:1])

        loss0, g0 = jax.value_and_grad(loss0_fn)(state.params)
        loss1, g1 = jax.value_and_grad(loss1_fn)(state.params)

        # tier-1: clip(d loss0) per submodule, then add unclipped d loss1
        g0c = dict(g0)
        for keys in TIER1_CLIP_GROUPS:
            g0c = _clip_group(g0c, keys, self.grad_clipping)
        grads = {}
        for k in state.params:
            if k in TIER2_KEYS:
                grads[k] = g1[k]
            else:
                grads[k] = jax.tree.map(lambda a, b: a + b, g0c[k], g1[k])
        grads = _clip_group(grads, TIER2_KEYS, self.grad_clipping)

        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        total = loss0 + loss1
        meters = jnp.stack([total, loss1, loss0, jnp.float32(0.0)])
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), meters)

    @partial(jax.jit, static_argnames=("self", "length"))
    def _eval_step_perm(self, params, x, mask, labels, eval_perm,
                        length: int):
        logits = self.model.apply({"params": params}, x, mask=mask,
                                  length=length, deterministic=True,
                                  train=False, eval_perm=eval_perm)
        losses = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), labels[:, None], 1)[:, 0]
        probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        return probs, losses

    def evaluate(self, params, dataset, order=None):
        """Eval with the reference's instance shuffle before chunking
        (DTFD/main.py:342 random.shuffle(feat_index)); here a seeded
        permutation of the true instances, pad indices kept at the tail
        (docs/PARITY.md 'DTFD eval instance shuffle')."""
        order = list(order if order is not None else range(len(dataset)))
        rng = np.random.default_rng(self.cfg.seed + 0xD7FD)
        probs_all, labels_all, losses_all = [], [], []
        for idx in order:
            x, mask, labels, spec = self._make_batch(dataset, [idx], False)
            true_len = int(np.asarray(mask).sum())
            perm = np.concatenate([rng.permutation(true_len),
                                   np.arange(true_len, spec.repr_length)])
            probs, losses = self._eval_step_perm(
                params, x, mask, labels, jnp.asarray(perm, jnp.int32),
                spec.repr_length)
            probs_all.append(np.asarray(probs))
            labels_all.append(np.asarray(labels))
            losses_all.append(np.asarray(losses))
        return (np.concatenate(probs_all), np.concatenate(labels_all),
                float(np.mean(np.concatenate(losses_all))))
