"""Survival training engine: discrete-hazard models, censored c-index.

Mirrors the reference's per-model Engine classes (all ~identical, e.g.
Survival/models/RRTMIL/engine.py:10-135): per-epoch train + validate,
best-c-index checkpointing, cosine schedule stepped per epoch, 30 epochs,
batch 1 bags up to 50k+ patches (multi-WSI concat).  TPU adaptations follow
train/engine.py: bucketed static shapes, jitted steps, device-side risk
accumulation with one host sync per epoch.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RRTEncoderConfig
from ..data.bucketing import bucket_for, pad_bag
from .engine import TrainState
from .losses import ce_surv_loss, nll_surv_loss
from .metrics import concordance_index_censored
from .optim import lr_at, make_optimizer


@dataclasses.dataclass
class SurvivalEngineConfig:
    loss: str = "nll_surv"           # 'nll_surv' | 'ce_surv'
    loss_alpha: float = 0.0          # define_loss uses alpha=0 (loss.py:8-11)
    opt: str = "adam"
    lr: float = 2e-4
    weight_decay: float = 1e-5
    lr_schedule: str = "cosine"
    num_epochs: int = 30
    n_bins: int = 4
    seed: int = 1


class SurvivalEngine:
    def __init__(self, model, cfg: SurvivalEngineConfig,
                 encoder_cfg: Optional[RRTEncoderConfig] = None):
        self.model = model
        self.cfg = cfg
        self.encoder_cfg = encoder_cfg or RRTEncoderConfig(region_num=16)
        self.tx = make_optimizer(cfg.opt, cfg.weight_decay)
        loss_fn = nll_surv_loss if cfg.loss == "nll_surv" else ce_surv_loss
        self._loss = partial(loss_fn, alpha=cfg.loss_alpha)
        self._rng = np.random.default_rng(cfg.seed)

    def init(self, rng: jax.Array, example_length: int,
             input_dim: int) -> TrainState:
        spec = bucket_for(example_length, self.encoder_cfg)
        x = jnp.zeros((1, spec.data_length, input_dim), jnp.float32)
        mask = jnp.ones((1, spec.data_length), bool)
        params = self.model.init({"params": rng, "dropout": rng}, x,
                                 mask=mask, length=spec.repr_length,
                                 deterministic=True)["params"]
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @partial(jax.jit, static_argnames=("self", "length"), donate_argnums=(1,))
    def _train_step(self, state, x, mask, label, censorship, lr, rng,
                    length: int):
        def loss_fn(params):
            hazards, survival = self.model.apply(
                {"params": params}, x, mask=mask, length=length,
                deterministic=False, rngs={"dropout": rng})
            loss = self._loss(hazards, survival, label, censorship)
            risk = -jnp.sum(survival, axis=-1)
            return loss, risk

        (loss, risk), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), loss, risk)

    @partial(jax.jit, static_argnames=("self", "length"))
    def _eval_step(self, params, x, mask, label, censorship, length: int):
        hazards, survival = self.model.apply(
            {"params": params}, x, mask=mask, length=length,
            deterministic=True)
        loss = self._loss(hazards, survival, label, censorship)
        return loss, -jnp.sum(survival, axis=-1)

    def _prep(self, bag: np.ndarray):
        spec = bucket_for(bag.shape[0], self.encoder_cfg)
        x, mask = pad_bag(bag.astype(np.float32), spec.data_length)
        return jnp.asarray(x[None]), jnp.asarray(mask[None]), spec

    def train_epoch(self, state, dataset, indices: Sequence[int], epoch: int,
                    rng_key: jax.Array):
        order = list(indices)
        self._rng.shuffle(order)
        lr = lr_at(self.cfg.lr_schedule, self.cfg.lr, epoch,
                   self.cfg.num_epochs)
        total, risks, censors, times = 0.0, [], [], []
        for j, idx in enumerate(order):
            _, bag, event, censorship, label = dataset[idx]
            x, mask, spec = self._prep(np.asarray(bag))
            state, loss, risk = self._train_step(
                state, x, mask, jnp.asarray([label], jnp.int32),
                jnp.asarray([censorship], jnp.float32), jnp.float32(lr),
                jax.random.fold_in(rng_key, j), spec.repr_length)
            total += float(loss)
            risks.append(float(risk[0]))
            censors.append(censorship)
            times.append(event)
        c_index = concordance_index_censored(
            1 - np.asarray(censors), np.asarray(times), np.asarray(risks))
        return state, total / max(len(order), 1), c_index

    def validate(self, params, dataset, indices: Sequence[int]):
        total, risks, censors, times = 0.0, [], [], []
        for idx in indices:
            _, bag, event, censorship, label = dataset[idx]
            x, mask, spec = self._prep(np.asarray(bag))
            loss, risk = self._eval_step(
                params, x, mask, jnp.asarray([label], jnp.int32),
                jnp.asarray([censorship], jnp.float32), spec.repr_length)
            total += float(loss)
            risks.append(float(risk[0]))
            censors.append(censorship)
            times.append(event)
        c_index = concordance_index_censored(
            1 - np.asarray(censors), np.asarray(times), np.asarray(risks))
        return total / max(len(indices), 1), c_index

    def learning(self, state, dataset, train_idx, val_idx,
                 logger=None, checkpoint_fn: Optional[Callable] = None):
        """Full fold: returns (best_c_index, best_epoch, best_params)
        (reference engine.py:24-60)."""
        best_score, best_epoch, best_params = 0.0, 0, state.params
        key = jax.random.PRNGKey(self.cfg.seed)
        for epoch in range(self.cfg.num_epochs):
            state, tr_loss, tr_ci = self.train_epoch(
                state, dataset, train_idx, epoch,
                jax.random.fold_in(key, epoch))
            val_loss, val_ci = self.validate(state.params, dataset, val_idx)
            if logger:
                logger.print(f"epoch {epoch}: train loss {tr_loss:.4f} "
                             f"ci {tr_ci:.4f} | val loss {val_loss:.4f} "
                             f"ci {val_ci:.4f}")
                logger.log({"train/loss": tr_loss, "train/c_index": tr_ci,
                            "val/loss": val_loss, "val/c_index": val_ci},
                           step=epoch)
            if val_ci > best_score:
                best_score, best_epoch = val_ci, epoch
                best_params = state.params
                if checkpoint_fn:
                    checkpoint_fn(epoch, val_ci, state.params)
        return best_score, best_epoch, best_params
