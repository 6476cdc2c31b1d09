"""Checkpoint / resume with full RNG state.

Mirrors the reference's resume payload (main.py:358-379): model + optimizer
+ scheduler index + early-stopper + metric accumulators + every RNG stream,
so `--auto_resume` reproduces the exact training trajectory.  Device state
(params/opt_state) is serialized with flax msgpack; host state (epoch
counters, numpy Generator state, early-stopper, metrics) with pickle.

Two families, as in the reference:
  * rolling `ckp.msgpack` every epoch (full resume payload);
  * per-fold best-AUC weights `fold_{k}_model_best_auc.msgpack`
    (main.py:330-344), reloaded for the final test.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from .engine import TrainState


def save_train_state(path: str, state: TrainState) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_train_state(path: str, template: TrainState) -> TrainState:
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return jax.tree.map(jax.numpy.asarray, restored)


def save_params(path: str, params) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return jax.tree.map(jax.numpy.asarray, restored)


def save_host_state(path: str, payload: Dict[str, Any]) -> None:
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_host_state(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


class FoldCheckpointer:
    """The reference's two-family checkpoint policy for one CV run."""

    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)

    # rolling full-resume checkpoint ---------------------------------------

    def save_rolling(self, state: TrainState, host: Dict[str, Any]) -> None:
        save_train_state(os.path.join(self.model_dir, "ckp.msgpack"), state)
        save_host_state(os.path.join(self.model_dir, "ckp_host.pkl"), host)

    def has_rolling(self) -> bool:
        return (os.path.exists(os.path.join(self.model_dir, "ckp.msgpack"))
                and os.path.exists(os.path.join(self.model_dir, "ckp_host.pkl")))

    def load_rolling(self, template: TrainState):
        state = load_train_state(
            os.path.join(self.model_dir, "ckp.msgpack"), template)
        host = load_host_state(os.path.join(self.model_dir, "ckp_host.pkl"))
        return state, host

    # per-fold best weights -------------------------------------------------

    def best_path(self, fold: int) -> str:
        return os.path.join(self.model_dir,
                            f"fold_{fold}_model_best_auc.msgpack")

    def save_best(self, fold: int, params) -> None:
        save_params(self.best_path(fold), params)

    def load_best(self, fold: int, template):
        return load_params(self.best_path(fold), template)
