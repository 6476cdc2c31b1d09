"""Fold-parallel cross-validation harness: train all K folds at once.

The reference's 5-fold CV is a sequential Python loop (reference
main.py:64-67); the folds are completely independent, so the fold index is
a perfect extra device axis (SURVEY.md §2.5 "cross-fold orchestration").
`run_cv_fold_parallel` trains every fold simultaneously through the vmapped
step of parallel/folds.py -- sharded over the mesh's fold axis when the
device count allows, plain vmap batching on one chip.

Semantics vs the sequential harness (run_cv):

* Each step trains one bag per fold; all folds must share one bucket shape
  per step, so bags are padded to the LARGEST bucket among the K bags of
  that step.  When per-fold bags land in different buckets this changes the
  region-grid geometry a bag sees relative to its sequential run (a
  controlled deviation, docs/PARITY.md) -- with `--same_psize` (or
  equal-length bags) buckets always coincide and the fold-parallel losses
  reproduce the sequential ones exactly (tests/test_fold_parallel.py).
* Ragged epoch tails (folds with more training bags than the shortest
  fold) run sequentially through the per-fold engines, so every fold sees
  exactly its own bags exactly once per epoch in its own order.
* Early stopping is tracked per fold; a stopped fold keeps stepping inside
  the stacked state (cheap, avoids a K-changing recompile) but its best
  checkpoint and metrics are frozen at the stop epoch, which is what the
  final test evaluates -- the reference's stop-then-test semantics.
* Not supported (asserted): accumulation_steps > 1, lr_supi (per-iteration
  schedules give each fold a different lr scalar), auto_resume.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


from ..parallel.folds import (make_fold_parallel_step, stack_states,
                              unstack_states)
from ..train.earlystop import EarlyStopping
from ..train.engine import Engine
from ..train.losses import bce_with_logits, cross_entropy
from ..train.metrics import five_scores
from ..utils.logger import Logger
from .classification import (_make_datasets, build_model_from_args,
                             encoder_config_from_args,
                             engine_config_from_args, make_splits)


def _fold_mesh(k: int):
    """(fold,) mesh over as many devices as divide the device count into
    the fold axis; None when only one device (plain vmap batching)."""
    n = jax.device_count()
    if n <= 1:
        return None
    from ..parallel.mesh import make_mesh
    d = 1
    for cand in range(min(k, n), 0, -1):
        if k % cand == 0 and n >= cand:
            d = cand
            break
    if d <= 1:
        return None
    return make_mesh(dp=d, sp=1, devices=jax.devices()[:d])


def run_cv_fold_parallel(args) -> Dict[str, List[float]]:
    assert args.accumulation_steps <= 1, \
        "--fold_parallel does not support accumulation_steps > 1"
    assert not args.lr_supi, "--fold_parallel requires epoch-level schedules"
    assert not getattr(args, "auto_resume", False), \
        "--fold_parallel does not support auto_resume"
    splits = make_splits(args)
    k_folds = args.cv_fold
    logger = Logger(use_wandb=args.wandb, project=args.project,
                    name=args.title, config=vars(args),
                    log_dir=args.model_path, quiet=args.no_log)
    logger.print(f"fold-parallel CV: {k_folds} folds trained simultaneously")

    model, enc_cfg = build_model_from_args(args)
    ecfg = engine_config_from_args(args)
    loss_fn = cross_entropy if ecfg.loss == "ce" else bce_with_logits

    fold_sets = [_make_datasets(args, k, splits) for k in range(k_folds)]
    engines = [Engine(model, ecfg, encoder_cfg=enc_cfg)
               for _ in range(k_folds)]
    # ONE device cache shared across the fold engines: K private caches
    # would demand K x the byte budget of HBM, and the path-keyed entries
    # dedup each slide across the overlapping fold splits
    shared_cache = engines[0]._device_cache()
    if shared_cache is not None:
        for e in engines[1:]:
            e._dcache = shared_cache
    states = []
    for k, (train_set, _, _) in enumerate(fold_sets):
        example_len = max(train_set.bag(0).shape[0], 64)
        states.append(engines[k].init(jax.random.PRNGKey(args.seed),
                                      example_len, args.input_dim))
    stacked = stack_states(states)
    mesh = _fold_mesh(k_folds)
    tx = engines[0].tx
    step_cache = {}

    def parallel_step(length: int):
        if length not in step_cache:
            step_cache[length] = make_fold_parallel_step(
                model, tx, loss_fn, length, mesh=mesh)
        return step_cache[length]

    is_c16 = args.datasets.lower() == "camelyon16"
    sub_typing = not is_c16
    earlys = [EarlyStopping(
        patience=30 if is_c16 else 20,
        stop_epoch=args.max_epoch if is_c16 else 70,
        save_best_model_stage=np.ceil(
            args.save_best_model_stage * args.num_epoch))
        if args.early_stopping else None for _ in range(k_folds)]
    if getattr(args, "fix_train_random", False):
        for e in engines:
            e.reseed(args.seed)
        epoch_keys = [jax.random.PRNGKey(args.seed)] * k_folds
    else:
        epoch_keys = [jax.random.PRNGKey(args.seed + 1000 * k)
                      for k in range(k_folds)]
    best = [{"acc": 0, "pre": 0, "rec": 0, "fs": 0, "auc": 0, "epoch": 0}
            for _ in range(k_folds)]
    best_params = [states[k].params for k in range(k_folds)]
    stopped = [False] * k_folds
    iters = [0] * k_folds

    for epoch in range(args.num_epoch):
        orders = [list(engines[k]._order_rng.permutation(
            len(fold_sets[k][0]))) for k in range(k_folds)]
        t_parallel = min(len(o) for o in orders)
        lr = engines[0].current_lr(epoch, t_parallel)

        for t in range(t_parallel):
            # per-fold bags come through the fold's OWN engine._make_batch:
            # host augmentation draws from that engine's RNG stream exactly
            # as the sequential harness does (previously the parallel loop
            # skipped augmentation while the ragged tails applied it), and
            # the device-resident bag cache serves repeat epochs without
            # touching the host.  Bags land padded to their own bucket and
            # are zero-extended ON DEVICE to the step's common bucket (the
            # same bucket-unification semantics as before, docs/PARITY.md).
            parts = [engines[k]._make_batch(fold_sets[k][0],
                                            [orders[k][t]], True)
                     for k in range(k_folds)]
            spec = max((p[3] for p in parts), key=lambda s: s.data_length)
            pad_to = spec.data_length
            xs = [jnp.pad(p[0], ((0, 0), (0, pad_to - p[0].shape[1]),
                                 (0, 0))) if p[0].shape[1] != pad_to
                  else p[0] for p in parts]
            ms = [jnp.pad(p[1], ((0, 0), (0, pad_to - p[1].shape[1])))
                  if p[1].shape[1] != pad_to else p[1] for p in parts]
            x = jnp.stack(xs)                                # (K, 1, N, C)
            m = jnp.stack(ms)
            y = jnp.stack([p[2] for p in parts])
            rngs = jnp.stack([
                jax.random.fold_in(jax.random.fold_in(epoch_keys[k], epoch),
                                   iters[k]) for k in range(k_folds)])
            stacked, losses = parallel_step(spec.repr_length)(
                stacked, x, m, y, jnp.float32(lr), rngs)
            for k in range(k_folds):
                iters[k] += 1

        # ragged tails: sequential per-fold steps through the engines
        if any(len(o) > t_parallel for o in orders):
            states = unstack_states(stacked, k_folds)
            for k in range(k_folds):
                for t in range(t_parallel, len(orders[k])):
                    x, m, y, spec = engines[k]._make_batch(
                        fold_sets[k][0], [orders[k][t]], True)
                    rng = jax.random.fold_in(
                        jax.random.fold_in(epoch_keys[k], epoch), iters[k])
                    states[k], _ = engines[k]._train_step(
                        states[k], x, m, y, jnp.float32(lr), rng,
                        spec.repr_length)
                    iters[k] += 1
            stacked = stack_states(states)

        # per-fold validation + early stopping + best tracking
        states = unstack_states(stacked, k_folds)
        msgs = []
        for k in range(k_folds):
            if stopped[k]:
                continue
            probs, labels_v, val_loss = engines[k].evaluate(
                states[k].params, fold_sets[k][1])
            acc, auc, pre, rec, fs = five_scores(labels_v, probs, sub_typing)
            if (auc > best[k]["auc"]
                    and epoch >= args.save_best_model_stage * args.num_epoch):
                best[k].update(acc=acc, pre=pre, rec=rec, fs=fs, auc=auc,
                               epoch=epoch)
                best_params[k] = states[k].params
                if not args.no_log:
                    from ..train.checkpoint import FoldCheckpointer
                    FoldCheckpointer(args.model_path).save_best(
                        k, states[k].params)
            if earlys[k] is not None:
                earlys[k](epoch, -auc)
                stopped[k] = earlys[k].early_stop
            msgs.append(f"f{k} auc {auc:.3f}")
        logger.print(f"Epoch [{epoch + 1}/{args.num_epoch}] "
                     + ", ".join(msgs))
        if all(stopped):
            break

    metrics = {"acs": [], "pre": [], "rec": [], "fs": [], "auc": [],
               "te_auc": [], "te_fs": []}
    for k in range(k_folds):
        # sequential-harness semantics (classification.py:254-258): the
        # fold-best weights are used only when a best checkpoint was saved
        # (i.e. not no_log); under --no_log the final weights are tested
        eval_params = (best_params[k] if not args.no_log
                       else states[k].params)
        probs, labels_t, _ = engines[k].evaluate(eval_params,
                                                 fold_sets[k][2])
        acc, auc, pre, rec, fs = five_scores(labels_t, probs, sub_typing)
        logger.print(f"Fold {k} test: acc {acc:.3f} auc {auc:.3f} "
                     f"f1 {fs:.3f}")
        metrics["acs"].append(acc)
        metrics["pre"].append(pre)
        metrics["rec"].append(rec)
        metrics["fs"].append(fs)
        metrics["auc"].append(auc)
    for key in ("acs", "auc", "pre", "rec", "fs"):
        vals = np.array(metrics[key])
        logger.print(f"Cross validation {key} mean: {vals.mean():.3f}, "
                     f"std {vals.std():.3f}")
    logger.finish()
    return metrics
