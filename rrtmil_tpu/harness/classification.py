"""Classification experiment harness: k-fold CV driver.

Re-implements reference main.py:23-413 (main / one_fold) on the TPU engine:
patient shuffle + stratified k-fold, per-fold training with validation,
early stopping on -AUC, optional per-epoch test (`always_test`), best-AUC
checkpointing, rolling full-resume checkpoints (incl. RNG streams), and
cross-validation aggregation.
"""
from __future__ import annotations

import dataclasses
import os
import random
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..config import PoolConfig, PosEmbedConfig, RRTEncoderConfig, RRTMILConfig
from ..data.datasets import (C16Dataset, TCGADataset, get_kfold,
                             read_label_csv)
from ..models import zoo
from ..train.checkpoint import FoldCheckpointer
from ..train.earlystop import EarlyStopping
from ..train.engine import Engine, EngineConfig
from ..train.metrics import five_scores
from ..utils.logger import Logger


def encoder_config_from_args(args) -> RRTEncoderConfig:
    """Map the reference CLI surface onto the typed config tree
    (flags at reference main.py:654-695)."""
    return RRTEncoderConfig(
        dim=512,
        n_layers=args.n_trans_layers,
        n_heads=args.n_heads,
        crmsa_heads=args.crmsa_heads,
        region_num=args.region_num,
        min_region_num=args.min_region_num,
        attn_mode=args.attn,
        region_attn=args.region_attn,
        epeg=args.epeg,
        epeg_k=args.epeg_k,
        epeg_2d=args.epeg_2d,
        epeg_bias=args.epeg_bias,
        epeg_type=args.epeg_type,
        cr_msa=args.cr_msa,
        crmsa_k=args.crmsa_k,
        crmsa_mlp=args.crmsa_mlp,
        all_shortcut=args.all_shortcut,
        qkv_bias=args.qkv_bias,
        dropout=args.trans_drop_out,
        drop_path=args.drop_path,
        ffn=args.ffn,
        mlp_ratio=args.mlp_ratio,
        trans_dim=args.trans_dim,
        pos=PosEmbedConfig(kind=args.pos, k=args.peg_k, conv_1d=args.peg_1d,
                           pos_pos=args.pos_pos),
        # --amp: the TPU analog of the reference's torch.cuda.amp autocast
        # (main.py:101-102,706) -- bfloat16 activations/matmuls with fp32
        # params, LayerNorm reductions, softmax, pooling, and loss
        compute_dtype="bfloat16" if getattr(args, "amp", False)
        else "float32",
    )


def build_model_from_args(args, confounders=None):
    enc = encoder_config_from_args(args)
    rrt = enc if (args.only_rrt_enc and args.model != "rrtmil") else None
    if args.model == "rrtmil":
        cfg = RRTMILConfig(
            input_dim=args.input_dim, n_classes=args.n_classes, act=args.act,
            dropout=args.dropout, encoder=enc,
            pool=PoolConfig(kind=args.pool, act=args.da_act))
        return zoo.build_model("rrtmil", rrtmil_cfg=cfg), enc
    model = zoo.build_model(
        args.model, input_dim=args.input_dim, n_classes=args.n_classes,
        dropout=args.dropout, act=args.act, rrt=rrt, confounders=confounders,
        subtyping=args.datasets.lower() != "camelyon16")
    return model, enc


def engine_config_from_args(args) -> EngineConfig:
    cls_alpha, aux_alpha = zoo.LOSS_WEIGHT_OVERRIDES.get(
        args.model, (args.cls_alpha, args.aux_alpha))
    # Single-bag models: CLAM's instance sampler and DSMIL's critical-query
    # attention operate on one bag (models/clam.py keeps x[0]); the
    # reference always trains them at batch_size=1 (main.py:639,445-447).
    # Force bsz=1 rather than silently dropping bags 2..B from a batch.
    batch_size = args.batch_size
    if args.model in ("clam_sb", "clam_mb", "dsmil") and batch_size != 1:
        batch_size = 1
    return EngineConfig(
        loss=args.loss, opt=args.opt, lr=args.lr,
        weight_decay=args.weight_decay, lr_schedule=args.lr_sche,
        lr_supi=args.lr_supi, num_epochs=args.num_epoch,
        batch_size=batch_size, n_classes=args.n_classes,
        cls_alpha=cls_alpha, aux_alpha=aux_alpha,
        accumulation_steps=args.accumulation_steps, clip_grad=args.clip_grad,
        patch_shuffle=args.patch_shuffle, group_shuffle=args.group_shuffle,
        shuffle_group=args.shuffle_group, seed=args.seed,
        exact=args.model == "transmil",
        aux_mode=zoo.aux_mode(args.model),
        ds_average=args.model == "dsmil" and getattr(args, "ds_average",
                                                     False),
        fix_loader_random=getattr(args, "fix_loader_random", False),
        log_iter=getattr(args, "log_iter", 100),
        num_workers=getattr(args, "num_workers", 1),
        transfer_dtype="bfloat16" if getattr(args, "amp", False)
        else "float32",
        device_cache=getattr(args, "device_cache", "auto"),
        device_cache_bytes=int(getattr(args, "device_cache_gb", 6.0)
                               * (1 << 30)))


def _make_datasets(args, fold, splits):
    train_p, train_l, test_p, test_l, val_p, val_l = splits[fold]
    psize = getattr(args, "same_psize", 0)
    if args.datasets.lower() == "camelyon16":
        mk = lambda p, l, tr=False: C16Dataset(
            p, l, root=args.dataset_root, persistence=args.persistence,
            keep_same_psize=psize, is_train=tr)
    else:
        mk = lambda p, l, tr=False: TCGADataset(
            p, l, root=args.dataset_root, max_patch=args.tcga_max_patch,
            persistence=args.persistence, subtype=args.tcga_sub,
            keep_same_psize=psize, is_train=tr)
    train_set = mk(train_p, train_l, True)
    test_set = mk(test_p, test_l)
    val_set = mk(val_p, val_l) if args.val_ratio != 0.0 else test_set
    return train_set, val_set, test_set


def one_fold(args, fold: int, splits, metrics: Dict[str, List[float]],
             logger: Logger, resume_payload: Optional[Dict] = None):
    train_set, val_set, test_set = _make_datasets(args, fold, splits)

    if args.model == "dtfd":
        # standalone classification DTFD (reference DTFD/main.py)
        from ..models.dtfd import DTFD
        from .dtfd_cls import DTFDClassificationEngine
        enc_cfg = encoder_config_from_args(args)
        model = DTFD(input_dim=args.input_dim, n_classes=args.n_classes,
                     survival=False, group=getattr(args, "numGroup", 4),
                     distill=getattr(args, "distill_type", "AFS"),
                     instance_per_group=max(
                         1, getattr(args, "total_instance", 4)
                         // getattr(args, "numGroup", 4)))
        ecfg = engine_config_from_args(args)
        ecfg.batch_size = 1
        engine = DTFDClassificationEngine(
            model, ecfg, encoder_cfg=enc_cfg,
            grad_clipping=getattr(args, "grad_clipping", 5.0))
    else:
        confounders = None
        if args.model == "ibmil" and getattr(args, "confounder_path", ""):
            # per-fold k-means prototypes from the offline clustering
            # pipeline (tools/build_confounders.py).  Path resolution
            # mirrors reference main.py:197-202 -- NB the reference never
            # defines --confounder_path/--confounder_k in argparse, so its
            # `--model ibmil` crashes as shipped (docs/PARITY.md); we
            # implement the intended behavior.
            path = args.confounder_path
            if not path.endswith(".npy"):
                path = os.path.join(
                    path, str(fold),
                    f"train_bag_cls_agnostic_feats_proto_"
                    f"{getattr(args, 'confounder_k', 8)}.npy")
            confounders = tuple(map(tuple, np.load(path).tolist()))
            logger.print(f"ibmil confounders loaded from {path}")
        model, enc_cfg = build_model_from_args(args, confounders=confounders)
        engine = Engine(model, engine_config_from_args(args),
                        encoder_cfg=enc_cfg)
    # iteration meters (reference main.py:471-490) log through the harness
    # logger under the fold namespace
    engine.logger = logger
    engine.fold = fold
    example_len = max(train_set.bag(0).shape[0], 64)
    state = engine.init(jax.random.PRNGKey(args.seed), example_len,
                        args.input_dim)

    if args.model == "dsmil" and getattr(args, "dsmil_init", ""):
        # warm-start from the shipped dsmil_init checkpoint, non-strict
        # (reference main.py:215-218 -- which crashes on the init_cpk path
        # typo; we take the path from a flag instead)
        from ..models.dsmil import load_warm_start
        state = state.replace(params=load_warm_start(state.params,
                                                     args.dsmil_init))
        logger.print(f"dsmil warm-start loaded from {args.dsmil_init}")

    sub_typing = args.datasets.lower() != "camelyon16"
    is_c16 = args.datasets.lower() == "camelyon16"
    early = EarlyStopping(
        patience=30 if is_c16 else 20,
        stop_epoch=args.max_epoch if is_c16 else 70,
        save_best_model_stage=np.ceil(
            args.save_best_model_stage * args.num_epoch)) \
        if args.early_stopping else None

    ckpt = FoldCheckpointer(args.model_path)
    best = {"acc": 0, "pre": 0, "rec": 0, "fs": 0, "auc": 0, "epoch": 0,
            "te_auc": 0.0, "te_fs": 0.0}
    epoch_start = 0
    if getattr(args, "fix_train_random", False):
        # the reference re-seeds every RNG right before the epoch loop
        # (seed_torch(args.seed), main.py:254-255) so all folds train with
        # identical random streams; forced on for camelyon16 (main.py:731).
        engine.reseed(args.seed)
        epoch_key = jax.random.PRNGKey(args.seed)
    else:
        epoch_key = jax.random.PRNGKey(args.seed + 1000 * fold)

    if resume_payload is not None:
        state, _ = ckpt.load_rolling(state)
        host = resume_payload
        epoch_start = host["epoch"]
        engine.global_iter = host["global_iter"]
        engine._rng = np.random.default_rng()
        engine._rng.bit_generator.state = host["engine_rng"]
        best = host["best"]
        if early is not None:
            early.load_state_dict(host["early_stop"])

    for epoch in range(epoch_start, args.num_epoch):
        t0 = time.time()
        state, train_loss = engine.train_epoch(
            state, train_set, epoch, jax.random.fold_in(epoch_key, epoch))
        train_time = time.time() - t0

        probs, labels, val_loss = engine.evaluate(state.params, val_set)
        acc, auc, pre, rec, fs = five_scores(labels, probs, sub_typing)

        stop = False
        if early is not None:
            early(epoch, -auc)
            stop = early.early_stop

        if args.always_test:
            te_probs, te_labels, te_loss = engine.evaluate(state.params,
                                                           test_set)
            te_metrics = five_scores(te_labels, te_probs, sub_typing)
            if te_metrics[1] > best["te_auc"]:
                best["te_auc"], best["te_fs"] = te_metrics[1], te_metrics[4]
            logger.log({f"{fold}-fold/te_auc": te_metrics[1],
                        f"{fold}-fold/te_loss": te_loss}, step=epoch,
                       commit=False)

        logger.print(
            f"Epoch [{epoch + 1}/{args.num_epoch}] train loss: {train_loss:.3E},"
            f" val loss: {val_loss:.3E}, acc: {acc:.3f}, auc: {auc:.3f},"
            f" pre: {pre:.3f}, rec: {rec:.3f}, f1: {fs:.3f},"
            f" time: {train_time:.2f}s")
        logger.log({f"{fold}-fold/val_acc": acc, f"{fold}-fold/val_auc": auc,
                    f"{fold}-fold/val_loss": val_loss,
                    f"{fold}-fold/epoch": epoch}, step=epoch)

        if auc > best["auc"] and epoch >= args.save_best_model_stage * args.num_epoch:
            best.update(acc=acc, pre=pre, rec=rec, fs=fs, auc=auc, epoch=epoch)
            if not args.no_log:
                ckpt.save_best(fold, state.params)

        if not args.no_log:
            host = {
                "epoch": epoch + 1, "fold": fold,
                "global_iter": engine.global_iter,
                "engine_rng": engine._rng.bit_generator.state,
                "best": best,
                "early_stop": early.state_dict() if early else None,
                "metrics": metrics,
                "wandb_id": logger.wandb_id,
            }
            ckpt.save_rolling(state, host)

        if stop:
            break

    # final test with fold-best weights (main.py:384-407)
    params = state.params
    if not args.no_log and os.path.exists(ckpt.best_path(fold)):
        params = ckpt.load_best(fold, state.params)
    probs, labels, test_loss = engine.evaluate(params, test_set)
    engine.close()   # free the fold's HBM bag cache + transfer threads
    acc, auc, pre, rec, fs = five_scores(labels, probs, sub_typing)
    logger.print(f"Fold {fold} test: acc {acc:.3f} auc {auc:.3f} "
                 f"pre {pre:.3f} rec {rec:.3f} f1 {fs:.3f}")
    logger.log({"test_acc": acc, "test_auc": auc, "test_fscore": fs})

    metrics["acs"].append(acc)
    metrics["pre"].append(pre)
    metrics["rec"].append(rec)
    metrics["fs"].append(fs)
    metrics["auc"].append(auc)
    if args.always_test:
        metrics["te_auc"].append(best["te_auc"])
        metrics["te_fs"].append(best["te_fs"])
    return metrics


def make_splits(args):
    """Seeded patient shuffle + stratified k-fold, exactly as run_cv builds
    them (reference main.py:28-42 + dataloader.py:65-93) -- shared with
    tools/build_confounders.py so the confounder folds line up."""
    random.seed(args.seed)
    np.random.seed(args.seed)

    label_path = os.path.join(args.dataset_root, "label.csv")
    patients, labels = read_label_csv(label_path)
    index = list(range(len(patients)))
    random.shuffle(index)
    patients, labels = patients[index], labels[index]

    return get_kfold(args.cv_fold, patients, labels, args.val_ratio)


def run_cv(args) -> Dict[str, List[float]]:
    """The reference `main(args)` (main.py:23-96)."""
    splits = make_splits(args)

    fold_start = args.fold_start
    resume_payload = None
    if args.auto_resume and not args.no_log:
        ckpt = FoldCheckpointer(args.model_path)
        if ckpt.has_rolling():
            from ..train.checkpoint import load_host_state
            resume_payload = load_host_state(
                os.path.join(args.model_path, "ckp_host.pkl"))
            fold_start = resume_payload["fold"]

    # re-attach the same wandb run on resume (reference main.py:740-742)
    logger = Logger(use_wandb=args.wandb, project=args.project,
                    name=args.title, config=vars(args),
                    log_dir=args.model_path, quiet=args.no_log,
                    wandb_id=(resume_payload or {}).get("wandb_id") or None)

    metrics = {"acs": [], "pre": [], "rec": [], "fs": [], "auc": [],
               "te_auc": [], "te_fs": []}
    if resume_payload is not None:
        metrics = resume_payload["metrics"]

    for k in range(fold_start, args.cv_fold):
        logger.print(f"Start {args.cv_fold}-fold cross validation: fold {k}")
        metrics = one_fold(args, k, splits, metrics, logger,
                           resume_payload if k == fold_start else None)
        resume_payload = None

    for key in ("acs", "auc", "pre", "rec", "fs"):
        vals = np.array(metrics[key])
        logger.print(f"Cross validation {key} mean: {vals.mean():.3f}, "
                     f"std {vals.std():.3f}")
    logger.log({f"cross_val/{k}_mean": float(np.mean(v))
                for k, v in metrics.items() if v})
    logger.finish()
    return metrics
