"""Survival experiment harness: 5-fold CV over discrete-hazard models.

Mirrors reference Survival/main.py:16-166: reference-exact seeded splits,
model factory over the survival zoo, per-fold Engine.learning with
best-c-index checkpointing, CV_Meter CSV output.

The survival zoo reuses the classification backbones wrapped by
SurvivalHead (the reference vendors per-model copies; SURVEY.md §2.2 says
build once).  DTFD and MHIM have their own training protocols and get
dedicated step functions here.
"""
from __future__ import annotations

import csv
import os
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RRTEncoderConfig, RRTMILConfig, PoolConfig
from ..data.bucketing import bucket_for, pad_bag
from ..data.survival import SurvivalDataset
from ..models import zoo
from ..models.dtfd import DTFD
from ..models.mhim import MHIM, build_keep_mask, cosine_schedule, ema_update, soft_target_ce
from ..models.survival import SurvivalHead
from ..train.checkpoint import save_params
from ..train.engine import TrainState
from ..train.losses import nll_surv_loss
from ..train.metrics import concordance_index_censored
from ..train.optim import lr_at, make_optimizer
from ..train.surv_engine import SurvivalEngine, SurvivalEngineConfig
from ..utils.logger import Logger


class CVMeter:
    """CSV results writer (reference Survival/utils/util.py:53-72)."""

    def __init__(self, fold: int = 5):
        self.fold = fold
        self.epochs: List = ["epoch"]
        self.cindex: List = ["cindex"]

    def update(self, score: float, epoch: int):
        self.epochs.append(epoch)
        self.cindex.append(round(score, 4))

    def save(self, path: str):
        vals = self.cindex[1:self.fold + 1]
        self.cindex.append(round(float(np.mean(vals)), 4))
        self.cindex.append(round(float(np.std(vals)), 4))
        header = ["folds"] + [f"fold {i}" for i in range(self.fold)] + \
            ["mean", "std"]
        with open(path, "w", newline="") as fp:
            writer = csv.writer(fp)
            writer.writerow(header)
            writer.writerow(self.epochs)
            writer.writerow(self.cindex)


def survival_rrtmil_config(n_features: int, n_classes: int = 4,
                           epeg_k: int = 15, crmsa_k: int = 3,
                           amp: bool = False) -> RRTMILConfig:
    """The survival RRTMIL config (reference Survival/main.py:109-130:
    region_num=16, the long-bag memory knob per README.md:61).  `amp`
    switches the encoder to bfloat16 compute (the classification CLI's
    --amp mapping), which also lets the fused whole-layer kernels apply
    at the 50k-patch P=196 shapes (fp32 streams there exceed the VMEM
    block budget and fall back)."""
    return RRTMILConfig(
        input_dim=n_features, n_classes=n_classes,
        encoder=RRTEncoderConfig(region_num=16, epeg_k=epeg_k,
                                 crmsa_k=crmsa_k,
                                 compute_dtype="bfloat16" if amp
                                 else "float32"),
        pool=PoolConfig())


def build_survival_model(name: str, n_features: int, n_classes: int = 4,
                         epeg_k: int = 15, crmsa_k: int = 3,
                         confounders=None, amp: bool = False):
    """Survival model factory (reference Survival/main.py:70-153)."""
    name_l = name.lower().replace("-mil", "").replace("_mil", "")
    enc16 = RRTEncoderConfig(region_num=16, epeg_k=epeg_k, crmsa_k=crmsa_k,
                             compute_dtype="bfloat16" if amp else "float32")
    if name_l == "rrtmil":
        cfg = survival_rrtmil_config(n_features, n_classes, epeg_k, crmsa_k,
                                     amp=amp)
        return SurvivalHead(zoo.build_model("rrtmil", rrtmil_cfg=cfg)), enc16
    if name_l == "dtfd":
        return DTFD(input_dim=n_features, n_classes=n_classes), enc16
    if name_l == "mhim":
        return MHIM(input_dim=n_features, n_classes=n_classes), enc16
    mapping = {"attmil": "attmil", "clam_sb": "clam_sb", "clam_mb": "clam_mb",
               "dsmil": "dsmil", "transmil": "transmil", "meanmil": "meanmil",
               "maxmil": "maxmil", "ibmil": "ibmil"}
    if name_l not in mapping:
        raise ValueError(f"unknown survival model {name!r}")
    extra = {}
    if name_l == "transmil":
        # the survival vendored TransMIL re-inits cls_token to std 1e-6
        # (Survival/models/TransMIL/network.py:75-76); classification keeps
        # torch.randn (std 1.0, modules/transmil.py:80)
        extra["cls_token_std"] = 1e-6
    backbone = zoo.build_model(mapping[name_l], input_dim=n_features,
                               n_classes=n_classes, confounders=confounders,
                               **extra)
    return SurvivalHead(backbone), enc16


# ---------------------------------------------------------------------------
# DTFD: two-loss single-optimizer step (see models/dtfd.py docstring)
# ---------------------------------------------------------------------------

class DTFDSurvivalEngine(SurvivalEngine):
    @partial(jax.jit, static_argnames=("self", "length"), donate_argnums=(1,))
    def _train_step(self, state, x, mask, label, censorship, lr, rng,
                    length: int):
        group = self.model.group

        def loss_fn(params):
            ph, ps_, hazards, survival = self.model.apply(
                {"params": params}, x, mask=mask, length=length,
                deterministic=False, train=True, rngs={"dropout": rng})
            lbl_g = jnp.broadcast_to(label, (group,))
            cen_g = jnp.broadcast_to(censorship, (group,))
            loss0 = self._loss(ph, ps_, lbl_g, cen_g)
            loss1 = self._loss(hazards, survival, label, censorship)
            risk = -jnp.sum(survival, axis=-1)
            return loss0 + loss1, risk

        (loss, risk), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), loss, risk)

    @partial(jax.jit, static_argnames=("self", "length"))
    def _eval_step_perm(self, params, x, mask, label, censorship, eval_perm,
                        length: int):
        hazards, survival = self.model.apply(
            {"params": params}, x, mask=mask, length=length,
            deterministic=True, train=False, eval_perm=eval_perm)
        loss = self._loss(hazards, survival, label, censorship)
        return loss, -jnp.sum(survival, axis=-1)

    def validate(self, params, dataset, indices):
        """Eval with the reference's instance shuffle before chunking
        (Survival/models/DTFD/network.py:231-233); seeded permutation of the
        true instances, pads at the tail (docs/PARITY.md)."""
        rng = np.random.default_rng(self.cfg.seed + 0xD7FD)
        losses_dev, risks_dev, censors, times = [], [], [], []
        for idx in indices:
            _, bag, event, censorship, label = dataset[idx]
            bag = np.asarray(bag)
            x, mask, spec = self._prep(bag)
            true_len = min(bag.shape[0], spec.repr_length)
            perm = np.concatenate([rng.permutation(true_len),
                                   np.arange(true_len, spec.repr_length)])
            loss, risk = self._eval_step_perm(
                params, x, mask, jnp.asarray([label], jnp.int32),
                jnp.asarray([censorship], jnp.float32),
                jnp.asarray(perm, jnp.int32), spec.repr_length)
            losses_dev.append(loss)
            risks_dev.append(risk[0])
            censors.append(censorship)
            times.append(event)
        total, risks = SurvivalEngine._sync_meters(losses_dev, risks_dev)
        c_index = concordance_index_censored(
            1 - np.asarray(censors), np.asarray(times), risks)
        return total / max(len(indices), 1), c_index

    def init(self, rng, example_length, input_dim):
        spec = bucket_for(example_length, self.encoder_cfg)
        x = jnp.zeros((1, spec.data_length, input_dim), jnp.float32)
        mask = jnp.ones((1, spec.data_length), bool)
        init_fn = jax.jit(lambda r, x_, m_: self.model.init(
            {"params": r, "dropout": r}, x_, mask=m_,
            length=spec.repr_length, deterministic=True, train=True))
        params = init_fn(rng, x, mask)["params"]
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# MHIM: teacher/student with EMA + masking schedules
# ---------------------------------------------------------------------------

class MHIMSurvivalEngine(SurvivalEngine):
    """Teacher attention -> keep mask -> student step -> EMA update
    (reference Survival/models/MHIM/{network,engine}.py)."""

    def __init__(self, model: MHIM, cfg: SurvivalEngineConfig,
                 encoder_cfg=None, niter_per_ep: int = 100,
                 mask_ratio: float = 0.7, mask_ratio_l: float = 0.2,
                 mask_ratio_h: float = 0.02, cl_alpha: float = 0.5,
                 mm: float = 0.9999):
        super().__init__(model, cfg, encoder_cfg)
        self.cl_alpha = cl_alpha
        self.mask_ratio = mask_ratio
        self.mask_ratio_l = mask_ratio_l
        self.mrh_sche = cosine_schedule(mask_ratio_h, 0.0, cfg.num_epochs,
                                        niter_per_ep)
        self.mm_sche = cosine_schedule(mm, 1.0, cfg.num_epochs, niter_per_ep,
                                       start_warmup=1.0)
        self.teacher_params = None
        self._iter = 0

    def init(self, rng, example_length, input_dim):
        state = super().init(rng, example_length, input_dim)
        self.teacher_params = jax.tree.map(jnp.copy, state.params)
        return state

    @partial(jax.jit, static_argnames=("self", "length", "mask_ratio_h"),
             donate_argnums=(1,))
    def _mhim_train_step(self, state, teacher_params, x, mask, label,
                         censorship, lr, rng, mm, length: int,
                         mask_ratio_h: float):
        r_mask, r_drop = jax.random.split(rng)
        # teacher pass: bag feature + per-instance attention
        _, tea_feat, tea_attn = self.model.apply(
            {"params": teacher_params}, x, mask=mask, length=length,
            deterministic=True, return_attn=True, return_feat=True)
        keep = build_keep_mask(r_mask, tea_attn[0], length, x.shape[1],
                               self.mask_ratio, self.mask_ratio_l,
                               mask_ratio_h)

        def loss_fn(params):
            logits, stu_feat = self.model.apply(
                {"params": params}, x, mask=mask, length=length,
                keep_mask=keep[None], deterministic=False, return_feat=True,
                rngs={"dropout": r_drop})
            hazards = jax.nn.sigmoid(logits)
            survival = jnp.cumprod(1 - hazards, axis=-1)
            surv_loss = self._loss(hazards, survival, label, censorship)
            cl = soft_target_ce(stu_feat, tea_feat)
            risk = -jnp.sum(survival, axis=-1)
            return surv_loss + self.cl_alpha * cl, risk

        (loss, risk), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        teacher = ema_update(params, teacher_params, mm)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), teacher, loss, risk)

    def train_epoch(self, state, dataset, indices, epoch, rng_key):
        order = list(indices)
        self._rng.shuffle(order)
        lr = self.epoch_lr(epoch)
        losses_dev, risks_dev, censors, times = [], [], [], []
        for j, idx in enumerate(order):
            _, bag, event, censorship, label = dataset[idx]
            x, mask, spec = self._prep(np.asarray(bag))
            i = min(self._iter, len(self.mrh_sche) - 1)
            state, self.teacher_params, loss, risk = self._mhim_train_step(
                state, self.teacher_params, x, mask,
                jnp.asarray([label], jnp.int32),
                jnp.asarray([censorship], jnp.float32), jnp.float32(lr),
                jax.random.fold_in(rng_key, j),
                jnp.float32(self.mm_sche[i]), spec.repr_length,
                float(round(float(self.mrh_sche[i]), 4)))
            self._iter += 1
            losses_dev.append(loss)
            risks_dev.append(risk[0])
            censors.append(censorship)
            times.append(event)
        total, risks = SurvivalEngine._sync_meters(losses_dev, risks_dev)
        ci = concordance_index_censored(1 - np.asarray(censors),
                                        np.asarray(times), risks)
        return state, total / max(len(order), 1), ci

    @partial(jax.jit, static_argnames=("self", "length"))
    def _eval_step(self, params, x, mask, label, censorship, length: int):
        logits = self.model.apply({"params": params}, x, mask=mask,
                                  length=length, deterministic=True)
        hazards = jax.nn.sigmoid(logits)
        survival = jnp.cumprod(1 - hazards, axis=-1)
        loss = self._loss(hazards, survival, label, censorship)
        return loss, -jnp.sum(survival, axis=-1)


def make_survival_engine(name: str, model, cfg: SurvivalEngineConfig,
                         encoder_cfg=None, niter_per_ep: int = 100,
                         sp_shards: int = 1):
    name_l = name.lower().replace("-mil", "").replace("_mil", "")
    if sp_shards > 1:
        # sequence-sharded long-bag path (reference Survival/main.py:125 is
        # the region_num=16 single-GPU analog); RRTMIL only -- the other
        # zoo models have no region structure to shard exactly.
        if name_l != "rrtmil":
            raise ValueError(
                f"--sp_shards requires model=RRTMIL, got {name!r}")
        if not isinstance(model, RRTMILConfig):
            raise TypeError("sp_shards path takes the RRTMILConfig "
                            "(survival_rrtmil_config), not a model instance")
        from ..parallel.mesh import make_mesh
        from ..train.surv_engine import SeqShardSurvivalEngine
        mesh = make_mesh(dp=1, sp=sp_shards,
                         devices=jax.devices()[:sp_shards])
        return SeqShardSurvivalEngine(model, cfg, mesh)
    if name_l == "dtfd":
        return DTFDSurvivalEngine(model, cfg, encoder_cfg)
    if name_l == "mhim":
        return MHIMSurvivalEngine(model, cfg, encoder_cfg,
                                  niter_per_ep=niter_per_ep)
    return SurvivalEngine(model, cfg, encoder_cfg)


def run_survival_cv(args) -> CVMeter:
    """5-fold survival CV (reference Survival/main.py:16-166)."""
    n_features = getattr(args, "input_dim", None) or \
        (512 if args.folder == "plip" else 1024)
    dataset = SurvivalDataset(args.excel_file, folder=args.folder,
                              root=getattr(args, "dataset_root", None))
    meter = CVMeter(fold=5)
    results_dir = args.results_dir
    os.makedirs(results_dir, exist_ok=True)
    logger = Logger(quiet=getattr(args, "no_log", False))

    sp_shards = int(getattr(args, "sp_shards", 1) or 1)
    for fold in range(5):
        train_idx, val_idx = dataset.get_split(fold)
        if sp_shards > 1:
            model = survival_rrtmil_config(
                n_features, n_classes=4, epeg_k=args.epeg_k,
                crmsa_k=args.crmsa_k, amp=getattr(args, "amp", False))
            enc = model.encoder
        else:
            model, enc = build_survival_model(
                args.model, n_features, n_classes=4,
                epeg_k=args.epeg_k, crmsa_k=args.crmsa_k,
                amp=getattr(args, "amp", False))
        cfg = SurvivalEngineConfig(
            loss=args.loss, opt=args.optimizer.lower(), lr=args.lr,
            weight_decay=args.weight_decay, lr_schedule=args.scheduler,
            num_epochs=args.num_epoch, seed=args.seed,
            transfer_dtype="bfloat16" if getattr(args, "amp", False)
            else "float32",
            device_cache=getattr(args, "device_cache", "auto"),
            device_cache_bytes=int(getattr(args, "device_cache_gb", 6.0)
                                   * (1 << 30)))
        engine = make_survival_engine(args.model, model, cfg, enc,
                                      niter_per_ep=len(train_idx),
                                      sp_shards=sp_shards)
        example_len = np.asarray(dataset[train_idx[0]][1]).shape[0]
        state = engine.init(jax.random.PRNGKey(args.seed), example_len,
                            n_features)

        # --resume: load best-checkpoint weights (reference Survival/models/
        # RRTMIL/engine.py:27-35; per-fold file or a directory of fold_{k}/)
        resume = getattr(args, "resume", "") or ""
        if resume:
            path = resume
            if os.path.isdir(resume):
                cand = sorted(os.listdir(os.path.join(resume,
                                                      f"fold_{fold}")))
                cand = [c for c in cand if c.endswith(".msgpack")]
                path = os.path.join(resume, f"fold_{fold}", cand[-1]) \
                    if cand else ""
            if path and os.path.isfile(path):
                logger.print(f"=> loading checkpoint '{path}'")
                from ..train.checkpoint import load_params
                state = state.replace(params=load_params(path, state.params))
            else:
                logger.print(f"=> no checkpoint found at '{resume}'")

        # --evaluate: validation only, no training (engine.py:37-39)
        if getattr(args, "evaluate", False):
            val_loss, val_ci = engine.validate(state.params, dataset, val_idx)
            logger.print(f"fold {fold} evaluate: loss {val_loss:.4f} "
                         f"c-index {val_ci:.4f}")
            meter.update(val_ci, 0)
            continue

        fold_dir = os.path.join(results_dir, f"fold_{fold}")
        os.makedirs(fold_dir, exist_ok=True)

        def save_best(epoch, score, params, fold_dir=fold_dir):
            save_params(os.path.join(
                fold_dir, f"model_best_{score:.4f}_{epoch}.msgpack"), params)

        score, epoch, _ = engine.learning(state, dataset, train_idx, val_idx,
                                          logger=logger,
                                          checkpoint_fn=save_best)
        logger.print(f"fold {fold}: best c-index {score:.4f} @ epoch {epoch}")
        engine.close()   # free the fold's HBM bag cache before the next fold
        meter.update(score, epoch)

    meter.save(os.path.join(results_dir, f"results_{args.model}.csv"))
    return meter


def run_survival_fold_parallel(args, folds=None) -> CVMeter:
    """All-folds-at-once survival CV (TPU extension; the reference's fold
    loop, Survival/main.py:16-166, is sequential).

    The fold axis is vmapped through parallel/folds.py's
    make_fold_parallel_surv_step -- on a multi-chip mesh the stacked fold
    states shard across chips with zero cross-fold communication.
    Semantics mirror harness/fold_parallel.py's classification variant:

    * all folds step on one bucket per iteration (bags padded to the
      largest bucket among the K bags of that step; with equal-length bags
      buckets coincide and the trajectories reproduce the sequential
      harness exactly -- tests/test_fold_parallel.py);
    * ragged epoch tails run sequentially through the per-fold engines;
    * the plateau scheduler decays each fold's lr on its own val loss
      (lr enters the vmapped step as a (K,) vector);
    * DTFD / MHIM / --sp_shards protocols are out of scope (asserted).
    """
    from ..parallel.folds import (make_fold_parallel_surv_step, stack_states,
                                  unstack_states)

    assert int(getattr(args, "sp_shards", 1) or 1) == 1, \
        "--fold_parallel is incompatible with --sp_shards"
    name_l = args.model.lower().replace("-mil", "").replace("_mil", "")
    assert name_l not in ("dtfd", "mhim"), \
        "--fold_parallel supports the SurvivalEngine zoo only"
    folds = list(folds if folds is not None else range(5))
    k_folds = len(folds)
    n_features = getattr(args, "input_dim", None) or \
        (512 if args.folder == "plip" else 1024)
    dataset = SurvivalDataset(args.excel_file, folder=args.folder,
                              root=getattr(args, "dataset_root", None))
    logger = Logger(quiet=getattr(args, "no_log", False))
    results_dir = args.results_dir
    os.makedirs(results_dir, exist_ok=True)
    meter = CVMeter(fold=k_folds)

    model, enc = build_survival_model(args.model, n_features, n_classes=4,
                                      epeg_k=args.epeg_k,
                                      crmsa_k=args.crmsa_k,
                                      amp=getattr(args, "amp", False))
    cfg = SurvivalEngineConfig(
        loss=args.loss, opt=args.optimizer.lower(), lr=args.lr,
        weight_decay=args.weight_decay, lr_schedule=args.scheduler,
        num_epochs=args.num_epoch, seed=args.seed,
        transfer_dtype="bfloat16" if getattr(args, "amp", False)
        else "float32",
        device_cache=getattr(args, "device_cache", "auto"),
        device_cache_bytes=int(getattr(args, "device_cache_gb", 6.0)
                               * (1 << 30)))
    engines = [SurvivalEngine(model, cfg, enc) for _ in folds]
    # one shared device cache: K private budgets would demand K x the HBM
    # budget, and path-keyed entries dedup bags across overlapping splits
    shared_cache = engines[0]._device_cache()
    if shared_cache is not None:
        for e in engines[1:]:
            e._dcache = shared_cache
    splits = [dataset.get_split(f) for f in folds]
    states = []
    for k, (tr, _) in enumerate(splits):
        example_len = np.asarray(dataset[tr[0]][1]).shape[0]
        states.append(engines[k].init(jax.random.PRNGKey(args.seed),
                                      example_len, n_features))
    stacked = stack_states(states)
    tx = engines[0].tx
    loss_fn = engines[0]._loss
    step_cache = {}

    def pstep(length: int):
        if length not in step_cache:
            step_cache[length] = make_fold_parallel_surv_step(
                model, tx, loss_fn, length)
        return step_cache[length]

    best_score = [0.0] * k_folds
    best_epoch = [0] * k_folds
    key = jax.random.PRNGKey(cfg.seed)
    for epoch in range(cfg.num_epochs):
        orders = []
        for k in range(k_folds):
            order = list(splits[k][0])
            engines[k]._rng.shuffle(order)
            orders.append(order)
        lrs = np.asarray([engines[k].epoch_lr(epoch)
                          for k in range(k_folds)], np.float32)
        t_par = min(len(o) for o in orders)
        ep_key = jax.random.fold_in(key, epoch)
        losses_dev = []
        for t in range(t_par):
            # bags come through each engine's _prep_indexed (device cache,
            # transfer dtype), padded to their OWN bucket and zero-extended
            # on device to the step's common bucket
            parts = [engines[k]._prep_indexed(dataset, orders[k][t])
                     for k in range(k_folds)]
            spec = max((p[2] for p in parts), key=lambda s: s.data_length)
            pad_to = spec.data_length
            xs = [jnp.pad(p[0], ((0, 0), (0, pad_to - p[0].shape[1]),
                                 (0, 0))) if p[0].shape[1] != pad_to
                  else p[0] for p in parts]
            ms = [jnp.pad(p[1], ((0, 0), (0, pad_to - p[1].shape[1])))
                  if p[1].shape[1] != pad_to else p[1] for p in parts]
            x = jnp.stack(xs)                                # (K, 1, N, C)
            m = jnp.stack(ms)
            y = jnp.asarray(np.asarray([p[5] for p in parts],
                                       np.int32))[:, None]
            c = jnp.asarray(np.asarray([p[4] for p in parts],
                                       np.float32))[:, None]
            # every fold's sequential run draws the dropout key
            # fold_in(fold_in(key, epoch), j) with j RESET each epoch
            # (SurvivalEngine.train_epoch), so the stacked rngs replicate
            # that stream exactly -- identical across folds
            rngs = jnp.stack([jax.random.fold_in(ep_key, t)] * k_folds)
            stacked, losses, _ = pstep(spec.repr_length)(
                stacked, x, m, y, c, jnp.asarray(lrs), rngs)
            losses_dev.append(losses)

        if any(len(o) > t_par for o in orders):
            states = unstack_states(stacked, k_folds)
            for k in range(k_folds):
                for t in range(t_par, len(orders[k])):
                    xk, mk, spec, _, cen, lab = engines[k]._prep_indexed(
                        dataset, orders[k][t])
                    states[k], _, _ = engines[k]._train_step(
                        states[k], xk, mk, jnp.asarray([lab], jnp.int32),
                        jnp.asarray([cen], jnp.float32),
                        jnp.float32(lrs[k]),
                        jax.random.fold_in(ep_key, t),
                        spec.repr_length)
            stacked = stack_states(states)

        states = unstack_states(stacked, k_folds)
        tr_loss = (float(np.asarray(jnp.stack(losses_dev)).mean())
                   if losses_dev else 0.0)
        msgs = []
        for k in range(k_folds):
            val_loss, val_ci = engines[k].validate(states[k].params,
                                                   dataset, splits[k][1])
            if engines[k]._plateau is not None:
                engines[k]._plateau.step(val_loss)
            if val_ci > best_score[k]:
                best_score[k], best_epoch[k] = val_ci, epoch
                fold_dir = os.path.join(results_dir, f"fold_{folds[k]}")
                os.makedirs(fold_dir, exist_ok=True)
                save_params(os.path.join(
                    fold_dir, f"model_best_{val_ci:.4f}_{epoch}.msgpack"),
                    states[k].params)
            msgs.append(f"f{folds[k]} ci {val_ci:.4f}")
        logger.print(f"epoch {epoch}: train loss {tr_loss:.4f} | "
                     + ", ".join(msgs))

    for k in range(k_folds):
        logger.print(f"fold {folds[k]}: best c-index {best_score[k]:.4f} "
                     f"@ epoch {best_epoch[k]}")
        meter.update(best_score[k], best_epoch[k])
    meter.save(os.path.join(results_dir, f"results_{args.model}.csv"))
    return meter
