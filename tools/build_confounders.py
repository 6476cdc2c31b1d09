"""Offline IBMIL confounder pipeline: AB-MIL -> bag features -> k-means.

The reference runs this via Survival/models/IBMIL/Clustering.sh +
clustering.py:50-134 (faiss PCA-whiten + GPU k-means over bag embeddings of
a trained AB-MIL) and main.py:197-202 consumes the per-fold prototypes.
This tool is the end-to-end TPU-native equivalent:

  for each CV fold (the SAME folds run_cv will use -- shared
  harness.classification.make_splits):
    1. train AB-MIL on the fold's train split for --confounder_epochs;
    2. extract the pooled 512-d bag embedding of every training bag;
    3. PCA-whiten + k-means++ (data/confounders.py) -> k prototypes in
       the ORIGINAL feature space (clustering.py:107-134 quirk preserved);
    4. save {out}/{fold}/train_bag_cls_agnostic_feats_proto_{k}.npy.

Then train IBMIL with:
  python main.py --model ibmil --confounder_path OUT --confounder_k K ...

Usage: same flags as main.py plus --confounder_out / --confounder_epochs;
--model is ignored (stage 1 is always AB-MIL, per the reference pipeline).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fold_confounders(args, fold: int, splits, out_dir: str,
                           epochs: int, k: int) -> str:
    import jax

    from rrtmil_tpu.harness.classification import (_make_datasets,
                                                   engine_config_from_args)
    from rrtmil_tpu.models import zoo
    from rrtmil_tpu.data.confounders import (build_confounders,
                                             extract_bag_features)
    from rrtmil_tpu.train.engine import Engine

    train_set, _, _ = _make_datasets(args, fold, splits)
    model = zoo.build_model("attmil", input_dim=args.input_dim,
                            n_classes=args.n_classes, dropout=args.dropout,
                            act=args.act)
    ecfg = engine_config_from_args(args)
    ecfg.num_epochs = epochs
    ecfg.aux_mode = None
    engine = Engine(model, ecfg)
    example_len = max(train_set.bag(0).shape[0], 64)
    state = engine.init(jax.random.PRNGKey(args.seed), example_len,
                        args.input_dim)
    key = jax.random.PRNGKey(args.seed + 1000 * fold)
    for epoch in range(epochs):
        state, _ = engine.train_epoch(state, train_set, epoch,
                                      jax.random.fold_in(key, epoch))

    feats = extract_bag_features(model, state.params, train_set)
    protos = build_confounders(feats, k=k, seed=args.seed)
    fold_dir = os.path.join(out_dir, str(fold))
    os.makedirs(fold_dir, exist_ok=True)
    path = os.path.join(fold_dir,
                        f"train_bag_cls_agnostic_feats_proto_{k}.npy")
    np.save(path, protos)
    return path


def run(args) -> list:
    from rrtmil_tpu.harness.classification import make_splits

    splits = make_splits(args)
    out_dir = args.confounder_out
    paths = []
    for fold in range(args.cv_fold):
        path = build_fold_confounders(args, fold, splits, out_dir,
                                      args.confounder_epochs,
                                      args.confounder_k)
        print(f"fold {fold}: wrote {path}")
        paths.append(path)
    return paths


def main(argv=None):
    from main import build_parser, postprocess_args

    parser = build_parser()
    parser.add_argument("--confounder_out", type=str, required=True,
                        help="output directory for per-fold prototypes")
    parser.add_argument("--confounder_epochs", type=int, default=20,
                        help="AB-MIL training epochs per fold (stage 1)")
    args = postprocess_args(parser.parse_args(argv))
    from rrtmil_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(args)


if __name__ == "__main__":
    main()
