"""Survival prediction CLI -- TPU-native re-implementation of the
reference's Survival/main.py + Survival/utils/options.py flag surface."""
from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="configurations for survival prediction (TPU)")
    parser.add_argument("--excel_file", type=str, help="path to csv file")
    parser.add_argument("--folder", type=str, default="plip",
                        help="feature folder name [plip, resnet50]")
    parser.add_argument("--dataset_root", type=str, default=None,
                        help="root for relative WSI paths in the csv")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--log_data", action="store_true", default=True)
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--model", type=str, default="MeanMIL",
                        help="[RRTMIL, AttMIL, CLAM_SB, CLAM_MB, DSMIL, "
                             "TransMIL, MeanMIL, MaxMIL, IBMIL, DTFD, "
                             "MHIM-MIL]")
    parser.add_argument("--optimizer", type=str, default="Adam",
                        choices=["SGD", "Adam", "AdamW", "RAdam",
                                 "PlainRAdam", "Lookahead"])
    parser.add_argument("--scheduler", type=str, default="cosine",
                        choices=["None", "exp", "step", "plateau", "cosine"])
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_epoch", type=int, default=30)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--weight_decay", type=float, default=1e-5)
    parser.add_argument("--loss", type=str, default="nll_surv")
    parser.add_argument("--input_dim", type=int, default=None,
                        help="feature dim override (default: 512 for plip, "
                             "1024 otherwise)")
    parser.add_argument("--epeg_k", type=int, default=15)
    parser.add_argument("--crmsa_k", type=int, default=3)
    parser.add_argument("--no_log", action="store_true")
    parser.add_argument("--amp", action="store_true",
                        help="bfloat16 encoder compute + bag transfer "
                             "(the classification CLI's --amp mapping; "
                             "params, norms, softmax, loss stay fp32)")
    # TPU extension: HBM-resident bag cache (data/device_cache.py)
    parser.add_argument("--device_cache", default="auto", type=str,
                        choices=["auto", "on", "off"])
    parser.add_argument("--device_cache_gb", default=6.0, type=float)
    parser.add_argument("--fold_parallel", action="store_true",
                        help="train all 5 folds simultaneously (vmapped "
                             "fold axis; harness/survival.py "
                             "run_survival_fold_parallel)")
    parser.add_argument("--results_dir", type=str, default=None)
    parser.add_argument("--sp_shards", type=int, default=1,
                        help="sequence-parallel shards for long bags "
                             "(RRTMIL only): split the token grid across "
                             "this many devices (reference scales long bags "
                             "in one GPU's memory via region_num=16, "
                             "Survival/main.py:125; this is the multi-chip "
                             "generalization)")
    args = parser.parse_args(argv)

    if args.results_dir is None:
        dataset = os.path.basename(args.excel_file).split(".")[0] \
            if args.excel_file else "dataset"
        stamp = time.strftime("%Y-%m-%d]-[%H-%M-%S")
        args.results_dir = (f"./results/{dataset}/[{args.model}]-"
                            f"[{args.epeg_k}]-[{args.crmsa_k}]-"
                            f"[{args.folder}]-[{stamp}]")
    return args


def main():
    args = parse_args()
    print(args)
    from rrtmil_tpu.utils.platform import (apply_platform_env,
                                            enable_compile_cache)
    apply_platform_env()
    enable_compile_cache()
    if getattr(args, "fold_parallel", False):
        from rrtmil_tpu.harness.survival import run_survival_fold_parallel
        run_survival_fold_parallel(args)
    else:
        from rrtmil_tpu.harness.survival import run_survival_cv
        run_survival_cv(args)
    print("finished!")


if __name__ == "__main__":
    main()
