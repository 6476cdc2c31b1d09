"""Fold-parallel CV (--fold_parallel): all folds trained simultaneously on
the (fold,) axis must reproduce the sequential harness.

Equal-length bags + zero dropout make the comparison exact: buckets
coincide across folds (no geometry deviation) and no RNG-shaped noise
enters, so per-fold test metrics must match run_cv's."""
import os

import numpy as np

import main as cli
from rrtmil_tpu.harness.classification import run_cv
from rrtmil_tpu.harness.fold_parallel import run_cv_fold_parallel


def _write_equal_length_dataset(root, n_patients=12, dim=32, length=100,
                                seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "pt"), exist_ok=True)
    signal = rng.normal(size=(dim,))
    signal /= np.linalg.norm(signal)
    rows = []
    for i in range(n_patients):
        name = f"slide_{i:03d}"
        label = i % 2
        bag = rng.normal(size=(length, dim)).astype(np.float32)
        if label:
            bag[: length // 8] += 2.5 * signal
        np.save(os.path.join(root, "pt", name + ".npy"), bag)
        rows.append(f"{name},{label}")
    with open(os.path.join(root, "label.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def _args(tmp_path, out, **overrides):
    args = cli.build_parser().parse_args([])
    args.dataset_root = str(tmp_path / "data")
    args.model_path = str(tmp_path / out)
    args.input_dim = 32
    args.cv_fold = 3
    args.num_epoch = 2
    args.early_stopping = False
    args.datasets = "camelyon16"
    args.no_log = True
    args.dropout = 0.0
    args.trans_drop_out = 0.0
    for k, v in overrides.items():
        setattr(args, k, v)
    return cli.postprocess_args(args)


def test_fold_parallel_matches_sequential(tmp_path):
    _write_equal_length_dataset(str(tmp_path / "data"))
    seq = run_cv(_args(tmp_path, "seq", epeg_k=9, crmsa_k=1))
    par = run_cv_fold_parallel(_args(tmp_path, "par", epeg_k=9, crmsa_k=1))
    assert len(par["auc"]) == 3
    np.testing.assert_allclose(par["auc"], seq["auc"], atol=1e-6)
    np.testing.assert_allclose(par["acs"], seq["acs"], atol=1e-6)
    np.testing.assert_allclose(par["fs"], seq["fs"], atol=1e-6)


def test_fold_parallel_cli_flag(tmp_path):
    """--fold_parallel routes through the parallel harness."""
    _write_equal_length_dataset(str(tmp_path / "data"))
    args = _args(tmp_path, "cli", fold_parallel=True, num_epoch=1)
    metrics = run_cv_fold_parallel(args)
    assert len(metrics["auc"]) == 3
    assert all(0.0 <= a <= 1.0 for a in metrics["auc"])


def test_survival_fold_parallel_matches_sequential(tmp_path):
    """VERDICT r3 next #8: the vmapped all-folds-at-once survival CV must
    reproduce the sequential 5-fold harness.  Equal-length bags keep every
    fold in one bucket, so trajectories coincide exactly (modulo vmap
    reduction order)."""
    import os

    import numpy as np

    from rrtmil_tpu.harness.survival import (run_survival_cv,
                                             run_survival_fold_parallel)

    rng = np.random.default_rng(3)
    dim, n = 24, 10
    feat_dir = tmp_path / "feats"
    os.makedirs(feat_dir, exist_ok=True)
    rows = ["Study,ID,Event,Status,WSI"]
    for i in range(n):
        bag = rng.normal(size=(48, dim)).astype(np.float32)
        p = feat_dir / f"case_{i}.npy"
        np.save(p, bag)
        rows.append(f"syn,case_{i},{100.0 * (i + 1)},{i % 2},{p}")
    csv_path = tmp_path / "syn.csv"
    csv_path.write_text("\n".join(rows) + "\n")

    class A:
        folder = "plip"
        dataset_root = None
        model = "MeanMIL"
        loss = "nll_surv"
        optimizer = "Adam"
        scheduler = "cosine"
        lr = 2e-4
        weight_decay = 1e-5
        num_epoch = 2
        seed = 1
        epeg_k = 9
        crmsa_k = 1
        no_log = True
        resume = ""
        evaluate = False
        excel_file = str(csv_path)
        input_dim = dim
        device_cache = "off"

    a_seq = A()
    a_seq.results_dir = str(tmp_path / "seq")
    meter_seq = run_survival_cv(a_seq)
    a_par = A()
    a_par.results_dir = str(tmp_path / "par")
    meter_par = run_survival_fold_parallel(a_par)

    np.testing.assert_allclose(
        np.asarray(meter_par.cindex[1:6], np.float64),
        np.asarray(meter_seq.cindex[1:6], np.float64), atol=1e-9)
    assert meter_par.epochs[1:6] == meter_seq.epochs[1:6]
    # trajectory-level parity: the saved best-checkpoint PARAMETERS must
    # match (c-index alone is a coarse rank statistic; the dropout rng
    # stream divergence of round 4's first cut passed it while training
    # different weights)
    from flax import serialization
    for k in range(5):
        def best(d):
            fd = tmp_path / d / f"fold_{k}"
            return sorted(fd.glob("*.msgpack"))[-1]
        p_seq = serialization.msgpack_restore(best("seq").read_bytes())
        p_par = serialization.msgpack_restore(best("par").read_bytes())
        for (kp, a), (_, b) in zip(
                sorted((("/".join(map(str, path)), leaf) for path, leaf in
                        _flatten(p_seq))),
                sorted((("/".join(map(str, path)), leaf) for path, leaf in
                        _flatten(p_par)))):
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=kp)


def _flatten(tree, prefix=()):
    for key, val in tree.items():
        if isinstance(val, dict):
            yield from _flatten(val, prefix + (key,))
        else:
            yield prefix + (key,), val


def test_fold_parallel_augmented_matches_sequential(tmp_path):
    """Round-4 fix: the parallel loop now routes bags through each fold's
    engine._make_batch, so host shuffle augmentation applies with the
    same per-fold RNG stream as the sequential harness (previously the
    parallel steps silently skipped augmentation while the ragged tails
    applied it)."""
    _write_equal_length_dataset(str(tmp_path / "data"))
    seq = run_cv(_args(tmp_path, "seq_aug", epeg_k=9, crmsa_k=1,
                       patch_shuffle=True))
    par = run_cv_fold_parallel(_args(tmp_path, "par_aug", epeg_k=9,
                                     crmsa_k=1, patch_shuffle=True))
    np.testing.assert_allclose(par["auc"], seq["auc"], atol=1e-6)
    np.testing.assert_allclose(par["acs"], seq["acs"], atol=1e-6)
