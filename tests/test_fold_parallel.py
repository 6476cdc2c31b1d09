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
