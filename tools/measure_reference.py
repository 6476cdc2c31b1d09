"""Measure the reference PyTorch RRTMIL forward on THIS host's CPU.

BASELINE.md's A100 number is a literature-scaled estimate (the reference
publishes no throughput); this tool produces the one baseline we can measure
honestly in the sandbox: eager-PyTorch reference vs this repo's JAX model on
the SAME CPU, at the north-star measurement point (1, 9000, 1024)
(reference flops.ipynb final cell; C16-R50 config: epeg_k=15, crmsa_k=1,
crmsa_heads=8, all_shortcut).

Writes BASELINE_MEASURED.json at the repo root:
  {"torch_cpu_slides_per_s": ..., "jax_cpu_slides_per_s": ...,
   "cpu_speedup": ..., "host": ..., "n_patches": 9000}

Usage: python tools/measure_reference.py [--iters 5]
"""
from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PATCHES = 9000
INPUT_DIM = 1024


def _install_timm_shim():
    """The reference imports timm (not installed); provide the two symbols
    it uses (same shim as tools/make_goldens.py)."""
    import torch.nn as nn

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.DropPath = DropPath
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)


def measure_torch(iters: int) -> float:
    import torch

    _install_timm_shim()
    sys.path.insert(0, "/root/reference")
    from modules.rrt import RRTMIL  # noqa: E402

    torch.manual_seed(0)
    model = RRTMIL(input_dim=INPUT_DIM, n_classes=2, epeg_k=15, crmsa_k=1,
                   crmsa_heads=8, all_shortcut=True, dropout=0.0,
                   trans_dropout=0.0).eval()
    x = torch.randn(1, N_PATCHES, INPUT_DIM)
    with torch.no_grad():
        model(x)  # warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            model(x)
            best = min(best, time.perf_counter() - t0)
    return 1.0 / best


def measure_jax(iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL

    cfg = c16_r50()
    model = RRTMIL(cfg)
    spec = bucket_for(N_PATCHES, cfg.encoder)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, spec.data_length, INPUT_DIM), jnp.float32)
    mask = jnp.broadcast_to(jnp.arange(spec.data_length)[None] < N_PATCHES,
                            (1, spec.data_length))
    params = model.init({"params": key}, x, mask=mask,
                        length=spec.repr_length, deterministic=True)["params"]
    fwd = jax.jit(lambda p, x, m: model.apply(
        {"params": p}, x, mask=m, length=spec.repr_length,
        deterministic=True))
    np.asarray(fwd(params, x, mask))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fwd(params, x, mask))
        best = min(best, time.perf_counter() - t0)
    return 1.0 / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    torch_rate = measure_torch(args.iters)
    print(f"reference torch CPU: {torch_rate:.2f} slides/s")
    jax_rate = measure_jax(args.iters)
    print(f"repo jax CPU:        {jax_rate:.2f} slides/s")
    out = {
        "metric": "RRTMIL fwd slides/s at (1, 9000, 1024), C16-R50 config",
        "torch_cpu_slides_per_s": round(torch_rate, 3),
        "jax_cpu_slides_per_s": round(jax_rate, 3),
        "cpu_speedup": round(jax_rate / torch_rate, 3),
        "host": platform.processor() or platform.machine(),
        "n_cpus": os.cpu_count(),
        "n_patches": N_PATCHES,
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
