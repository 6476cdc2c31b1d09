"""Capture a jax.profiler trace of the flagship TRAIN step (fwd + fused
Pallas backward + Adam) and summarize per-op-group device time -- the
profile that says where the remaining train-step time goes after the
whole-layer backward fusion (VERDICT r5 work).

Usage: python tools/trace_train.py [--batch 8] [--out docs/traces/train]
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_fwd import summarize  # noqa: E402

N_PATCHES = 9000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="docs/traces/train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.train.engine import Engine, EngineConfig
    from rrtmil_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    cfg = dataclasses.replace(
        c16_r50(), encoder=dataclasses.replace(c16_r50().encoder,
                                               compute_dtype="bfloat16"))
    model = RRTMIL(cfg)
    engine = Engine(model, EngineConfig(), encoder_cfg=cfg.encoder)
    spec = bucket_for(N_PATCHES, cfg.encoder)
    key = jax.random.PRNGKey(0)
    state = engine.init(key, N_PATCHES, cfg.input_dim)

    b = args.batch
    x = jax.random.normal(key, (b, spec.data_length, cfg.input_dim),
                          jnp.float32)
    mask = jnp.broadcast_to(jnp.arange(spec.data_length)[None] < N_PATCHES,
                            (b, spec.data_length))
    labels = jnp.zeros((b,), jnp.int32)
    lr = jnp.float32(2e-4)

    def one(st):
        st, meters = engine._train_step(st, x, mask, labels, lr, key,
                                        spec.repr_length)
        return st, meters

    state, meters = one(state)                       # compile + warm
    float(np.asarray(meters)[0])
    tdir = args.out
    shutil.rmtree(tdir, ignore_errors=True)
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            state, meters = one(state)
            float(np.asarray(meters)[0])
    traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                       recursive=True)
    s = summarize(traces[-1], args.iters)
    s["per_slide_ms"] = round(s["device_ms_per_iter"] / b, 3)
    for f in glob.glob(os.path.join(tdir, "**", "*"), recursive=True):
        if os.path.isfile(f) and not f.endswith(".trace.json.gz"):
            os.remove(f)
    import json
    print(json.dumps(s, indent=1))
    with open(os.path.join(tdir, "SUMMARY.json"), "w") as f:
        json.dump({"batch": b, "n_patches": N_PATCHES, **s}, f, indent=1)


if __name__ == "__main__":
    main()
