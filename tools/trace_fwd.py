"""Capture jax.profiler traces of the flagship forward and summarize the
device-side op timeline (VERDICT r3 next #2: commit the trace that
explains where forward time goes by batch).

Writes, per batch: the raw Perfetto trace (vm.trace.json.gz, viewable in
ui.perfetto.dev / tensorboard) under --out/<batch>/ and one merged
summary JSON with per-op-group device ms/iter.

Usage: python tools/trace_fwd.py [--batches 1 8 16] [--out docs/traces]
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PATCHES = 9000


def summarize(trace_path: str, iters: int) -> dict:
    d = json.load(gzip.open(trace_path))
    events = d["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev = {p for p, n in pid_names.items() if "TPU" in n}
    groups = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
            name = e["name"]
            if name.startswith("jit_"):
                total += e["dur"]
                continue
            groups[name.split(".")[0]] += e["dur"]
    top = dict(sorted(((k, round(v / iters / 1e3, 4))
                       for k, v in groups.items()),
                      key=lambda kv: -kv[1])[:15])
    return {"device_ms_per_iter": round(total / iters / 1e3, 3),
            "op_groups_ms_per_iter": top}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="docs/traces")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    cfg = dataclasses.replace(
        c16_r50(), encoder=dataclasses.replace(c16_r50().encoder,
                                               compute_dtype="bfloat16"))
    model = RRTMIL(cfg)
    spec = bucket_for(N_PATCHES, cfg.encoder)
    key = jax.random.PRNGKey(0)
    os.makedirs(args.out, exist_ok=True)
    summary = {"device_kind": jax.devices()[0].device_kind,
               "n_patches": N_PATCHES, "batches": {}}
    for b in args.batches:
        x = jax.random.normal(key, (b, spec.data_length, cfg.input_dim),
                              jnp.float32).astype(jnp.bfloat16)
        mask = jnp.broadcast_to(
            jnp.arange(spec.data_length)[None] < N_PATCHES,
            (b, spec.data_length))
        params = model.init({"params": key}, x[:1], mask=mask[:1],
                            length=spec.repr_length,
                            deterministic=True)["params"]
        fwd = jax.jit(lambda p, x, m: model.apply(
            {"params": p}, x, mask=m, length=spec.repr_length,
            deterministic=True).sum())
        float(np.asarray(fwd(params, x, mask)))          # compile + warm
        tdir = os.path.join(args.out, f"b{b}")
        shutil.rmtree(tdir, ignore_errors=True)
        with jax.profiler.trace(tdir):
            for _ in range(args.iters):
                float(np.asarray(fwd(params, x, mask)))
        traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                           recursive=True)
        s = summarize(traces[-1], args.iters)
        s["per_slide_ms"] = round(s["device_ms_per_iter"] / b, 3)
        summary["batches"][str(b)] = s
        # keep only the compact Perfetto trace, drop the bulky xplane
        for f in glob.glob(os.path.join(tdir, "**", "*"), recursive=True):
            if os.path.isfile(f) and not f.endswith(".trace.json.gz"):
                os.remove(f)
        print(f"b={b}: {s['device_ms_per_iter']} ms/iter "
              f"({s['per_slide_ms']} ms/slide)", flush=True)
    with open(os.path.join(args.out, "SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}/SUMMARY.json")


if __name__ == "__main__":
    main()
