"""Full training-step benchmark: fwd + fused Pallas backward + Adam at the
flagship shape (RRTMIL, Camelyon16-R50 config, N~9k), matching bench.py's
loop-in-jit timing methodology (the tunnel's block_until_ready is
unreliable).  Prints ms/slide for fp32 and bf16 activation modes at batch
1 and 8."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rrtmil_tpu.config import c16_r50
from rrtmil_tpu.data.bucketing import bucket_for
from rrtmil_tpu.models import RRTMIL
from rrtmil_tpu.train.engine import Engine, EngineConfig

N_PATCHES = 9000
ITERS = 20


def measure(batch: int, compute_dtype: str) -> float:
    cfg = c16_r50()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder,
                                         compute_dtype=compute_dtype))
    model = RRTMIL(cfg)
    engine = Engine(model, EngineConfig(), encoder_cfg=cfg.encoder)
    spec = bucket_for(N_PATCHES, cfg.encoder)
    key = jax.random.PRNGKey(0)
    state = engine.init(key, N_PATCHES, cfg.input_dim)

    x = jax.random.normal(key, (batch, spec.data_length, cfg.input_dim),
                          jnp.float32)
    mask = jnp.broadcast_to(jnp.arange(spec.data_length)[None] < N_PATCHES,
                            (batch, spec.data_length))
    labels = jnp.zeros((batch,), jnp.int32)
    lr = jnp.float32(2e-4)

    # x/mask/labels enter as ARGUMENTS: closing over them bakes the batch
    # into the program as constants, and the sandbox's remote compile
    # service rejects >~100 MB request bodies (HTTP 413) at batch 8.
    def loop(state, x, mask, labels, k):
        def body(i, st):
            st, *_ = engine._train_step(
                st, x + 1e-6 * i, mask, labels, lr,
                jax.random.fold_in(key, i), spec.repr_length)
            return st
        return jax.lax.fori_loop(0, k, body, state)

    run = jax.jit(loop, static_argnums=(4,))

    def fetch(st):
        return float(np.asarray(jax.tree.leaves(st.params)[0]).ravel()[0])

    fetch(run(state, x, mask, labels, 1))                  # compile + warm
    fetch(run(state, x, mask, labels, ITERS))
    t0 = time.perf_counter()
    fetch(run(state, x, mask, labels, 1))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    fetch(run(state, x, mask, labels, ITERS))
    t3 = time.perf_counter()
    per_step = ((t3 - t2) - (t1 - t0)) / (ITERS - 1)
    return per_step / batch


def measure_host_pipeline(batch: int = 8, n_slides: int = 16) -> float:
    """Host-side batch assembly time (native C++ load + pad + cast) per
    batch over an on-disk .npy dataset — the overlap budget: the prefetch
    thread (engine._batch_iter) hides this behind the device step, so the
    pipeline is device-bound iff this is below the device step time."""
    import tempfile

    from rrtmil_tpu.data.datasets import C16Dataset

    cfg = c16_r50()
    engine = Engine(RRTMIL(cfg), EngineConfig(batch_size=batch),
                    encoder_cfg=cfg.encoder)
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="train_bench_")
    os.makedirs(os.path.join(tmp, "pt"), exist_ok=True)
    names = []
    for i in range(n_slides):
        np.save(os.path.join(tmp, "pt", f"s{i}.npy"),
                rng.standard_normal((N_PATCHES, cfg.input_dim),
                                    ).astype(np.float32))
        names.append(f"s{i}")
    ds = C16Dataset(names, [i % 2 for i in range(n_slides)], tmp)
    idx = list(range(batch))
    engine._make_batch(ds, idx, True)     # warm page cache / lib load
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        engine._make_batch(ds, idx, True)
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="",
                    help="write results JSON (e.g. TRAIN_BENCH_r03.json)")
    cli = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    results = {"metric": "train_step_ms_per_slide_rrtmil_n9k",
               "device_kind": jax.devices()[0].device_kind,
               "modes": {}}
    for dt in ("bfloat16", "float32"):
        for b in (1, 8):
            try:
                ms = measure(b, dt) * 1e3
                results["modes"][f"{dt}_b{b}"] = {
                    "ms_per_slide": round(ms, 3),
                    "slides_per_s": round(1e3 / ms, 1)}
                print(f"{dt:9s} batch={b}  {ms:7.3f} ms/slide "
                      f"({1e3 / ms:7.1f} slides/s)", flush=True)
            except Exception as e:
                results["modes"][f"{dt}_b{b}"] = {"error": str(e)[:200]}
                print(f"{dt:9s} batch={b}  FAILED: {str(e)[:120]}", flush=True)
    try:
        host_s = measure_host_pipeline(batch=8)
        results["host_pipeline_ms_per_slide"] = round(host_s / 8 * 1e3, 2)
        print(f"host pipeline batch=8: {host_s * 1e3:7.1f} ms/batch "
              f"({host_s / 8 * 1e3:6.2f} ms/slide) -- overlapped by "
              f"engine._batch_iter prefetch", flush=True)
    except Exception as e:
        print(f"host pipeline FAILED: {str(e)[:120]}", flush=True)
    # train MFU: useful fwd FLOPs x3 (fwd + bwd ~2x) over the bf16 peak
    try:
        from rrtmil_tpu.utils.flops import rrtmil_flops
        macs = rrtmil_flops(N_PATCHES, c16_r50())["total"]
        best = min(m["ms_per_slide"] for m in results["modes"].values()
                   if "ms_per_slide" in m)
        peak = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}.get(
            results["device_kind"])
        if peak:
            results["train_mfu"] = round(
                (3 * 2 * macs) / (best * 1e-3) / peak, 4)
    except Exception:
        pass
    if cli.out:
        with open(cli.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {cli.out}", flush=True)
