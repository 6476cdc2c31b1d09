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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

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
    # min-of-3 per K (tunnel fetch noise is strictly additive; a single
    # noisy K=1 sample once produced a negative slope)
    t_of = {}
    for _ in range(3):
        for k in (1, ITERS):
            t0 = time.perf_counter()
            fetch(run(state, x, mask, labels, k))
            dt = time.perf_counter() - t0
            t_of[k] = min(t_of.get(k, float("inf")), dt)
    per_step = (t_of[ITERS] - t_of[1]) / (ITERS - 1)
    return per_step / batch


def _disk_dataset(n_slides: int, input_dim: int, seed: int = 0):
    import tempfile

    from rrtmil_tpu.data.datasets import C16Dataset

    rng = np.random.default_rng(seed)
    tmp = tempfile.mkdtemp(prefix="train_bench_")
    os.makedirs(os.path.join(tmp, "pt"), exist_ok=True)
    names = []
    for i in range(n_slides):
        np.save(os.path.join(tmp, "pt", f"s{i}.npy"),
                rng.standard_normal((N_PATCHES, input_dim),
                                    ).astype(np.float32))
        names.append(f"s{i}")
    return C16Dataset(names, [i % 2 for i in range(n_slides)], tmp)


def measure_host_pipeline(batch: int = 8, n_slides: int = 16) -> dict:
    """Cold-path costs per batch over an on-disk .npy dataset, split into
    (a) host assembly (native C++ load + bf16 cast + pad into a reused
    staging buffer), (b) host-blocking transfer DISPATCH (staging copy --
    what the prefetch thread occupies), and (c) transfer COMPLETION, timed
    by forcing a device consumer and fetching a scalar: on this sandbox's
    tunneled chip block_until_ready returns before the wire transfer
    finishes, so dispatch-only timings understate H2D by ~50x (measured
    ~25 MB/s completed vs ~1.5 GB/s apparent).  (d) is the warm
    device-cache batch rebuild (device-side concat of HBM-resident bags)
    timed the same to-completion way -- the steady-state cost that
    replaces (a)+(b)+(c) after a bag's first epoch."""
    cfg = c16_r50()
    engine = Engine(RRTMIL(cfg),
                    EngineConfig(batch_size=batch,
                                 transfer_dtype="bfloat16",
                                 device_cache="off"),
                    encoder_cfg=cfg.encoder)
    ds = _disk_dataset(n_slides, cfg.input_dim)
    idx = list(range(batch))

    @jax.jit
    def consume(x):
        return x.astype(jnp.float32).sum()

    def complete(x):
        return float(np.asarray(consume(x)))

    def best_of(fn, n=4):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    engine._assemble_host(ds, idx, True)      # warm page cache / lib load
    t_asm = best_of(lambda: engine._assemble_host(ds, idx, True))
    x, mask, labels, spec = engine._assemble_host(ds, idx, True)
    complete(jnp.zeros((batch, x.shape[1], x.shape[2]), x.dtype))  # warm jit

    t_disp = best_of(lambda: engine._transfer_slides(x, mask, labels))

    def transfer_complete():
        parts = engine._transfer_slides(x, mask, labels)
        complete(jnp.concatenate([p[0] for p in parts], axis=0))

    t_full = best_of(transfer_complete, n=3)

    cached = Engine(RRTMIL(cfg),
                    EngineConfig(batch_size=batch,
                                 transfer_dtype="bfloat16",
                                 device_cache="on"),
                    encoder_cfg=cfg.encoder)
    cached._make_batch(ds, idx, True)         # populate the device cache

    def warm_complete():
        xb, mb, lb, _ = cached._make_batch(ds, idx, True)
        complete(xb)

    warm_complete()
    t_warm = best_of(warm_complete)
    bag_mb = x.nbytes / batch / 1e6
    return {
        "host_assemble_ms_per_slide": round(t_asm / batch * 1e3, 2),
        "h2d_dispatch_ms_per_slide": round(t_disp / batch * 1e3, 2),
        "h2d_completed_ms_per_slide": round(t_full / batch * 1e3, 1),
        "h2d_completed_mb_per_s": round(x.nbytes / t_full / 1e6, 1),
        "bag_mb_bf16": round(bag_mb, 1),
        "warm_cached_batch_ms_per_slide": round(t_warm / batch * 1e3, 3),
        "note": ("h2d_completed is the tunnel-attached sandbox's wire "
                 "bandwidth, not host work; a PCIe-attached host moves "
                 "the same bag ~100x faster.  The device cache removes "
                 "this cost entirely after each bag's first epoch."),
    }


def measure_end_to_end(batch: int = 8, n_slides: int = 32,
                       epochs: int = 4) -> dict:
    """Disk -> device -> train-step epochs with the production engine
    (bf16 transfer + compute, device cache on, prefetch workers): epoch 0
    pays the one-time transfer of every bag; later epochs rebuild batches
    from HBM and should run at the device-only rate."""
    cfg = c16_r50()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder,
                                         compute_dtype="bfloat16"))
    engine = Engine(RRTMIL(cfg),
                    EngineConfig(batch_size=batch,
                                 transfer_dtype="bfloat16",
                                 device_cache="on", num_workers=2),
                    encoder_cfg=cfg.encoder)
    ds = _disk_dataset(n_slides, cfg.input_dim)
    key = jax.random.PRNGKey(0)
    state = engine.init(key, N_PATCHES, cfg.input_dim)
    # Warm every program in the epoch path (train step, batch concats,
    # meter stack) on a same-shape throwaway dataset first: through this
    # sandbox's tunnel the FIRST execution of each compiled program costs
    # seconds (program upload), which would otherwise be billed to the
    # timed epoch 0.  Epoch 0 below then measures the real one-time cost
    # of a cold epoch: disk read + bf16 cast + host->device transfer.
    warm_ds = _disk_dataset(n_slides, cfg.input_dim, seed=123)
    warm_state = jax.tree.map(jnp.copy, state)
    engine.train_epoch(warm_state, warm_ds, 0, jax.random.fold_in(key, 99))
    del warm_state
    if engine._dcache is not None:
        engine._dcache.drop_dataset(warm_ds)  # free the warmup bags' HBM
    rates = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        state, _ = engine.train_epoch(state, ds, epoch,
                                      jax.random.fold_in(key, epoch))
        rates.append(n_slides / (time.perf_counter() - t0))
    return {
        "n_slides": n_slides,
        "epoch0_slides_per_s": round(rates[0], 1),
        # epoch 1 still compiles nothing new but may top up the cache;
        # steady state is the best of the later epochs
        "warm_epoch_slides_per_s": round(max(rates[1:]), 1),
        "epoch_rates": [round(r, 1) for r in rates],
    }


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
        host = measure_host_pipeline(batch=8)
        results.update(host)
        print("host pipeline batch=8 (per slide): "
              f"assemble {host['host_assemble_ms_per_slide']} ms, "
              f"h2d dispatch {host['h2d_dispatch_ms_per_slide']} ms, "
              f"h2d completed {host['h2d_completed_ms_per_slide']} ms "
              f"({host['h2d_completed_mb_per_s']} MB/s wire); warm cached "
              f"rebuild {host['warm_cached_batch_ms_per_slide']} ms",
              flush=True)
    except Exception as e:
        results["host_pipeline_error"] = str(e)[:200]
        print(f"host pipeline FAILED: {str(e)[:120]}", flush=True)
    try:
        e2e = measure_end_to_end(batch=8)
        results["end_to_end_b8"] = e2e
        dev = results["modes"].get("bfloat16_b8", {}).get("slides_per_s")
        if dev:
            e2e["warm_vs_device_only"] = round(
                e2e["warm_epoch_slides_per_s"] / dev, 3)
        print(f"end-to-end epochs (disk->step, b8): {e2e['epoch_rates']} "
              "slides/s (epoch 0 pays the one-time bag transfer; later "
              "epochs serve bags from the device cache)", flush=True)
    except Exception as e:
        results["end_to_end_error"] = str(e)[:200]
        print(f"end-to-end FAILED: {str(e)[:120]}", flush=True)
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
