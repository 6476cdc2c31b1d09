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
~25 slides/s forward.  Replace with a measured number when an A100 is
available.
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
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def measure(batch: int, iters: int = 100, repeats: int = 3) -> float:
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
        def body(i, acc):
            out = model.apply({"params": p}, x + 1e-6 * i, mask=m,
                              length=spec.repr_length, deterministic=True)
            return acc + out.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(np.asarray(fwd_loop(params, x, mask, 1)))   # compile + warm
    float(np.asarray(fwd_loop(params, x, mask, iters)))
    # tunnel fetch latency is noisy and strictly additive, so take the
    # best (K-1)-forward delta over several repeats
    per_fwd = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(fwd_loop(params, x, mask, iters)))
        dt_k = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(fwd_loop(params, x, mask, 1)))
        dt_1 = time.perf_counter() - t0
        per_fwd = min(per_fwd, max((dt_k - dt_1) / (iters - 1), 1e-9))
    return batch / per_fwd


def main():
    # The sandbox TPU tunnel can wedge; bound the whole run so the driver
    # always gets a process exit instead of an indefinite hang.
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("bench timed out (TPU tunnel unresponsive)")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)
    _enable_compile_cache()

    best, best_b = 0.0, 1
    for b in (1, 8):
        try:
            rate = measure(b)
        except Exception:
            continue
        if rate > best:
            best, best_b = rate, b
    result = {
        "metric": "slides_per_s_per_chip_rrtmil_fwd_n9k",
        "value": round(best, 2),
        "unit": "slides/s",
        "vs_baseline": round(best / A100_BASELINE_SLIDES_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
