"""Component-level timing of the flagship RRTMIL forward at N~9k.

Times each stage of the forward (patch_to_emb projection, R-MSA layer,
CR-MSA layer, final LN + attention pool + head, and the fused kernel alone)
with the same K-loop-in-jit estimator bench.py uses, so the per-component
numbers decompose the end-to-end slides/s figure (VERDICT r2 weak #2: ~80%
of forward time was outside the north-star kernel, unprofiled).

Usage:  python tools/profile_fwd.py [--batch B] [--json out.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PATCHES = 9000
INPUT_DIM = 1024


def _cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def time_fn(fn, args, iters=50, repeats=3):
    """Per-call seconds via the independent-minima loop estimator."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(k, *a):
        # the 0*acc term chains iteration i+1's input to iteration i's
        # output so the loop cannot pipeline across iterations (see
        # bench.py fwd_loop)
        def body(i, acc):
            out = fn(*a, i + 0.0 * acc)
            return acc + out
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(np.asarray(loop(1, *args)))
    float(np.asarray(loop(iters, *args)))
    best_k, best_1 = float("inf"), float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(loop(iters, *args)))
        best_k = min(best_k, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(np.asarray(loop(1, *args)))
        best_1 = min(best_1, time.perf_counter() - t0)
    return max((best_k - best_1) / (iters - 1), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()
    _cache()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rrtmil_tpu.config import c16_r50
    from rrtmil_tpu.data.bucketing import bucket_for
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.models.rrt import RRTEncoder, TransLayer
    from rrtmil_tpu.ops.pallas.region_attn import region_attention_fused

    b = args.batch
    cfg = dataclasses.replace(
        c16_r50(), encoder=dataclasses.replace(
            c16_r50().encoder, compute_dtype="bfloat16"))
    ecfg = cfg.encoder
    model = RRTMIL(cfg)
    spec = bucket_for(N_PATCHES, ecfg)
    L = spec.repr_length
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, spec.data_length, INPUT_DIM), jnp.float32)
    mask = jnp.broadcast_to(jnp.arange(spec.data_length)[None] < N_PATCHES,
                            (b, spec.data_length))
    params = model.init({"params": key}, x[:1], mask=mask[:1], length=L,
                        deterministic=True)["params"]

    results = {}

    # full model
    def full(p, x, m, i):
        out = model.apply({"params": p}, x + 1e-6 * i, mask=m, length=L,
                          deterministic=True)
        return out.sum()
    results["full_model"] = time_fn(full, (params, x, mask))

    # patch_to_emb projection (1024 -> 512 + relu + mask)
    emb = nn.Dense(512, dtype=jnp.bfloat16, name="patch_to_emb")
    p2e = {"params": {"kernel": params["patch_to_emb"]["kernel"],
                      "bias": params["patch_to_emb"]["bias"]}}

    def proj(x, m, i):
        h = emb.apply(p2e, x + 1e-6 * i)
        h = jax.nn.relu(h) * m[..., None].astype(h.dtype)
        return h.sum().astype(jnp.float32)
    results["patch_to_emb"] = time_fn(proj, (x, mask))

    # encoder (both layers + final LN)
    enc = RRTEncoder(ecfg)
    h0 = jax.device_put(np.asarray(
        jax.nn.relu(emb.apply(p2e, x)) * mask[..., None].astype(jnp.bfloat16)))

    def encoder(p, h, m, i):
        out = enc.apply({"params": p}, h + (1e-6 * i).astype(h.dtype),
                        mask=m, length=L, deterministic=True)
        return out.sum().astype(jnp.float32)
    results["encoder"] = time_fn(encoder, (params["online_encoder"], h0, mask))

    # R-MSA TransLayer alone / CR-MSA TransLayer alone
    rl = TransLayer(ecfg.rmsa_layer())
    def rmsa(p, h, m, i):
        out = rl.apply({"params": p}, h + (1e-6 * i).astype(h.dtype),
                       mask=m, length=L, deterministic=True)
        return out.sum().astype(jnp.float32)
    results["rmsa_layer"] = time_fn(
        rmsa, (params["online_encoder"]["layer0"], h0, mask))

    cl = TransLayer(ecfg.crmsa_layer())
    def crmsa(p, h, m, i):
        out = cl.apply({"params": p}, h + (1e-6 * i).astype(h.dtype),
                       mask=m, length=L, deterministic=True)
        return out.sum().astype(jnp.float32)
    results["crmsa_layer"] = time_fn(
        crmsa, (params["online_encoder"]["cr_msa"], h0, mask))

    # fused kernel alone at the R-MSA shape (R*B regions, H heads, P, hd)
    from rrtmil_tpu.ops.regions import grid_geometry
    geom = grid_geometry(L, ecfg.rmsa_layer().rmsa.region)
    r, h_, p_, hd = geom.num_regions * b, ecfg.n_heads, \
        geom.tokens_per_region, ecfg.dim // ecfg.n_heads
    q = jax.random.normal(key, (r, h_, p_, hd), jnp.float32)
    scale = hd ** -0.5

    def kern(q, i):
        out = region_attention_fused(q + 1e-6 * i, q, q, None, None, scale,
                                     jnp.bfloat16)
        return out.sum()
    results["fused_kernel_noepeg"] = time_fn(kern, (q,))

    # pool + head (post-encoder epilogue)
    from rrtmil_tpu.models.pool import DAttention
    pool = DAttention(512, "relu", False, False, False)
    pp = {"params": params["pool_fn"]}
    head_k = params["predictor"]["kernel"]
    head_b = params["predictor"]["bias"]
    hf = jax.device_put(np.asarray(h0, np.float32))

    def pool_head(h, m, i):
        feat = pool.apply(pp, h + 1e-6 * i, mask=m)
        return (feat @ head_k + head_b).sum()
    results["pool_head"] = time_fn(pool_head, (hf, mask))

    dev = jax.devices()[0].device_kind
    print(f"# device: {dev}, batch={b}, N={N_PATCHES}, bucket={L}")
    full_ms = results["full_model"] * 1e3
    for k, v in results.items():
        ms = v * 1e3
        print(f"{k:22s} {ms:8.3f} ms  ({ms / full_ms * 100:5.1f}% of full)"
              f"   per-slide {ms / b:7.3f} ms")
    acc = (results["patch_to_emb"] + results["rmsa_layer"]
           + results["crmsa_layer"] + results["pool_head"])
    print(f"{'sum of stages':22s} {acc * 1e3:8.3f} ms "
          f"({acc / results['full_model'] * 100:5.1f}% of full)")
    print(f"slides/s (full): {b / results['full_model']:.1f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "device": dev,
                       **{k: v for k, v in results.items()}}, f, indent=1)


if __name__ == "__main__":
    main()
