"""Autotune RB (regions per Pallas program) for the fused region-attention
kernels on the real chip at the flagship shape (N~9k: R=64, H=8, P=144,
hd=64, kk=15).  Prints per-RB fwd and fwd+bwd times."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from rrtmil_tpu.ops.pallas.region_attn import _fused_fwd_pallas
from rrtmil_tpu.ops.pallas.region_attn_bwd import region_attention_bwd_pallas

R, H, P, HD, KK = 64, 8, 144, 64, 15
SCALE = HD ** -0.5
key = jax.random.PRNGKey(0)
q, k, v, g = (jax.random.normal(jax.random.fold_in(key, i), (R, H, P, HD),
                                jnp.float32) for i in range(4))
w = jax.random.normal(jax.random.fold_in(key, 4), (H, KK)) * 0.1
b = jax.random.normal(jax.random.fold_in(key, 5), (H,)) * 0.1

REPS = 50


def timed(fn, *args):
    # loop-in-jit timing: tunnel block_until_ready is unreliable; compare
    # K-rep vs 1-rep scalar fetch
    def body(reps):
        def step(i, acc):
            out = fn(*[a + 0.0 * acc for a in args])
            o = out[0] if isinstance(out, tuple) else out
            return acc + o.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, step, jnp.float32(0.0))

    f_many = jax.jit(lambda: body(REPS))
    f_one = jax.jit(lambda: body(1))
    float(f_many())  # compile + warm
    float(f_one())
    t0 = time.perf_counter(); float(f_one()); t1 = time.perf_counter()
    float(f_many())
    t2 = time.perf_counter(); float(f_many()); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (REPS - 1)


print(f"devices: {jax.devices()}", flush=True)
for rb in (1, 2, 4, 8, 16):
    try:
        tf = timed(lambda *a: _fused_fwd_pallas(*a, scale=SCALE, rb=rb),
                   q, k, v, w, b)
        print(f"rb={rb:3d}  fwd {tf*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"rb={rb:3d}  fwd FAILED: {str(e)[:120]}", flush=True)
    try:
        tb = timed(lambda *a: region_attention_bwd_pallas(*a, scale=SCALE,
                                                          rb=rb),
                   q, k, v, w, b, g)
        print(f"rb={rb:3d}  bwd {tb*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"rb={rb:3d}  bwd FAILED: {str(e)[:120]}", flush=True)

# post-epeg-fold shapes: the production path runs the PLAIN (kk=0) kernels
print("--- kk=0 (epeg_fold production path) ---", flush=True)
for rb in (1, 2, 4, 8, 16, 32, 64):
    try:
        tf = timed(lambda *a: _fused_fwd_pallas(*a, w=None, b=None,
                                                scale=SCALE, rb=rb),
                   q, k, v)
        print(f"rb={rb:3d}  fwd0 {tf*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"rb={rb:3d}  fwd0 FAILED: {str(e)[:120]}", flush=True)
    try:
        tb = timed(lambda *a: region_attention_bwd_pallas(
                       a[0], a[1], a[2], None, None, a[3],
                       scale=SCALE, rb=rb),
                   q, k, v, g)
        print(f"rb={rb:3d}  bwd0 {tb*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"rb={rb:3d}  bwd0 FAILED: {str(e)[:120]}", flush=True)
