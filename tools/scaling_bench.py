"""Scaling-efficiency measurement: sequence-parallel forward across shards.

Measures the long-bag (survival-config) RRTMIL forward at N~50k patches with
the region axis sharded over sp in {1, 2, 4, ...} and reports slides/s plus
parallel efficiency vs sp=1 -- the BASELINE.md scaling protocol ("measured
at 1 chip / 1 host / N>=2 hosts").  On a multichip slice the shards map to
chips over ICI; on the CPU backend (8 virtual devices) the numbers exercise
the same collective program and serve as a plumbing check, not a perf claim.

Usage:
    python tools/scaling_bench.py [--length 50000] [--sp 1 2 4] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, default=50000)
    ap.add_argument("--sp", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force 8 virtual CPU devices")
    ap.add_argument("--out", default="",
                    help="append results to this JSON file (e.g. "
                         "SCALING_r03.json)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rrtmil_tpu.config import survival_default
    from rrtmil_tpu.models import RRTMIL
    from rrtmil_tpu.parallel.mesh import make_mesh
    from rrtmil_tpu.parallel.seqshard import (check_shardable,
                                              make_seqshard_forward,
                                              sharded_config)

    cfg = survival_default()                     # region_num=16, 4 bins
    length = args.length
    results = {}

    for sp in args.sp:
        if sp > len(jax.devices()):
            continue
        scfg = sharded_config(cfg, sp)
        n_pad = check_shardable(length, scfg.encoder, sp)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, n_pad, cfg.input_dim), jnp.float32)
        mask = (jnp.arange(n_pad) < length)[None]

        if sp == 1:
            model = RRTMIL(cfg)
            params = jax.jit(lambda r, x_, m_: model.init(
                {"params": r}, x_, mask=m_, length=length,
                deterministic=True))(key, x, mask)["params"]

            @jax.jit
            def loop(p, x, m, k):
                def body(i, acc):
                    out = model.apply({"params": p}, x + 1e-6 * i, mask=m,
                                      length=length, deterministic=True)
                    return acc + out.sum()
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        else:
            mesh = make_mesh(dp=1, sp=sp, devices=jax.devices()[:sp])
            model, fwd, _ = make_seqshard_forward(cfg, mesh, length)
            # init with an UNSHARDED twin (identical param tree): the
            # sharded model's collectives are unbound outside shard_map
            init_model = RRTMIL(cfg)
            params = jax.jit(lambda r, x_, m_: init_model.init(
                {"params": r}, x_, mask=m_, length=length,
                deterministic=True))(key, x, mask)["params"]

            def loop(p, x, m, k, fwd=fwd, mesh=mesh):
                @jax.jit
                def run(p, x, m, k):
                    def body(i, acc):
                        return acc + fwd(p, x + 1e-6 * i, m).sum()
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                with mesh:
                    return run(p, x, m, k)

        float(np.asarray(loop(params, x, mask, 1)))
        t0 = time.perf_counter()
        float(np.asarray(loop(params, x, mask, args.iters)))
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(loop(params, x, mask, 1)))
        dt1 = time.perf_counter() - t0
        per = max((dt - dt1) / (args.iters - 1), 1e-9)
        results[sp] = 1.0 / per
        eff = results[sp] / (results[1] * sp) if 1 in results and sp > 1 else 1.0
        print(json.dumps({"sp": sp, "slides_per_s": round(1.0 / per, 3),
                          "efficiency_vs_sp1": round(eff, 3)}))

    if args.out:
        payload = {
            "metric": "seqshard_fwd_slides_per_s_n{}".format(length),
            "backend": jax.default_backend(),
            "device_kind": jax.devices()[0].device_kind,
            "note": ("CPU-mesh numbers exercise the collective program "
                     "(plumbing check, NOT a hardware perf claim); only "
                     "one real chip exists in this sandbox, so multi-chip "
                     "ICI efficiency cannot be measured here"),
            "results": {str(sp): {
                "slides_per_s": round(v, 3),
                "efficiency_vs_sp1": round(
                    v / (results[1] * sp), 3) if 1 in results else None}
                for sp, v in results.items()},
        }
        import os as _os
        existing = {}
        if _os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing[jax.default_backend()] = payload
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
