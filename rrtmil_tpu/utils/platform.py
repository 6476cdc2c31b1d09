"""Platform selection helper for CLI entry points.

Some sandboxes register an out-of-tree TPU PJRT plugin at interpreter
startup (sitecustomize) and pin it via `jax.config`, which silently
overrides the `JAX_PLATFORMS` environment variable.  CLI entry points call
`apply_platform_env()` so the documented idiom

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python survival_main.py --sp_shards 4 ...

behaves as JAX documents it: the env var wins.  No-op when JAX_PLATFORMS
is unset or the backend is already initialized.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized; too late to switch


def enable_compile_cache(min_compile_time_secs: float = 0.1) -> None:
    """Persistent XLA compile cache shared by every entry point.

    The threshold matters as much as the directory: a remote/tunneled
    compiler takes ~0.5 s even for scalar eager ops (broadcast_in_dim,
    convert_element_type, threefry), and a fresh training process dispatches
    ~25 distinct ones before its first step -- at the default 1 s threshold
    none persist, so every run re-pays ~25 x 0.5 s of compilation before
    epoch 0 (measured; see tools/train_bench.py).  0.1 s persists them
    once and forever."""
    import jax

    cache_dir = os.environ.get(
        "RRTMIL_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_time_secs)
    except Exception:
        pass
