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
