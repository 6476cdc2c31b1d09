"""Test harness configuration.

Tests run on the host CPU with 8 virtual devices so that multi-chip sharding
(mesh/pjit/shard_map) is exercised without TPU hardware, mirroring how JAX
codebases test multi-host logic.  NOTE: the sandbox pins JAX_PLATFORMS=axon
(a tunneled TPU); `jax.config.update` takes precedence, and XLA_FLAGS must be
set before the backend is first touched.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
