"""Device mesh construction and sharding specs.

The framework's parallel axes (SURVEY.md §2.5):

  * `dp` -- data parallelism over slide (bag) batches; gradients psum over
    ICI.  The 5-fold CV loop is embarrassingly parallel on top of this.
  * `sp` -- sequence parallelism over the *region* axis of a bag.  R-MSA
    attention never crosses region boundaries (reference rmsa.py:204-230),
    so sharding regions is exact; CR-MSA's compressed tokens (crmsa_k per
    region) are the only cross-shard traffic (parallel/seqshard.py).

The reference has no distributed code at all (single GPU, batch 1); this
layer is new design constrained only by the reference's numerics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, sp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, sp) mesh.  dp defaults to n_devices // sp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (bag) axis over dp; tokens replicated or sharded
    over sp by the seqshard layer."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def token_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, C) with bags over dp and tokens over sp.  Valid whenever N is
    a multiple of sp * row-block; the region partitioner keeps whole grid
    rows on one shard so regions never straddle shards."""
    return NamedSharding(mesh, P("dp", "sp", None))


# ---------------------------------------------------------------------------
# Multi-controller (multi-process / multi-host) bring-up
# ---------------------------------------------------------------------------

def initialize_multiprocess(coordinator_address: str, num_processes: int,
                            process_id: int,
                            cpu_collectives: str = "gloo") -> None:
    """Join a multi-controller JAX cluster (one process per host).

    On a real TPU pod each process owns its local chips and this is a thin
    veneer over ``jax.distributed.initialize`` (cluster schedulers usually
    provide the arguments via env); on CPU test rigs the gloo backend carries
    the cross-process psum/all-gather so the same mesh code runs without
    hardware.  After this returns, ``jax.devices()`` is the GLOBAL device
    list and ``make_mesh`` transparently builds pod-wide meshes; per-host
    input feeding goes through ``global_array``.

    Must be called before the backend is first touched (i.e. before any
    array op); ``jax.config.update('jax_platforms', 'cpu')`` beforehand
    forces the CPU backend on rigs that pin an accelerator platform.
    """
    # Select the CPU collectives implementation whenever the CPU backend can
    # end up hosting the mesh: jax_platforms explicitly containing 'cpu' OR
    # unset (auto-detect on an accelerator-less host resolves to cpu, where
    # the default implementation can hang cross-process).  The setting only
    # affects the CPU backend, so it is harmless when an accelerator wins.
    platforms = str(jax.config.jax_platforms or "")
    if not platforms or "cpu" in platforms:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_array(data, mesh: Mesh, pspec: P) -> jax.Array:
    """Assemble a mesh-global array from host-replicated numpy data.

    Every process passes the SAME full array; each device keeps only its
    shard (``make_array_from_callback`` slices by global index, so device
    order never matters).  For host-sharded input pipelines, pass each
    host's slice through ``jax.make_array_from_process_local_data`` instead.
    """
    data = np.asarray(data)
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(data.shape, sharding,
                                        lambda idx: data[idx])
