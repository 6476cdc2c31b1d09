"""Hand-scheduled sequence parallelism over the region axis (shard_map).

The reference scales long bags *algorithmically in one device's memory*
(region_num=16 for survival, reference README.md:61, Survival/main.py:125);
this module is the multi-chip generalization (SURVEY.md §2.5/§5.7):

  * the bag's square grid is split into contiguous slabs of grid ROWS, one
    per `sp` shard, aligned to whole region-rows -- R-MSA attention never
    crosses region boundaries, so every R-MSA layer is embarrassingly
    parallel and bit-exact;
  * CR-MSA compresses each region to `crmsa_k` representative tokens; the
    only collective is an all-gather of those tokens over ICI
    (crmsa_k * nR * C floats, e.g. 3*256*512*4 B = 1.5 MB for a 50k-patch
    bag) -- the cross-region attention is then computed replicated and each
    shard keeps its slice (models/rrt.py CrossRegionAttention sp path);
  * attention pooling uses a pmax/psum-stable global softmax
    (models/pool.py sharded_attention_pool).

Grid-matching note: the sharded path evaluates BOTH the R-MSA and CR-MSA
layers on the unified `region_num`-aligned grid.  For bag lengths whose
ceil-sqrt side rounds identically for region_num and the CR-MSA's fixed
modulus 8 (always true when the bucket representative side is a multiple of
16), this is bit-identical to the reference; otherwise the CR-MSA sees a
slightly larger zero-padded grid (zeros attend, as the reference's own pad
does) -- a controlled deviation flagged in SURVEY.md §7.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import RRTEncoderConfig, RRTMILConfig
from ..models.rrt import RRTMIL, RRTEncoder
from ..ops.regions import grid_geometry


def sharded_config(cfg, sp: int, axis: str = "sp"):
    """Return a copy of an RRTEncoderConfig / RRTMILConfig with the
    sequence-parallel fields set."""
    if isinstance(cfg, RRTMILConfig):
        return dataclasses.replace(
            cfg, encoder=sharded_config(cfg.encoder, sp, axis))
    return dataclasses.replace(cfg, sp_shards=sp, sp_axis=axis)


def check_shardable(length: int, cfg: RRTEncoderConfig, sp: int) -> int:
    """Validate that a bag of `length` splits into whole region-rows on
    every layer; returns the (unified) padded length."""
    geoms = []
    if cfg.n_layers > 1 and cfg.attn_mode == "rmsa":
        geoms.append(grid_geometry(length, cfg.rmsa_layer().rmsa.region))
    if cfg.cr_msa:
        geoms.append(grid_geometry(length, cfg.crmsa_layer().crmsa.region))
    grid = max(g.grid for g in geoms)
    for g in geoms:
        if grid % (sp * g.region_size) != 0:
            raise ValueError(
                f"length {length}: grid {grid} not divisible into whole "
                f"region-rows (rs={g.region_size}) across sp={sp}")
    return grid * grid


def sharded_bucket_for(length: int, cfg: RRTEncoderConfig, sp: int):
    """Bucket a bag length for the sequence-sharded path: round the grid
    side up (at the layers' gcd granularity) until `check_shardable`
    accepts it, i.e. every layer's regions split into whole region-rows
    across `sp` shards.  Returns (repr_length, data_length).

    Compared to `data.bucketing.bucket_for` this may pad a little further
    (padding attends as zeros exactly like the reference's own pad,
    rmsa.py:199-200), trading a few percent of FLOPs for an exact sharding."""
    import math
    from ..data.bucketing import encoder_regions, _rounding_modulus
    regions = encoder_regions(cfg)
    mods = [_rounding_modulus(r) for r in regions]
    g = math.gcd(*mods) if len(mods) > 1 else mods[0]
    scfg = dataclasses.replace(cfg, sp_shards=sp, sp_axis=cfg.sp_axis or "sp")
    s = int(math.ceil(math.sqrt(length)))
    s_b = s + (-s) % g
    for _ in range(64):
        repr_length = s_b * s_b
        try:
            return repr_length, check_shardable(repr_length, scfg, sp)
        except ValueError:
            s_b += g
    raise ValueError(f"no shardable bucket for length {length} at sp={sp}")


def make_seqshard_forward(model_cfg: RRTMILConfig, mesh: Mesh, length: int,
                          sp_axis: str = "sp"):
    """Build (model, jitted forward) running the full RRTMIL with the token
    axis sharded over `sp_axis` (and bags over 'dp' if present in the mesh).

    The returned forward takes (params, x, mask) with x: (B, N, C) GLOBAL
    arrays; shard_map splits the token axis.  N must equal the unified
    padded length from `check_shardable`.
    """
    sp = mesh.shape[sp_axis]
    cfg = sharded_config(model_cfg, sp, sp_axis)
    model = RRTMIL(cfg)
    n_pad = check_shardable(length, cfg.encoder, sp)

    has_dp = "dp" in mesh.shape and mesh.shape["dp"] > 1
    batch_spec = P("dp") if has_dp else P()
    x_spec = P(batch_spec[0] if has_dp else None, sp_axis, None)
    m_spec = P(batch_spec[0] if has_dp else None, sp_axis)

    def local_forward(params, x_local, mask_local):
        out = model.apply({"params": params}, x_local, mask=mask_local,
                          length=length, deterministic=True)
        return out

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata, so the vma checker rejects the fused kernels under shard_map.
    fwd = shard_map(
        local_forward, mesh=mesh,
        in_specs=(P(), x_spec, m_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    return model, jax.jit(fwd), n_pad


def make_seqshard_value_and_grad(model_cfg: RRTMILConfig, mesh: Mesh,
                                 length: int, loss_fn, sp_axis: str = "sp"):
    """(model, value_and_grad(params, x, mask, labels, rng), n_pad) with the
    forward/backward running through shard_map over the region axis
    (gradients of the replicated params are psum-reduced by shard_map's
    transpose)."""
    sp = mesh.shape[sp_axis]
    cfg = sharded_config(model_cfg, sp, sp_axis)
    model = RRTMIL(cfg)
    n_pad = check_shardable(length, cfg.encoder, sp)

    has_dp = "dp" in mesh.shape and mesh.shape["dp"] > 1
    bdim = "dp" if has_dp else None
    x_spec = P(bdim, sp_axis, None)
    m_spec = P(bdim, sp_axis)
    l_spec = P(bdim)

    def local_loss(params, x_local, mask_local, labels, rng):
        logits = model.apply({"params": params}, x_local, mask=mask_local,
                             length=length, deterministic=False,
                             rngs={"dropout": rng})
        loss = loss_fn(logits, labels)
        if has_dp:
            loss = jax.lax.pmean(loss, "dp")
        return loss

    def value_and_grad(params, x, mask, labels, rng):
        def wrapped(p):
            # check_vma=False: pallas_call out_shapes carry no
            # varying-mesh-axes metadata, so the vma checker rejects the
            # fused kernels under shard_map.
            return shard_map(
                partial(local_loss, p), mesh=mesh,
                in_specs=(x_spec, m_spec, l_spec, P()),
                out_specs=P(),
                check_vma=False,
            )(x, mask, labels, rng)

        return jax.value_and_grad(wrapped)(params)

    return model, value_and_grad, n_pad


def make_seqshard_train_step(model_cfg: RRTMILConfig, mesh: Mesh, length: int,
                             tx, loss_fn, sp_axis: str = "sp"):
    """Sequence-sharded training step: forward/backward through shard_map,
    optimizer update replicated."""
    import optax
    from ..train.engine import TrainState

    model, value_and_grad, n_pad = make_seqshard_value_and_grad(
        model_cfg, mesh, length, loss_fn, sp_axis)
    # tx.update is called with lr=lr; accept plain transforms (ADVICE r3).
    tx = optax.with_extra_args_support(tx)

    def step(state: TrainState, x, mask, labels, lr, rng):
        loss, grads = value_and_grad(state.params, x, mask, labels, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params, lr=lr)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return model, jax.jit(step), n_pad
