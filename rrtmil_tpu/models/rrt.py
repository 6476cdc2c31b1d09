"""RRT: regional re-embedding transformer (the heart of the framework).

TPU-native re-design of reference modules/rmsa.py + modules/rrt.py.

Design notes (vs. the PyTorch reference):

* **Static shapes / exact bucketing.** The reference re-pads every bag of
  true length L to an H x W square grid with H = W = ceil(sqrt(L)) rounded up
  to a multiple of `region_num`, pads with zeros that *attend* (not masked),
  and slices the pad off after each attention (rmsa.py:175-230).  Under XLA
  we instead carry the bag at a static bucket length `x.shape[1]` plus a
  boolean `mask` of true tokens, pass the true length `length` statically,
  and have every layer slice/zero-extend to its own reference-exact geometry.
  Because every term added to the residual stream is masked to zero on pad
  rows, the stream equals the reference's on real rows *exactly* and is zero
  elsewhere (the LayerNorm beta that would leak onto pad rows is masked
  before attention, reproducing "pad rows are zeros post-norm").

* **One fused region-batched attention.** All `region_num**2` regions are a
  single batched attention of shape (B*nR, P, P) -- one big MXU-friendly
  einsum instead of the reference's many small matmuls.  The EPEG depthwise
  (k,1) conv on the logit map runs per head along the query axis
  (rmsa.py:83,106-108).  A Pallas kernel (ops/pallas/region_attn.py) fuses
  logits+conv+softmax+AV for the hot configuration.

* **CR-MSA is the only cross-region op** (rmsa.py:232-337): each region is
  compressed to `crmsa_k` representative tokens, one tiny MHSA runs across
  regions, and results are redistributed.  Under sequence sharding this is
  the single collective boundary (parallel/seqshard.py).
"""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import (CRMSAConfig, InnerAttentionConfig, PoolConfig,
                      PosEmbedConfig, RMSAConfig, RRTEncoderConfig,
                      RRTMILConfig, TransLayerConfig)
from ..ops.epeg import depthwise_conv2d_nchw, epeg_fold_q, epeg_logit_conv
from ..ops.regions import grid_geometry, region_partition, region_reverse
from ..utils.inits import crmsa_phi_init, xavier_normal, zeros
from .nystrom import NystromAttention
from .pool import DAttention, MeanPool, masked_softmax
from .posemb import APE, PEG, PPEG, SINCOS


def _on_tpu() -> bool:
    """True when the default backend is a TPU (the sandbox tunnel reports
    platform 'axon'; anything that is not cpu/gpu is treated as TPU)."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _fit_length(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Static slice or zero-pad the token axis of (B, N, C) to `target`."""
    n = x.shape[1]
    if n == target:
        return x
    if n > target:
        return x[:, :target]
    return jnp.pad(x, ((0, 0), (0, target - n), (0, 0)))


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath, reference rrt.py:102)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """FFN block (reference rrt.py:25-41)."""

    hidden: int
    out: int
    act: str = "gelu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = ((lambda v: nn.gelu(v, approximate=False))
               if self.act == "gelu" else nn.relu)
        x = nn.Dense(self.hidden, kernel_init=xavier_normal, bias_init=zeros,
                     name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out, kernel_init=xavier_normal, bias_init=zeros,
                     name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DenseParams(nn.Module):
    """Parameter shell with nn.Dense's exact tree (kernel (in, out) +
    optional bias), init, and naming -- used by fused-kernel paths that
    consume raw weight values instead of running the Dense matmul.
    Checkpoints are interchangeable with the Dense-based path."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", xavier_normal,
                            (in_features, self.features))
        bias = (self.param("bias", zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class InnerAttention(nn.Module):
    """Scaled-dot-product MHSA over one region's tokens, with EPEG
    (reference modules/rmsa.py:56-134).

    Input: (B_, N, C) where B_ = batch * num_regions.  The EPEG variants:
      - 'attn' (default): depthwise (k,1) conv over the logit map, added to
        the raw logits pre-softmax (rmsa.py:106-108).
      - 'value_bf'/'value_af': depthwise conv on the value/output image
        (rmsa.py:114-129); requires N to be a perfect square.
    """

    cfg: InnerAttentionConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attn: bool = False):
        cfg = self.cfg
        b_, n, c = x.shape
        h, hd = cfg.num_heads, cfg.resolved_head_dim
        cdt = jnp.dtype(cfg.compute_dtype)

        ep = cfg.epeg
        fusable = ((not ep.enabled or (ep.kind == "attn" and not ep.two_d))
                   and cfg.attn_dropout == 0.0 and not return_attn)
        use_pallas = cfg.backend == "pallas" or (
            cfg.backend == "auto" and fusable and _on_tpu())

        if (use_pallas and fusable
                and os.environ.get("RRTMIL_FUSED_BLOCK", "1") != "0"):
            # Fully-fused block kernel: qkv + EPEG attention + out proj in
            # one pallas_call (ops/pallas/region_block.py) -- no qkv/head
            # transposes or (R, H, P, hd) operands ever touch HBM.  The
            # param tree matches the Dense-based path exactly (DenseParams).
            from ..ops.pallas.region_block import region_block_fused
            if ep.enabled:
                kernel = self.param("pe_kernel", xavier_normal,
                                    (ep.k, 1, 1, h))
                w = kernel[:, 0, 0, :].T              # (H, k)
                bias = (self.param("pe_bias", zeros, (h,))
                        if ep.bias else None)
            else:
                w, bias = None, None
            wqkv, bqkv = DenseParams(3 * h * hd, cfg.qkv_bias,
                                     name="qkv")(c)
            wp, bp = DenseParams(cfg.dim, True, name="proj")(h * hd)
            if bqkv is None:
                bqkv = jnp.zeros((3 * h * hd,), jnp.float32)
            w3 = wqkv.reshape(c, 3, h, hd).transpose(1, 2, 0, 3)
            b3 = bqkv.reshape(3, h, hd)
            out = region_block_fused(
                x.astype(cdt),
                w3[0] * cfg.scale, w3[1], w3[2],
                b3[0] * cfg.scale, b3[1], b3[2],
                w, bias, wp.reshape(h, hd, cfg.dim), bp,
                jnp.dtype(cfg.mm_dtype))
            out = nn.Dropout(cfg.proj_dropout)(out,
                                               deterministic=deterministic)
            return out

        qkv = nn.Dense(3 * h * hd, use_bias=cfg.qkv_bias,
                       kernel_init=xavier_normal, bias_init=zeros,
                       dtype=cdt, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (B_, h, N, hd)

        if use_pallas and fusable:
            # Fused Pallas path: logits + EPEG conv + softmax + AV in VMEM
            # (ops/pallas/region_attn.py).  Kernel params stored in the same
            # layout as the XLA path so checkpoints are interchangeable.
            from ..ops.pallas.region_attn import region_attention_fused
            if ep.enabled:
                kernel = self.param("pe_kernel", xavier_normal, (ep.k, 1, 1, h))
                w = kernel[:, 0, 0, :].T              # (H, k)
                bias = (self.param("pe_bias", zeros, (h,))
                        if ep.bias else None)
            else:
                w, bias = None, None
            fold_env = os.environ.get("RRTMIL_EPEG_FOLD", "")
            fold = cfg.epeg_fold if fold_env == "" else fold_env != "0"
            if w is not None and fold:
                # Fold the EPEG conv into q (exact: the query-axis conv
                # commutes with the key matmul, ops/epeg.epeg_fold_q) so the
                # kernel runs its plain kk=0 path; pe_bias is key-constant
                # and cancels in the row softmax (zero grad, as in the
                # reference), so it is dropped from the compute.
                q = (q.astype(jnp.float32) + epeg_fold_q(q, w)).astype(cdt)
                w, bias = None, None
            # kernel accepts bf16 refs directly (half the DMA); output fp32
            out = region_attention_fused(q, k, v, w, bias, cfg.scale,
                                         jnp.dtype(cfg.mm_dtype))
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, h * hd)
            out = out.astype(cdt)
        else:
            q = q * cfg.scale
            attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                              preferred_element_type=jnp.float32)

            if ep.enabled and ep.kind == "attn":
                kh, kw = (ep.k, ep.k) if ep.two_d else (ep.k, 1)
                kernel = self.param("pe_kernel", xavier_normal, (kh, kw, 1, h))
                bias = self.param("pe_bias", zeros, (h,)) if ep.bias else None
                attn = attn + epeg_logit_conv(attn, kernel, bias, ep.k, ep.two_d)

            attn = nn.softmax(attn, axis=-1)
            attn = nn.Dropout(cfg.attn_dropout)(
                attn, deterministic=deterministic)

            if ep.enabled and ep.kind == "value_bf":
                v = v + self._value_pe(v, n)

            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, h * hd)
            out = out.astype(cdt)

        if ep.enabled and ep.kind == "value_af":
            pe = self._value_pe(v, n, flat=True)
            out = out + pe

        out = nn.Dense(cfg.dim, kernel_init=xavier_normal, bias_init=zeros,
                       dtype=cdt, name="proj")(out)
        out = nn.Dropout(cfg.proj_dropout)(out, deterministic=deterministic)
        if return_attn:
            return out, attn
        return out

    def _value_pe(self, v, n, flat: bool = False):
        """Depthwise conv on values viewed as a sqrt(N) x sqrt(N) image
        (rmsa.py:114-129), including the reference's head/dim transpose
        quirk in the channel reinterpretation."""
        cfg = self.cfg
        ep = cfg.epeg
        h, hd = cfg.num_heads, cfg.resolved_head_dim
        ch = h * hd
        b_ = v.shape[0]
        s = int(math.ceil(math.sqrt(n)))
        if s * s != n:
            raise ValueError("value EPEG requires square region token count")
        kh, kw = (ep.k, ep.k) if ep.two_d else (ep.k, 1)
        kernel = self.param("pe_kernel", xavier_normal, (kh, kw, 1, ch))
        bias = self.param("pe_bias", zeros, (ch,)) if ep.bias else None
        img = v.transpose(0, 3, 1, 2).reshape(b_, ch, s, s)  # (B_, hd*h, s, s)
        pe = depthwise_conv2d_nchw(
            img, kernel, bias,
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)), groups=ch)
        if flat:
            return jnp.swapaxes(pe.reshape(b_, ch, n), -1, -2)
        return pe.reshape(b_, h, hd, n).transpose(0, 1, 3, 2)


class RegionAttention(nn.Module):
    """R-MSA: square-grid partition -> per-region MHSA -> merge
    (reference modules/rmsa.py:152-230).

    `length` is the true bag length (static); the input may be longer
    (bucket-padded with zero rows).  Output has the input's static length,
    zero-extended beyond this layer's reference grid.
    """

    cfg: RMSAConfig

    @nn.compact
    def __call__(self, x, length: Optional[int] = None,
                 deterministic: bool = True):
        b, n_in, c = x.shape
        length = n_in if length is None else length
        geom = grid_geometry(length, self.cfg.region)
        rs = geom.region_size
        sp = self.cfg.region.sp_shards

        if sp > 1:
            # Inside shard_map: x is a contiguous slab of grid rows.  R-MSA
            # never crosses region boundaries, so whole region-rows per shard
            # make the computation embarrassingly parallel and EXACT
            # (parallel/seqshard.py; SURVEY.md §2.5).
            if geom.grid % (sp * rs) != 0:
                raise ValueError(
                    f"seqshard: grid {geom.grid} must split into whole "
                    f"region-rows across sp={sp} (region_size={rs})")
            rows_local = geom.grid // sp
            x = _fit_length(x, rows_local * geom.grid)
            x = x.reshape(b, rows_local, geom.grid, c)
            regions = region_partition(x, rs)
        else:
            x = _fit_length(x, geom.padded_length)
            x = x.reshape(b, geom.grid, geom.grid, c)
            regions = region_partition(x, rs)      # (B*nR, rs*rs, C)

        if self.cfg.region_attn == "ntrans":
            regions = NystromAttention(self.cfg.nystrom, name="attn")(
                regions, deterministic=deterministic)
        else:
            regions = InnerAttention(self.cfg.attn, name="attn")(
                regions, deterministic=deterministic)

        if sp > 1:
            out = region_reverse(regions, rs, geom.grid // sp, geom.grid)
        else:
            out = region_reverse(regions, rs, geom.grid, geom.grid)
        return _fit_length(out, n_in)


class CrossRegionAttention(nn.Module):
    """CR-MSA: compress each region to crmsa_k representative tokens, run one
    MHSA across regions, redistribute (reference modules/rmsa.py:232-337).

    Generalized to batch > 1 (the reference only ever sees B=1): the
    cross-region attention runs per bag with batch B*crmsa_k.
    """

    cfg: CRMSAConfig

    @nn.compact
    def __call__(self, x, length: Optional[int] = None,
                 deterministic: bool = True):
        cfg = self.cfg
        b, n_in, c = x.shape
        length = n_in if length is None else length
        geom = grid_geometry(length, cfg.region)
        rs = geom.region_size
        nr = geom.num_regions
        p = geom.tokens_per_region
        kk = cfg.crmsa_k

        sp = cfg.region.sp_shards
        if sp > 1:
            if geom.grid % (sp * rs) != 0:
                raise ValueError(
                    f"seqshard: grid {geom.grid} must split into whole "
                    f"region-rows across sp={sp} (region_size={rs})")
            nr_local = nr // sp
            x = _fit_length(x, (geom.grid // sp) * geom.grid)
            x = x.reshape(b, geom.grid // sp, geom.grid, c)
            regions = region_partition(x, rs).reshape(b, nr_local, p, c)
            nr = nr_local
        else:
            x = _fit_length(x, geom.padded_length)
            x = x.reshape(b, geom.grid, geom.grid, c)
            regions = region_partition(x, rs).reshape(b, nr, p, c)

        use_fused = (not cfg.crmsa_mlp and sp == 1
                     and (cfg.attn.backend == "pallas"
                          or (cfg.attn.backend == "auto" and _on_tpu()))
                     and os.environ.get("RRTMIL_FUSED_CRMSA", "1") != "0")
        if use_fused:
            # Fused compress/redistribute kernels (ops/pallas/crmsa_kernels
            # .py): the token stream is read once for the phi dual-softmax
            # compression and written once by the redistribute, instead of
            # streaming through ~5 XLA einsum/softmax passes.  The tiny
            # cross-region attention in the middle is unchanged.
            from ..ops.pallas.crmsa_kernels import (crmsa_compress,
                                                    crmsa_redistribute)
            phi = self.param("phi", crmsa_phi_init(kk), (c, kk))
            mmd = jnp.dtype(cfg.attn.mm_dtype)
            flat = regions.reshape(b * nr, p, c)
            reps, wgt = crmsa_compress(flat, phi, mmd)
            reps = reps.reshape(b, nr, kk, c).transpose(0, 2, 1, 3)
            reps = reps.reshape(b * kk, nr, c)
            reps = InnerAttention(cfg.attn, name="attn")(
                reps, deterministic=deterministic)
            reps = reps.reshape(b, kk, nr, c).transpose(0, 2, 1, 3)
            reps = reps.reshape(b * nr, kk, c).astype(jnp.float32)
            out = crmsa_redistribute(wgt, reps, jnp.float32, mmd)
            out = region_reverse(out, rs, geom.grid, geom.grid)
            return _fit_length(out, n_in)

        # phi logits: (B, nR, k, P) (rmsa.py:304-307)
        if cfg.crmsa_mlp:
            t = nn.Dense(c // 4, use_bias=False, kernel_init=xavier_normal,
                         name="phi_fc1")(regions)
            t = jnp.tanh(t)
            logits = nn.Dense(kk, use_bias=False, kernel_init=xavier_normal,
                              name="phi_fc2")(t)
            logits = jnp.swapaxes(logits, -1, -2)
        else:
            phi = self.param("phi", crmsa_phi_init(kk), (c, kk))
            logits = jnp.swapaxes(
                jnp.einsum("brpc,ck->brpk", regions, phi), -1, -2)

        combine = nn.softmax(logits, axis=-1)       # over tokens (rmsa.py:309)
        dispatch = nn.softmax(logits, axis=-2)      # over k (rmsa.py:310)
        lmin = jnp.min(logits, axis=-1, keepdims=True)
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        dispatch_mm = (logits - lmin) / (lmax - lmin + 1e-8)  # (rmsa.py:312-314)

        # Compress: (B, k, nR, C) representative tokens (rmsa.py:316).
        reps = jnp.einsum("brpc,brkp->bkrc", regions, combine)

        if sp > 1:
            # The ONLY cross-shard op of the model: all-gather the tiny
            # compressed tokens (k per region) over ICI, attend across the
            # full region set replicated, keep the local slice.
            nr_full = nr * sp
            reps = jax.lax.all_gather(reps, cfg.region.sp_axis, axis=2,
                                      tiled=True)            # (B,k,nR_full,C)
            reps = reps.reshape(b * kk, nr_full, c)
            reps = InnerAttention(cfg.attn, name="attn")(
                reps, deterministic=deterministic)
            reps = reps.reshape(b, kk, nr_full, c)
            shard = jax.lax.axis_index(cfg.region.sp_axis)
            reps = jax.lax.dynamic_slice_in_dim(reps, shard * nr, nr, axis=2)
        else:
            # One MHSA across regions: batch B*k, sequence nR (rmsa.py:319-322).
            reps = reps.reshape(b * kk, nr, c)
            reps = InnerAttention(cfg.attn, name="attn")(
                reps, deterministic=deterministic)
            reps = reps.reshape(b, kk, nr, c)

        # Redistribute (rmsa.py:324-325).
        out = jnp.einsum("bkrc,brkp->brpc", reps, dispatch_mm * dispatch)

        h_rows = geom.grid // sp if sp > 1 else geom.grid
        out = region_reverse(out.reshape(b * nr, p, c), rs,
                             h_rows, geom.grid)
        return _fit_length(out, n_in)


class LayerNormParams(nn.Module):
    """Parameter shell matching nn.LayerNorm's tree (scale ones, bias
    zeros) for fused paths that run the norm inside a kernel."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _InnerAttentionParams(nn.Module):
    """InnerAttention's exact parameter tree (pe_kernel/pe_bias + qkv +
    proj DenseParams) without the compute -- consumed by the fused
    whole-layer kernel.  Paths and initializers match InnerAttention, so
    init values and checkpoints are interchangeable."""

    cfg: InnerAttentionConfig

    @nn.compact
    def __call__(self, c: int):
        a = self.cfg
        h, hd = a.num_heads, a.resolved_head_dim
        if a.epeg.enabled:
            kernel = self.param("pe_kernel", xavier_normal,
                                (a.epeg.k, 1, 1, h))
            w = kernel[:, 0, 0, :].T
            bias = (self.param("pe_bias", zeros, (h,))
                    if a.epeg.bias else None)
        else:
            w, bias = None, None
        wqkv, bqkv = DenseParams(3 * h * hd, a.qkv_bias, name="qkv")(c)
        wp, bp = DenseParams(a.dim, True, name="proj")(h * hd)
        return wqkv, bqkv, w, bias, wp, bp


class _RegionAttentionParams(nn.Module):
    """RegionAttention's nesting shell ('attn'/'attn'/...)."""

    cfg: InnerAttentionConfig

    @nn.compact
    def __call__(self, c: int):
        return _InnerAttentionParams(self.cfg, name="attn")(c)


def fused_crmsa_ok(cfg, x, mask, length: int) -> bool:
    """True when a TransLayer with this TransLayerConfig will dispatch its
    CR-MSA branch to the fused grid kernels.  Free function so RRTEncoder
    can decide (identically) whether to hand the layer its final-LayerNorm
    params for fusion into the redistribution's stream write."""
    if cfg.attn_mode != "crmsa" or mask is None:
        return False
    cr = cfg.crmsa
    if cr.crmsa_mlp or cr.region.sp_shards != 1:
        return False
    a = cr.attn
    if not (a.backend == "pallas"
            or (a.backend == "auto" and _on_tpu())):
        return False
    if os.environ.get("RRTMIL_FUSED_CRMSA_LAYER", "1") == "0":
        return False
    geom = grid_geometry(length, cr.region)
    if x.shape[1] != geom.padded_length:
        return False
    from ..ops.pallas.crmsa_kernels import crmsa_fusable_geometry
    return crmsa_fusable_geometry(geom.region_num, geom.region_size,
                                  x.shape[-1],
                                  jnp.dtype(x.dtype).itemsize)


def _apply_final_ln(x, mask, scale, bias, eps: float = 1e-6):
    """Encoder-final LayerNorm + mask on explicit params (the fallback for
    a final_ln the fused CR-MSA path could not consume); matches
    nn.LayerNorm(dtype=fp32) fast-variance semantics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True)
                      - mu * mu)
    z = (xf - mu) * jax.lax.rsqrt(var + eps)
    z = z * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if mask is not None:
        z = z * mask[..., None].astype(jnp.float32)
    return z


class _CRMSAFusedAttn(nn.Module):
    """CrossRegionAttention with the stream-touching halves fused: the
    LN/mask/partition-fused compression and the reverse/mask/residual-fused
    redistribution (ops/pallas/crmsa_kernels.py grid kernels) around the
    regular tiny cross-region InnerAttention.  Parameter tree ('phi' +
    'attn'/...) matches CrossRegionAttention.

    `final_ln=(scale, bias)` additionally fuses the ENCODER-FINAL
    LayerNorm + mask into the redistribution's stream write (the CR-MSA
    layer is the last encoder layer, reference modules/rrt.py:190-195);
    the return value is then the fp32 encoder output."""

    cfg: CRMSAConfig

    @nn.compact
    def __call__(self, x, mask, ln_s, ln_b, length: int,
                 deterministic: bool, add_residual: bool, final_ln=None,
                 final_shortcut=None):
        from ..ops.pallas.crmsa_kernels import (crmsa_compress_grid,
                                                crmsa_redistribute_grid,
                                                crmsa_redistribute_grid_ln)
        cfg = self.cfg
        b, n, c = x.shape
        geom = grid_geometry(length, cfg.region)
        kk = cfg.crmsa_k
        nr = geom.num_regions
        phi = self.param("phi", crmsa_phi_init(kk), (c, kk))
        mmd = jnp.dtype(cfg.attn.mm_dtype)
        reps, w = crmsa_compress_grid(x, mask, ln_s, ln_b, phi,
                                      geom.grid, geom.region_size, mmd)
        reps = reps.transpose(0, 2, 1, 3).reshape(b * kk, nr, c)
        reps = InnerAttention(cfg.attn, name="attn")(
            reps, deterministic=deterministic)
        reps = reps.reshape(b, kk, nr, c).transpose(0, 2, 1, 3) \
                   .astype(jnp.float32)
        if final_ln is not None:
            assert add_residual
            return crmsa_redistribute_grid_ln(
                x, mask, w, reps, final_ln[0], final_ln[1], final_shortcut,
                geom.grid, geom.region_size, mmd)
        return crmsa_redistribute_grid(x, mask, w, reps, geom.grid,
                                       geom.region_size, add_residual, mmd)


class TransLayer(nn.Module):
    """Pre-LN block: x + DropPath(attn(LN(x))), optional FFN
    (reference modules/rrt.py:43-131).

    The mask (True = real token) is applied after each LayerNorm so that pad
    rows enter attention as exact zeros -- reproducing the reference's
    "pad AFTER norm with zeros" ordering -- and after each residual branch so
    the stream stays zero on pad rows.

    On TPU the whole R-MSA residual branch (LN + mask + partition + EPEG
    attention + reverse + mask + residual) dispatches to ONE Pallas kernel
    (ops/pallas/region_layer.py) when the config allows; with dropout or
    drop-path active at train time the kernel returns the branch without
    the residual and dropout/droppath/residual run outside (the dropout
    rng is then drawn at this layer's path rather than InnerAttention's --
    a different but equally valid realization of the same distribution).
    """

    cfg: TransLayerConfig

    def _compute_dtype(self):
        cfg = self.cfg
        if cfg.attn_mode == "rmsa":
            return cfg.rmsa.attn.compute_dtype
        if cfg.attn_mode == "crmsa":
            return cfg.crmsa.attn.compute_dtype
        return "float32"

    def _fused_layer_ok(self, x, mask, length: int) -> bool:
        cfg = self.cfg
        if cfg.attn_mode != "rmsa" or mask is None:
            return False
        if cfg.rmsa.region_attn == "ntrans":
            return False
        if cfg.rmsa.region.sp_shards != 1:
            return False
        a = cfg.rmsa.attn
        ep = a.epeg
        if ep.enabled and (ep.kind != "attn" or ep.two_d):
            return False
        if a.attn_dropout != 0.0:
            return False
        if not (a.backend == "pallas"
                or (a.backend == "auto" and _on_tpu())):
            return False
        if os.environ.get("RRTMIL_FUSED_LAYER", "1") == "0":
            return False
        geom = grid_geometry(length, cfg.rmsa.region)
        if x.shape[1] != geom.padded_length:
            return False
        from ..ops.pallas.region_layer import layer_fusable_geometry
        return layer_fusable_geometry(
            geom.region_num, geom.region_size, x.shape[-1], a.num_heads,
            a.resolved_head_dim, jnp.dtype(x.dtype).itemsize)

    def _fused_rmsa_branch(self, x, mask, length: int, deterministic: bool):
        from ..ops.pallas.region_layer import region_layer_fused
        cfg = self.cfg
        a = cfg.rmsa.attn
        geom = grid_geometry(length, cfg.rmsa.region)
        c = x.shape[-1]
        h, hd = a.num_heads, a.resolved_head_dim
        scale, bias = LayerNormParams(c, name="norm")()
        wqkv, bqkv, w, pe_b, wp, bp = _RegionAttentionParams(
            a, name="attn")(c)
        if bqkv is None:
            bqkv = jnp.zeros((3 * h * hd,), jnp.float32)
        w3 = wqkv.reshape(c, 3, h, hd).transpose(1, 2, 0, 3)
        b3 = bqkv.reshape(3, h, hd)
        outside = (not deterministic) and (a.proj_dropout > 0
                                           or cfg.drop_path > 0)
        out = region_layer_fused(
            x, mask, scale, bias,
            w3[0] * a.scale, w3[1], w3[2],
            b3[0] * a.scale, b3[1], b3[2],
            w, pe_b, wp.reshape(h, hd, a.dim), bp,
            geom.grid, geom.region_size, not outside,
            jnp.dtype(a.mm_dtype))
        if outside:
            z = nn.Dropout(a.proj_dropout)(out, deterministic=False)
            return x + DropPath(cfg.drop_path, name="drop_path")(
                z, deterministic=False)
        return out

    def _fused_crmsa_ok(self, x, mask, length: int) -> bool:
        return fused_crmsa_ok(self.cfg, x, mask, length)

    def _fused_crmsa_branch(self, x, mask, length: int,
                            deterministic: bool, final_ln=None,
                            final_shortcut=None):
        cfg = self.cfg
        c = x.shape[-1]
        scale, bias = LayerNormParams(c, name="norm")()
        outside = (not deterministic) and cfg.drop_path > 0
        out = _CRMSAFusedAttn(cfg.crmsa, name="attn")(
            x, mask, scale, bias, length, deterministic,
            not outside, final_ln=None if outside else final_ln,
            final_shortcut=None if outside else final_shortcut)
        if outside:
            out = x + DropPath(cfg.drop_path, name="drop_path")(
                out, deterministic=False)
            if final_ln is not None:
                if final_shortcut is not None:
                    out = out + final_shortcut
                out = _apply_final_ln(out, mask, *final_ln)
        return out

    @nn.compact
    def __call__(self, x, mask=None, length: Optional[int] = None,
                 deterministic: bool = True, final_ln=None,
                 final_shortcut=None):
        cfg = self.cfg
        m = None if mask is None else mask[..., None].astype(x.dtype)
        length_r = x.shape[1] if length is None else length

        fused_rmsa = self._fused_layer_ok(x, mask, length_r)
        fused_crmsa = (not fused_rmsa
                       and self._fused_crmsa_ok(x, mask, length_r))
        if fused_rmsa or fused_crmsa:
            # final_ln rides the fused CR-MSA stream write only when no FFN
            # follows it; otherwise it is applied after the FFN below
            ln_inside = (fused_crmsa and not cfg.ffn
                         and final_ln is not None)
            x = (self._fused_rmsa_branch(x, mask, length_r, deterministic)
                 if fused_rmsa else
                 self._fused_crmsa_branch(
                     x, mask, length_r, deterministic,
                     final_ln=final_ln if ln_inside else None,
                     final_shortcut=final_shortcut if ln_inside else None))
            if cfg.ffn:
                z = nn.LayerNorm(name="norm2")(x)
                z = Mlp(int(cfg.dim * cfg.mlp_ratio), cfg.dim, cfg.ffn_act,
                        cfg.dropout, name="mlp")(z,
                                                 deterministic=deterministic)
                if m is not None:
                    z = z * m
                x = x + DropPath(cfg.drop_path, name="drop_path_ffn")(
                    z, deterministic=deterministic)
            if final_ln is not None and not ln_inside:
                if final_shortcut is not None:
                    x = x + final_shortcut
                x = _apply_final_ln(x, mask, *final_ln)
            return x

        z = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        # LayerNorm reduces in fp32; the normalized stream is written back
        # in the compute dtype so everything downstream (region partition,
        # qkv, kernel DMA) moves half the bytes in bfloat16 mode.
        z = z.astype(jnp.dtype(self._compute_dtype()))
        if m is not None:
            z = z * m
        if cfg.attn_mode == "rmsa":
            z = RegionAttention(cfg.rmsa, name="attn")(
                z, length=length, deterministic=deterministic)
        elif cfg.attn_mode == "crmsa":
            z = CrossRegionAttention(cfg.crmsa, name="attn")(
                z, length=length, deterministic=deterministic)
        elif cfg.attn_mode == "ntrans":
            z = NystromAttention(cfg.nystrom, name="attn")(
                z, deterministic=deterministic)
        else:
            raise NotImplementedError(cfg.attn_mode)
        if m is not None:
            z = z * m
        x = x + DropPath(cfg.drop_path, name="drop_path")(
            z, deterministic=deterministic)

        if cfg.ffn:
            z = nn.LayerNorm(name="norm2")(x)
            z = Mlp(int(cfg.dim * cfg.mlp_ratio), cfg.dim, cfg.ffn_act,
                    cfg.dropout, name="mlp")(z, deterministic=deterministic)
            if m is not None:
                z = z * m
            x = x + DropPath(cfg.drop_path, name="drop_path_ffn")(
                z, deterministic=deterministic)
        if final_ln is not None:
            if final_shortcut is not None:
                x = x + final_shortcut
            x = _apply_final_ln(x, mask, *final_ln)
        return x


class RRTEncoder(nn.Module):
    """The RRT re-embedding encoder (reference modules/rrt.py:133-202):
    (n_layers-1) R-MSA TransLayers -> 1 CR-MSA TransLayer -> optional global
    shortcut -> LayerNorm.  (B, N, C) -> (B, N, C)."""

    cfg: RRTEncoderConfig

    @nn.compact
    def __call__(self, x, mask=None, length: Optional[int] = None,
                 deterministic: bool = True):
        cfg = self.cfg
        squeeze = False
        if x.ndim == 2:                      # (N, C) convenience (rrt.py:168)
            x = x[None]
            squeeze = True

        length = x.shape[1] if length is None else length
        x_shortcut = x

        pos = self._pos_embed()
        if pos is not None and cfg.pos.pos_pos == -1:
            x = pos(x, length=length)
            if mask is not None:
                x = x * mask[..., None].astype(x.dtype)

        for i in range(cfg.n_layers - 1):
            if i == 1 and pos is not None and cfg.pos.pos_pos == 0:
                x = pos(x, length=length)
                if mask is not None:
                    x = x * mask[..., None].astype(x.dtype)
            x = TransLayer(cfg.rmsa_layer(), name=f"layer{i}")(
                x, mask=mask, length=length, deterministic=deterministic)

        if cfg.cr_msa:
            cl = cfg.crmsa_layer()
            # Hand the final-LayerNorm params to the CR-MSA layer when its
            # fused path will run and nothing (shortcut/FFN/drop-path)
            # separates the layer output from the final norm: the norm then
            # rides the redistribution kernel's stream write instead of its
            # own read+write pass (VERDICT r4 weak #3, the b4->b16 droop).
            fuse_final = (not cl.ffn
                          and not ((not deterministic) and cl.drop_path > 0)
                          and os.environ.get("RRTMIL_FUSED_FINAL_LN",
                                             "1") != "0"
                          and fused_crmsa_ok(cl, x, mask, length))
            if fuse_final:
                fs, fb = LayerNormParams(cfg.dim, name="norm")()
                x = TransLayer(cl, name="cr_msa")(
                    x, mask=mask, length=length,
                    deterministic=deterministic, final_ln=(fs, fb),
                    final_shortcut=(x_shortcut if cfg.all_shortcut
                                    else None))
                return x[0] if squeeze else x
            x = TransLayer(cl, name="cr_msa")(
                x, mask=mask, length=length, deterministic=deterministic)

        if cfg.all_shortcut:                 # (rrt.py:192-193)
            x = x + x_shortcut

        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x[0] if squeeze else x

    def _pos_embed(self):
        p = self.cfg.pos
        if p.kind == "ppeg":
            return PPEG(self.cfg.dim, p.k, p.bias, p.conv_1d, name="pos_embedding")
        if p.kind == "peg":
            return PEG(self.cfg.dim, p.k, p.bias, p.conv_1d, name="pos_embedding")
        if p.kind == "sincos":
            return SINCOS(self.cfg.dim, name="pos_embedding")
        if p.kind == "ape":
            return APE(self.cfg.dim, name="pos_embedding")
        return None


class RRTMIL(nn.Module):
    """Full model: Linear(input_dim->512)+act+dropout -> RRTEncoder ->
    attention pooling -> classifier (reference modules/rrt.py:204-246)."""

    cfg: RRTMILConfig

    @nn.compact
    def __call__(self, x, mask=None, length: Optional[int] = None,
                 deterministic: bool = True, return_attn: bool = False,
                 no_norm: bool = False):
        cfg = self.cfg
        if x.ndim == 2:
            x = x[None]
        length = x.shape[1] if length is None else length

        cdt = jnp.dtype(cfg.encoder.compute_dtype)
        x = nn.Dense(512, kernel_init=xavier_normal, bias_init=zeros,
                     dtype=cdt, name="patch_to_emb")(x)
        if cfg.act == "relu":
            x = nn.relu(x)
        elif cfg.act == "gelu":
            x = nn.gelu(x, approximate=False)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        if mask is not None:
            # Bucket-pad rows must be exact zeros entering the encoder: the
            # reference embeds only the L true tokens and pads with zeros
            # inside the encoder (rmsa.py:199-200).
            x = x * mask[..., None].astype(x.dtype)

        x = RRTEncoder(cfg.encoder, name="online_encoder")(
            x, mask=mask, length=length, deterministic=deterministic)
        x = x.astype(jnp.float32)      # pooling softmax + head in fp32

        if cfg.pool.kind == "attn":
            pool = DAttention(cfg.encoder.dim, cfg.pool.act, cfg.pool.gated,
                              cfg.pool.bias, cfg.pool.dropout,
                              axis_name=cfg.encoder.sp_axis
                              if cfg.encoder.sp_shards > 1 else None,
                              name="pool_fn")
            if return_attn:
                feat, attn = pool(x, mask=mask, return_attn=True,
                                  no_norm=no_norm, deterministic=deterministic)
            else:
                feat = pool(x, mask=mask, deterministic=deterministic)
        else:
            feat = MeanPool(axis_name=cfg.encoder.sp_axis
                            if cfg.encoder.sp_shards > 1 else None,
                            name="pool_fn")(x, mask=mask)
            attn = None

        logits = nn.Dense(cfg.n_classes, kernel_init=xavier_normal,
                          bias_init=zeros, name="predictor")(feat)
        if return_attn:
            return logits, attn
        return logits
