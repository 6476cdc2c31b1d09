"""MHIM-MIL: masked hard instance mining with an EMA teacher
(reference Survival/models/MHIM/network.py).

Structure (network.py:671-722 `MHIM_MIL`):
  * student + teacher are the same MIL network (patch_to_emb -> attention
    pooling -> predictor); the teacher is an EMA copy updated after every
    optimizer step with a cosine momentum schedule (:677-678, `ema_update`).
  * each training step, the teacher's per-instance attention ranks patches;
    the student trains on a *masked* bag that drops the union of
    (a) a random `mask_ratio` subset, (b) the bottom `mask_ratio_l` by
    teacher attention, and (c) a cosine-scheduled `mask_ratio_h` subset
    (random when `mask_ratio_hr == 0`, reproducing the reference's
    select_mask_fn cap-and-randomize behavior, :480-520);
  * a SoftTargetCrossEntropy consistency loss ties the student's bag feature
    to the teacher's (:423-436, 629-634).

TPU design: instead of physically gathering the kept instances (dynamic
shapes), masking is a boolean keep-mask folded into the attention-pooling
softmax -- mathematically identical for the 'attn' baseline.  Mask counts
are computed in Python from the static bag length.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.inits import xavier_normal, zeros
from .pool import masked_softmax


def cosine_schedule(base: float, final: float, epochs: int, niter_per_ep: int,
                    start_warmup: float = 0.0, warmup_epochs: int = 0
                    ) -> np.ndarray:
    """Reference cosine_scheduler (network.py:21-33 / utils.py:105-116)."""
    warmup = np.linspace(start_warmup, base, warmup_epochs * niter_per_ep) \
        if warmup_epochs > 0 else np.array([])
    iters = np.arange(epochs * niter_per_ep - len(warmup))
    sched = final + 0.5 * (base - final) * (1 + np.cos(np.pi * iters /
                                                       max(len(iters), 1)))
    return np.concatenate([warmup, sched])


def soft_target_ce(student: jnp.ndarray, teacher: jnp.ndarray,
                   temp_t: float = 1.0, temp_s: float = 1.0) -> jnp.ndarray:
    """SoftTargetCrossEntropy_v2 (network.py:423-436)."""
    t = jax.nn.softmax(jax.lax.stop_gradient(teacher) / temp_t, axis=-1)
    return jnp.mean(jnp.sum(-t * jax.nn.log_softmax(student / temp_s,
                                                    axis=-1), axis=-1))


class _GatedPool(nn.Module):
    """The 'attn' baseline encoder: gated attention pooling that also
    exposes per-instance attention (network.py DAttention)."""

    dim: int = 512
    act: str = "relu"

    @nn.compact
    def __call__(self, x, keep_mask=None, return_attn: bool = False,
                 deterministic: bool = True):
        act = {"relu": nn.relu, "gelu": lambda v: nn.gelu(v, approximate=False),
               "tanh": jnp.tanh}[self.act]
        a = act(nn.Dense(128, use_bias=False, kernel_init=xavier_normal,
                         name="attention_a")(x))
        b = nn.sigmoid(nn.Dense(128, use_bias=False, kernel_init=xavier_normal,
                                name="attention_b")(x))
        g = nn.Dense(1, use_bias=False, kernel_init=xavier_normal,
                     name="attention_c")(a * b)
        g = jnp.swapaxes(g, -1, -2)            # (B, 1, N)
        gs = masked_softmax(g, None if keep_mask is None
                            else keep_mask[:, None, :])
        feat = (gs @ x)[:, 0]                  # (B, dim)
        if return_attn:
            return feat, g[:, 0]               # raw scores (B, N)
        return feat


class _SAttention(nn.Module):
    """The 'selfattn' baseline encoder (network.py:320-409): cls token +
    two Nystrom TransLayers with PPEG between (TransMIL-style).

    The reference masks by physically gathering kept tokens (MAE-style,
    network.py:339-360), which changes the Nystrom landmark segmentation.
    Here masked tokens are zeroed instead (static shapes); a controlled
    deviation documented in docs/PARITY.md -- the survival harness only
    exercises baseline='attn' (Survival/main.py:147).
    """

    mlp_dim: int = 512
    head: int = 8
    peg_k: int = 7

    @nn.compact
    def __call__(self, x, keep_mask=None, return_attn: bool = False,
                 deterministic: bool = True):
        from ..config import NystromConfig
        from .nystrom import NystromAttention
        from .transmil import _PPEG

        b, n, c = x.shape
        if keep_mask is not None:
            x = x * keep_mask[..., None].astype(x.dtype)

        cls_token = self.param("cls_token", nn.initializers.normal(1.0),
                               (1, 1, self.mlp_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.mlp_dim)), x], axis=1)

        nys = NystromConfig(dim=self.mlp_dim, head_dim=self.mlp_dim // 8,
                            num_heads=self.head,
                            num_landmarks=self.mlp_dim // 2, dropout=0.1)

        def translayer(name, h):
            z = nn.LayerNorm(name=f"{name}_norm")(h)
            return h + NystromAttention(nys, name=f"{name}_attn")(
                z, deterministic=deterministic)

        x = translayer("layer1", x)
        side = int(math.ceil(math.sqrt(n)))
        if side * side == n:          # PPEG needs a square token grid
            spatial = _PPEG(self.mlp_dim, name="pos_embedding")(
                jnp.concatenate([x[:, :1], x[:, 1:]], axis=1), side, side)
            x = spatial
        x = translayer("layer2", x)
        x = nn.LayerNorm(name="norm")(x)
        feat = x[:, 0]
        if return_attn:
            # raw per-token proxy: cls-row attention unavailable from the
            # Nystrom approximation without extra cost; return zeros
            return feat, jnp.zeros((b, n), x.dtype)
        return feat


class MHIM(nn.Module):
    """Student/teacher network (network.py:438-...)."""

    input_dim: int = 1024
    mlp_dim: int = 512
    n_classes: int = 4
    dropout: float = 0.25
    act: str = "relu"
    da_act: str = "relu"
    baseline: str = "attn"     # 'attn' | 'selfattn'

    @nn.compact
    def __call__(self, x, mask=None, length=None, keep_mask=None,
                 deterministic: bool = True, return_attn: bool = False,
                 return_feat: bool = False):
        if x.ndim == 2:
            x = x[None]
        h = nn.Dense(self.mlp_dim, kernel_init=xavier_normal, bias_init=zeros,
                     name="patch_to_emb")(x)
        h = nn.relu(h) if self.act == "relu" else nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        km = mask
        if keep_mask is not None:
            km = keep_mask if km is None else (km & keep_mask)

        if self.baseline == "selfattn":
            pool = _SAttention(self.mlp_dim, name="online_encoder")
        else:
            pool = _GatedPool(self.mlp_dim, self.da_act,
                              name="online_encoder")
        if return_attn:
            feat, attn = pool(h, km, return_attn=True,
                              deterministic=deterministic)
        else:
            feat = pool(h, km, deterministic=deterministic)
            attn = None
        logits = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                          bias_init=zeros, name="predictor")(feat)
        out = [logits]
        if return_feat:
            out.append(feat)
        if return_attn:
            out.append(attn)
        return tuple(out) if len(out) > 1 else logits


def build_keep_mask(rng: jax.Array, teacher_attn: jnp.ndarray, length: int,
                    total_len: int, mask_ratio: float = 0.7,
                    mask_ratio_l: float = 0.2, mask_ratio_h: float = 0.0,
                    mask_ratio_hr: float = 0.0) -> jnp.ndarray:
    """Boolean keep-mask over `total_len` tokens (True = student sees it).

    Reproduces get_mask (network.py:538-575) for the 'attn' baseline:
      random `mask_ratio` + bottom-`mask_ratio_l`-attention + scheduled
      `mask_ratio_h` (random subset when mask_ratio_hr == 0, the
      select_mask_fn cap behavior).  Counts derive from the static true
      `length`; bucket-pad tokens are always masked out of selection.
    """
    drop = jnp.zeros((total_len,), bool)
    valid = jnp.arange(total_len) < length
    k_rand = int(math.ceil(length * mask_ratio)) if mask_ratio > 0 else 0
    k_low = int(math.ceil(length * mask_ratio_l)) if mask_ratio_l > 0 else 0
    k_high = int(math.ceil(length * mask_ratio_h)) if mask_ratio_h > 0 else 0

    if k_rand > 0:
        r1, rng = jax.random.split(rng)
        scores = jnp.where(valid, jax.random.uniform(r1, (total_len,)), -1.0)
        thresh = jax.lax.top_k(scores, k_rand)[0][-1]
        drop = drop | (scores >= thresh)
    if k_low > 0:
        att = jnp.where(valid, teacher_attn, jnp.inf)
        low = jax.lax.top_k(-att, k_low)[1]
        drop = drop | jnp.zeros((total_len,), bool).at[low].set(True)
    if k_high > 0:
        r2, rng = jax.random.split(rng)
        if mask_ratio_hr == 0.0:
            scores = jnp.where(valid, jax.random.uniform(r2, (total_len,)),
                               -1.0)
            idx = jax.lax.top_k(scores, k_high)[1]
        else:
            att = jnp.where(valid, teacher_attn, -jnp.inf)
            idx = jax.lax.top_k(att, k_high)[1]
        drop = drop | jnp.zeros((total_len,), bool).at[idx].set(True)
    return valid & ~drop


def ema_update(student_params, teacher_params, momentum: float):
    """teacher <- mm * teacher + (1 - mm) * student (utils.py:15-24)."""
    return jax.tree.map(
        lambda t, s: momentum * t + (1.0 - momentum) * s,
        teacher_params, student_params)
