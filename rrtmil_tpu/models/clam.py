"""CLAM_SB / CLAM_MB (reference modules/clam.py, vendored from
mahmoodlab/CLAM): gated attention + bag classifier + per-class instance
classifiers trained on the top-k / bottom-k attended patches with a
SmoothTop1SVM instance loss.

JAX adaptations:
  * batch = 1 (like the reference, which squeezes the batch axis);
  * the label-dependent in/out-of-class branching (clam.py:184-198) is
    expressed by computing both branch losses and selecting with the one-hot
    label -- jit-friendly and identical in value;
  * masked top-k: bucket-pad rows are excluded from both the attention
    softmax and the top/bottom-k instance selection.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import RRTEncoderConfig
from ..train.losses import smooth_top1_svm
from ..utils.inits import xavier_normal, zeros
from .abmil import FeatureHead, _act
from .pool import masked_softmax


class AttnNet(nn.Module):
    """Ungated attention scorer L->D->n (clam.py:25-41)."""

    d: int = 256
    n_out: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        a = nn.Dense(self.d, kernel_init=xavier_normal, bias_init=zeros,
                     name="fc1")(x)
        a = jnp.tanh(a)
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
        return nn.Dense(self.n_out, kernel_init=xavier_normal,
                        bias_init=zeros, name="fc2")(a)


class AttnNetGated(nn.Module):
    """Gated attention scorer (clam.py:51-74)."""

    d: int = 256
    n_out: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        a = jnp.tanh(nn.Dense(self.d, kernel_init=xavier_normal,
                              bias_init=zeros, name="attention_a")(x))
        b = nn.sigmoid(nn.Dense(self.d, kernel_init=xavier_normal,
                                bias_init=zeros, name="attention_b")(x))
        if self.dropout:
            a = nn.Dropout(0.25)(a, deterministic=deterministic)
            b = nn.Dropout(0.25)(b, deterministic=deterministic)
        return nn.Dense(self.n_out, kernel_init=xavier_normal,
                        bias_init=zeros, name="attention_c")(a * b)


def _topk_select(h, scores, mask, k, largest=True):
    """Features of the k most/least attended REAL instances."""
    s = scores if largest else -scores
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    idx = jax.lax.top_k(s, k)[1]
    return jnp.take(h, idx, axis=0)


class _CLAMBase(nn.Module):
    input_dim: int = 1024
    n_classes: int = 2
    gate: bool = True
    k_sample: int = 8
    dropout: float = 0.0
    act: str = "relu"
    subtyping: bool = False
    rrt: Optional[RRTEncoderConfig] = None
    d_hidden: int = 256   # size_arg 'small' (clam.py:92)

    def _stem(self, x, mask, length, deterministic):
        x = nn.Dense(512, kernel_init=xavier_normal, bias_init=zeros,
                     name="fc")(x)
        x = _act(self.act)(x)
        if self.dropout:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        if self.rrt is not None:
            from .rrt import RRTEncoder
            x = RRTEncoder(self.rrt, name="rrt")(
                x, mask=mask, length=length, deterministic=deterministic)
        return x

    def _instance_loss(self, attn_rows, h, mask, label):
        """Sum of per-class instance losses (clam.py:179-201).

        attn_rows: (n_branches, N) softmaxed attention (1 row for SB,
        n_classes rows for MB)."""
        k = self.k_sample
        inst_onehot = jax.nn.one_hot(label, self.n_classes)
        total = 0.0
        for i in range(self.n_classes):
            a = attn_rows[min(i, attn_rows.shape[0] - 1)]
            clf = nn.Dense(2, kernel_init=xavier_normal, bias_init=zeros,
                           name=f"instance_classifier_{i}")
            top_p = _topk_select(h, a, mask, k, largest=True)
            top_n = _topk_select(h, a, mask, k, largest=False)
            logits_in = clf(jnp.concatenate([top_p, top_n], axis=0))
            targets_in = jnp.concatenate(
                [jnp.ones(k, jnp.int32), jnp.zeros(k, jnp.int32)])
            loss_in = smooth_top1_svm(logits_in, targets_in)
            if self.subtyping:
                logits_out = clf(top_p)
                loss_out = smooth_top1_svm(logits_out, jnp.zeros(k, jnp.int32))
            else:
                loss_out = 0.0
            total = total + jnp.where(inst_onehot[i] == 1, loss_in, loss_out)
        if self.subtyping:
            total = total / self.n_classes
        return total


class CLAM_SB(_CLAMBase):
    """Single-branch CLAM (clam.py:88-218).  Returns logits (1, C) at eval;
    (logits, instance_loss, ps) when labels are given."""

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True, instance_eval=None):
        if x.ndim == 3:
            x, mask_row = x[0], (None if mask is None else mask[0])
        else:
            mask_row = mask
        ps = x.shape[0]
        h = self._stem(x[None], None if mask_row is None else mask_row[None],
                       length, deterministic)[0]
        attn_cls = AttnNetGated if self.gate else AttnNet
        a = attn_cls(self.d_hidden, 1, self.dropout, name="attn_net")(
            h, deterministic)                         # (N, 1)
        a = jnp.swapaxes(a, 0, 1)                     # (1, N)
        a = masked_softmax(a, None if mask_row is None else mask_row[None])

        m = a @ h                                     # (1, 512)
        logits = nn.Dense(self.n_classes, kernel_init=xavier_normal,
                          bias_init=zeros, name="classifiers")(m)

        do_inst = instance_eval if instance_eval is not None else labels is not None
        if do_inst:
            label = labels.reshape(())
            inst_loss = self._instance_loss(a, h, mask_row, label)
            return logits, inst_loss, ps
        return logits


class CLAM_MB(_CLAMBase):
    """Multi-branch CLAM (clam.py:220-311): per-class attention branches and
    per-class 1-logit bag classifiers."""

    @nn.compact
    def __call__(self, x, mask=None, length=None, labels=None,
                 deterministic=True, instance_eval=None):
        if x.ndim == 3:
            x, mask_row = x[0], (None if mask is None else mask[0])
        else:
            mask_row = mask
        ps = x.shape[0]
        h = self._stem(x[None], None if mask_row is None else mask_row[None],
                       length, deterministic)[0]
        attn_cls = AttnNetGated if self.gate else AttnNet
        a = attn_cls(self.d_hidden, self.n_classes, self.dropout,
                     name="attn_net")(h, deterministic)   # (N, C)
        a = jnp.swapaxes(a, 0, 1)                         # (C, N)
        a = masked_softmax(a, None if mask_row is None
                           else mask_row[None])

        m = a @ h                                         # (C, 512)
        logits = jnp.concatenate(
            [nn.Dense(1, kernel_init=xavier_normal, bias_init=zeros,
                      name=f"classifier_{c}")(m[c][None])
             for c in range(self.n_classes)], axis=1)     # (1, C)

        do_inst = instance_eval if instance_eval is not None else labels is not None
        if do_inst:
            label = labels.reshape(())
            inst_loss = self._instance_loss(a, h, mask_row, label)
            return logits, inst_loss, ps
        return logits
