"""Generate golden test fixtures from the reference PyTorch implementation.

Runs the reference modules (mounted read-only at /root/reference) on CPU with
fixed seeds and records (inputs, converted-to-flax params, outputs) as .npz
files under tests/goldens/.  The reference has no test suite (SURVEY.md §4);
these goldens are the substitute oracle: every JAX op/model is unit-tested
against them at fp32 tolerance.

Torch runs ONLY here, offline; the committed .npz files keep the test suite
torch-free.  Param tensors are converted to flax layouts/naming on the way
out (Linear (out,in)->kernel (in,out); Conv2d OIHW->HWIO).
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

sys.path.insert(0, "/root/reference")

# --- timm shim (timm is not installed; the reference uses only two symbols) ---
import torch
import torch.nn as nn


def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class _DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


_timm = types.ModuleType("timm")
_timm_models = types.ModuleType("timm.models")
_timm_layers = types.ModuleType("timm.models.layers")
_timm_layers.trunc_normal_ = _trunc_normal_
_timm_layers.DropPath = _DropPath


class _AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


_timm_utils = types.ModuleType("timm.utils")
_timm_utils.AverageMeter = _AverageMeter
_timm.models = _timm_models
_timm_models.layers = _timm_layers
sys.modules["timm"] = _timm
sys.modules["timm.models"] = _timm_models
sys.modules["timm.models.layers"] = _timm_layers
sys.modules["timm.utils"] = _timm_utils

from modules.rmsa import CrossRegionAttntion, InnerAttention, RegionAttntion  # noqa: E402
from modules.rrt import RRTMIL, RRTEncoder, TransLayer  # noqa: E402
from modules.datten import DAttention  # noqa: E402
from modules.nystrom_attention import NystromAttention  # noqa: E402
from modules.emb_position import PEG, PPEG  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")
os.makedirs(OUT, exist_ok=True)


# ---------------------------------------------------------------------------
# torch -> flax param conversion
# ---------------------------------------------------------------------------

def t2n(t):
    # .copy() matters: numpy() shares memory with the torch tensor, and
    # in-place optimizer updates would silently mutate saved fixtures.
    return t.detach().cpu().numpy().copy()


def dense(mod: nn.Linear):
    p = {"kernel": t2n(mod.weight).T}
    if mod.bias is not None:
        p["bias"] = t2n(mod.bias)
    return p


def conv_hwio(w):
    # torch (out, in/g, kh, kw) -> flax HWIO (kh, kw, in/g, out)
    return t2n(w).transpose(2, 3, 1, 0)


def layernorm(mod: nn.LayerNorm):
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


def inner_attention_params(mod: InnerAttention):
    p = {"qkv": dense(mod.qkv), "proj": dense(mod.proj)}
    if mod.pe is not None:
        p["pe_kernel"] = conv_hwio(mod.pe.weight)
        if mod.pe.bias is not None:
            p["pe_bias"] = t2n(mod.pe.bias)
    return p


def region_attention_params(mod: RegionAttntion):
    if isinstance(mod.attn, NystromAttention):
        return {"attn": nystrom_params(mod.attn)}
    return {"attn": inner_attention_params(mod.attn)}


def crmsa_params(mod: CrossRegionAttntion):
    p = {"attn": inner_attention_params(mod.attn)}
    if mod.crmsa_mlp:
        p["phi_fc1"] = dense(mod.phi[0])
        p["phi_fc2"] = dense(mod.phi[2])
    else:
        p["phi"] = t2n(mod.phi)
    return p


def nystrom_params(mod: NystromAttention):
    p = {"to_qkv": dense(mod.to_qkv), "to_out": dense(mod.to_out[0])}
    if mod.residual:
        p["res_conv_kernel"] = conv_hwio(mod.res_conv.weight)
    return p


def dattention_params(mod: DAttention):
    att = mod.attention
    if mod.gated:
        return {"attention": {
            "attention_a": dense(att.attention_a[0]),
            "attention_b": dense(att.attention_b[0]),
            "attention_c": dense(att.attention_c),
        }}
    linears = [m for m in att.attention if isinstance(m, nn.Linear)]
    return {"attention": {"fc1": dense(linears[0]), "fc2": dense(linears[1])}}


def translayer_params(mod: TransLayer, attn_mode: str):
    p = {"norm": layernorm(mod.norm)}
    if attn_mode == "rmsa":
        p["attn"] = region_attention_params(mod.attn)
    elif attn_mode == "crmsa":
        p["attn"] = crmsa_params(mod.attn)
    elif attn_mode == "ntrans":
        p["attn"] = nystrom_params(mod.attn)
    if mod.ffn:
        p["norm2"] = layernorm(mod.norm2)
        p["mlp"] = {"fc1": dense(mod.mlp.fc1), "fc2": dense(mod.mlp.fc2)}
    return p


def encoder_params(mod: RRTEncoder, attn_mode: str = "rmsa", cr_msa: bool = True):
    p = {"norm": layernorm(mod.norm)}
    for i, layer in enumerate(mod.layers):
        p[f"layer{i}"] = translayer_params(layer, attn_mode)
    if cr_msa:
        p["cr_msa"] = translayer_params(mod.cr_msa, "crmsa")
    if isinstance(mod.pos_embedding, PEG):
        p["pos_embedding"] = {"kernel": conv_hwio(mod.pos_embedding.proj.weight),
                              "bias": t2n(mod.pos_embedding.proj.bias)}
    elif isinstance(mod.pos_embedding, PPEG):
        pe = {}
        for name in ("proj", "proj1", "proj2"):
            c = getattr(mod.pos_embedding, name)
            pe[f"{name}_kernel"] = conv_hwio(c.weight)
            pe[f"{name}_bias"] = t2n(c.bias)
        p["pos_embedding"] = pe
    return p


def rrtmil_params(mod: RRTMIL, attn_mode: str = "rmsa", cr_msa: bool = True,
                  pool: str = "attn"):
    p = {
        "patch_to_emb": dense(mod.patch_to_emb[0]),
        "online_encoder": encoder_params(mod.online_encoder, attn_mode, cr_msa),
        "predictor": dense(mod.predictor),
    }
    if pool == "attn":
        p["pool_fn"] = dattention_params(mod.pool_fn)
    return p


def flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, key))
        else:
            flat[key] = v
    return flat


def save(name, inputs: dict, params: dict, outputs: dict, meta: dict = None):
    payload = {}
    for k, v in inputs.items():
        payload[f"in:{k}"] = v
    for k, v in flatten(params).items():
        payload[f"p:{k}"] = v
    for k, v in outputs.items():
        payload[f"out:{k}"] = v
    for k, v in (meta or {}).items():
        payload[f"meta:{k}"] = np.asarray(v)
    np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **payload)
    nbytes = os.path.getsize(os.path.join(OUT, f"{name}.npz"))
    print(f"  wrote {name}.npz ({nbytes/1e6:.2f} MB)")


def seeded(seed=2021):
    torch.manual_seed(seed)
    np.random.seed(seed)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def gen_inner_attention():
    for tag, kwargs in {
        "epeg15": dict(epeg=True, epeg_k=15),
        "noepeg": dict(epeg=False),
        "epeg2d": dict(epeg=True, epeg_k=9, epeg_2d=True),
        "value_bf": dict(epeg=True, epeg_k=9, epeg_type="value_bf"),
        "value_af": dict(epeg=True, epeg_k=9, epeg_type="value_af"),
        "heads1": dict(epeg=True, epeg_k=15, num_heads=1, head_dim=512),
    }.items():
        seeded()
        mod = InnerAttention(dim=512, **kwargs).eval()
        x = torch.randn(6, 144, 512)  # 6 regions of 12x12 tokens
        with torch.no_grad():
            y = mod(x)
        save(f"inner_attention_{tag}", {"x": t2n(x)},
             inner_attention_params(mod), {"y": t2n(y)})


def gen_region_attention():
    for tag, length, kwargs in [
        ("l937", 937, dict(region_num=8, epeg=True, epeg_k=15)),
        ("l100", 100, dict(region_num=8, epeg=True, epeg_k=15)),
        ("l937_rn16", 937, dict(region_num=16, epeg=True, epeg_k=9)),
        ("l500_rs16", 500, dict(region_size=16, region_num=8, epeg=True, epeg_k=15)),
    ]:
        seeded()
        mod = RegionAttntion(dim=512, num_heads=8, head_dim=64,
                             qkv_bias=True, **kwargs).eval()
        x = torch.randn(1, length, 512)
        with torch.no_grad():
            y = mod(x)
        save(f"region_attention_{tag}", {"x": t2n(x)},
             region_attention_params(mod), {"y": t2n(y)})


def gen_crmsa():
    for tag, kwargs in {
        "k3": dict(crmsa_k=3),
        "k1": dict(crmsa_k=1),
        "k5_heads1": dict(crmsa_k=5, num_heads=1, head_dim=512),
        "k3_mlp": dict(crmsa_k=3, crmsa_mlp=True),
    }.items():
        seeded()
        mod = CrossRegionAttntion(dim=512, head_dim=kwargs.pop("head_dim", 64),
                                  num_heads=kwargs.pop("num_heads", 8),
                                  region_num=8, epeg=False, **kwargs).eval()
        x = torch.randn(1, 937, 512)
        with torch.no_grad():
            y = mod(x)
        save(f"crmsa_{tag}", {"x": t2n(x)}, crmsa_params(mod), {"y": t2n(y)})


def gen_nystrom():
    seeded()
    mod = NystromAttention(dim=512, dim_head=64, heads=8, num_landmarks=256,
                           pinv_iterations=6, residual=True, dropout=0.0).eval()
    x = torch.randn(1, 937, 512)
    with torch.no_grad():
        y = mod(x)
    save("nystrom_l937", {"x": t2n(x)}, nystrom_params(mod), {"y": t2n(y)})

    seeded()
    x = torch.randn(1, 100, 512)
    with torch.no_grad():
        y = mod(x)
    save("nystrom_l100", {"x": t2n(x)}, nystrom_params(mod), {"y": t2n(y)})


def gen_dattention():
    for tag, kwargs in {
        "relu": dict(act="relu", gated=False),
        "tanh_gated": dict(act="tanh", gated=True),
        "gelu": dict(act="gelu", gated=False),
    }.items():
        seeded()
        mod = DAttention(input_dim=512, bias=False, dropout=False, **kwargs).eval()
        x = torch.randn(1, 937, 512)
        with torch.no_grad():
            y = mod(x)
        save(f"dattention_{tag}", {"x": t2n(x)}, dattention_params(mod),
             {"y": t2n(y)})


def gen_encoder():
    for tag, kwargs in {
        "default": dict(epeg_k=15, crmsa_k=3),
        "c16r50": dict(epeg_k=15, crmsa_k=1, crmsa_heads=8, all_shortcut=True),
        "nsclc_plip": dict(epeg_k=13, crmsa_k=3, crmsa_heads=1,
                           all_shortcut=True, crmsa_mlp=True),
        "rn16": dict(epeg_k=9, crmsa_k=3, region_num=16),
        "ffn": dict(epeg_k=15, crmsa_k=3, ffn=True),
        "peg": dict(epeg_k=15, crmsa_k=3, pos="peg", pos_pos=-1, n_layers=3),
        "ppeg": dict(epeg_k=15, crmsa_k=3, pos="ppeg", pos_pos=0, n_layers=3),
        "n3layers": dict(epeg_k=15, crmsa_k=3, n_layers=3),
    }.items():
        seeded()
        mod = RRTEncoder(mlp_dim=512, drop_out=0.0, **kwargs).eval()
        x = torch.randn(1, 937, 512)
        with torch.no_grad():
            y = mod(x)
        save(f"encoder_{tag}", {"x": t2n(x)}, encoder_params(mod), {"y": t2n(y)})


def gen_rrtmil():
    for tag, length, kwargs in [
        ("c16r50_l937", 937, dict(input_dim=1024, epeg_k=15, crmsa_k=1,
                                  crmsa_heads=8, all_shortcut=True)),
        ("default_l2213", 2213, dict(input_dim=1024, epeg_k=15, crmsa_k=3)),
        ("plip_l937", 937, dict(input_dim=512, epeg_k=9, crmsa_k=3,
                                all_shortcut=True)),
    ]:
        seeded()
        mod = RRTMIL(n_classes=2, dropout=0.0, trans_dropout=0.0,
                     da_act="relu", **kwargs).eval()
        x = torch.randn(1, length, kwargs["input_dim"])
        with torch.no_grad():
            y = mod(x)
        save(f"rrtmil_{tag}", {"x": t2n(x)}, rrtmil_params(mod), {"y": t2n(y)})


def gen_train_steps():
    """Reference training trajectory: RRTMIL + CE + torch Adam (lr 2e-4,
    weight_decay 1e-5, L2 semantics), 6 steps over 3 bags of different
    lengths, dropout off.  Validates grads + optimizer + loss end-to-end
    (reference main.py:415-499 train_loop at accumulation_steps=1)."""
    seeded()
    mod = RRTMIL(n_classes=2, dropout=0.0, trans_dropout=0.0, input_dim=64,
                 epeg_k=9, crmsa_k=3).train()
    params0 = rrtmil_params(mod)
    bags = [torch.randn(1, n, 64) for n in (120, 257, 64)]
    labels = [0, 1, 1]
    optimizer = torch.optim.Adam(mod.parameters(), lr=2e-4, weight_decay=1e-5)
    criterion = nn.CrossEntropyLoss()
    losses, logits_hist = [], []
    for step in range(6):
        bag = bags[step % 3]
        label = torch.tensor([labels[step % 3]])
        optimizer.zero_grad()
        logits = mod(bag)
        loss = criterion(logits.view(1, -1), label)
        loss.backward()
        optimizer.step()
        losses.append(loss.item())
        logits_hist.append(t2n(logits))
    save("train_steps", {f"bag{i}": t2n(b) for i, b in enumerate(bags)},
         params0,
         {"losses": np.array(losses),
          "logits": np.concatenate(logits_hist, 0),
          "labels": np.array(labels)})


def main():
    print("Generating goldens from /root/reference (torch CPU)...")
    gen_train_steps()
    gen_inner_attention()
    gen_region_attention()
    gen_crmsa()
    gen_nystrom()
    gen_dattention()
    gen_encoder()
    gen_rrtmil()
    print("done.")


if __name__ == "__main__":
    main()
