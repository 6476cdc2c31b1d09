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
        # --region_attn ntrans ablation (reference rmsa.py:167-173)
        ("l937_ntrans", 937, dict(region_num=8, epeg=False,
                                  region_attn="ntrans")),
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
        # --attn ntrans ablation (reference rrt.py:49-57)
        "ntrans": dict(attn="ntrans", epeg_k=15, crmsa_k=3),
    }.items():
        seeded()
        mod = RRTEncoder(mlp_dim=512, drop_out=0.0, **kwargs).eval()
        x = torch.randn(1, 937, 512)
        with torch.no_grad():
            y = mod(x)
        save(f"encoder_{tag}", {"x": t2n(x)},
             encoder_params(mod, attn_mode=kwargs.get("attn", "rmsa")),
             {"y": t2n(y)})


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


# ---------------------------------------------------------------------------
# model zoo fixtures
# ---------------------------------------------------------------------------

# CLAM hardcodes .cuda() on its instance loss (clam.py:116,251); neutralize
# for CPU golden generation.
nn.Module.cuda = lambda self, device=None: self  # type: ignore

# attmil.py imports torchvision only for its unused end-to-end Resnet class
# (attmil.py:27-54); shim it.
_tv = types.ModuleType("torchvision")
_tv_models = types.ModuleType("torchvision.models")
_tv_models.resnet50 = lambda pretrained=False: (_ for _ in ()).throw(
    RuntimeError("resnet50 shim: not used by goldens"))
_tv.models = _tv_models
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.models", _tv_models)

# topk/polynomial/multiplication.py does `from future.builtins import range`
# (py2 compat); shim with the builtin.
_future = types.ModuleType("future")
_future_builtins = types.ModuleType("future.builtins")
_future_builtins.range = range
_future.builtins = _future_builtins
sys.modules.setdefault("future", _future)
sys.modules.setdefault("future.builtins", _future_builtins)

from modules import attmil as ref_attmil          # noqa: E402
from modules import mean_max as ref_mean_max      # noqa: E402
from modules import clam as ref_clam              # noqa: E402
from modules import dsmil as ref_dsmil            # noqa: E402
from modules import transmil as ref_transmil      # noqa: E402
from modules import attmil_ibmil as ref_ibmil     # noqa: E402


def seq_linears(seq):
    return [m for m in seq if isinstance(m, nn.Linear)]


def gen_attmil():
    seeded()
    mod = ref_attmil.DAttention(input_dim=1024, n_classes=2, dropout=0.25,
                                act="relu").eval()
    x = torch.randn(1, 937, 1024)
    with torch.no_grad():
        y = mod(x)
    att = seq_linears(mod.attention)
    params = {
        "feature": {"fc": dense(seq_linears(mod.feature)[0])},
        "attn_fc1": dense(att[0]), "attn_fc2": dense(att[1]),
        "classifier": dense(seq_linears(mod.classifier)[0]),
    }
    save("attmil", {"x": t2n(x)}, params, {"y": t2n(y)})

    seeded()
    mod = ref_attmil.AttentionGated(input_dim=512, act="relu",
                                    dropout=False).eval()
    with torch.no_grad():
        y = mod(x)
    params = {
        "feature": {"fc": dense(seq_linears(mod.feature)[0])},
        "attention_a": dense(seq_linears(mod.attention_a)[0]),
        "attention_b": dense(seq_linears(mod.attention_b)[0]),
        "attention_c": dense(mod.attention_c),
        "classifier": dense(seq_linears(mod.classifier)[0]),
    }
    save("gattmil", {"x": t2n(x)}, params, {"y": t2n(y)})


def gen_attmil_rrt():
    """AB-MIL with an injected RRT encoder (--only_rrt_enc path,
    reference main.py:138-155,194)."""
    seeded()
    import modules.rrt as ref_rrt
    enc = ref_rrt.RRTEncoder(mlp_dim=512, epeg_k=9, crmsa_k=1,
                             drop_out=0.0, need_init=True)
    mod = ref_attmil.DAttention(input_dim=1024, n_classes=2, dropout=0.25,
                                act="relu", rrt=enc).eval()
    x = torch.randn(1, 937, 1024)
    with torch.no_grad():
        y = mod(x)
    att = seq_linears(mod.attention)
    params = {
        "feature": {"fc": dense(seq_linears(mod.feature)[0]),
                    "rrt": encoder_params(enc)},
        "attn_fc1": dense(att[0]), "attn_fc2": dense(att[1]),
        "classifier": dense(seq_linears(mod.classifier)[0]),
    }
    save("attmil_rrt", {"x": t2n(x)}, params, {"y": t2n(y)})


def gen_mean_max():
    for tag, cls in (("meanmil", ref_mean_max.MeanMIL),
                     ("maxmil", ref_mean_max.MaxMIL)):
        seeded()
        mod = cls(input_dim=1024, n_classes=2, dropout=True, act="relu").eval()
        x = torch.randn(1, 937, 1024)
        with torch.no_grad():
            y = mod(x)
        lins = seq_linears(mod.head)
        params = {"head": {"fc": dense(lins[0])}, "classifier": dense(lins[1])}
        save(tag, {"x": t2n(x)}, params, {"y": t2n(y)})


def _clam_common(mod, mb=False):
    lins = seq_linears(mod.attention_net)
    gate_net = mod.attention_net[-1]
    params = {
        "fc": dense(lins[0]),
        "attn_net": {
            "attention_a": dense(gate_net.attention_a[0]),
            "attention_b": dense(gate_net.attention_b[0]),
            "attention_c": dense(gate_net.attention_c),
        },
    }
    for i, clf in enumerate(mod.instance_classifiers):
        params[f"instance_classifier_{i}"] = dense(clf)
    if mb:
        for c, clf in enumerate(mod.classifiers):
            params[f"classifier_{c}"] = dense(clf)
    else:
        params["classifiers"] = dense(mod.classifiers)
    return params


def gen_clam():
    for tag, cls, mb in (("clam_sb", ref_clam.CLAM_SB, False),
                         ("clam_mb", ref_clam.CLAM_MB, True)):
        seeded()
        mod = cls(input_dim=1024, n_classes=2, dropout=0.0).eval()
        x = torch.randn(1, 937, 1024)
        label = torch.tensor([1])
        with torch.no_grad():
            logits, inst_loss, ps = mod(x, label=label, instance_eval=True)
            logits_eval = mod(x, instance_eval=False)
        save(tag, {"x": t2n(x), "label": np.array([1])}, _clam_common(mod, mb),
             {"logits": t2n(logits), "inst_loss": np.float64(inst_loss.item()),
              "ps": np.int64(ps), "logits_eval": t2n(logits_eval)})


def gen_dsmil():
    seeded()
    mod = ref_dsmil.MILNet(n_classes=2, dropout=0.0, act="relu",
                           input_dim=1024).eval()
    x = torch.randn(1, 937, 1024)
    with torch.no_grad():
        bag_logits, classes = mod(x)
    params = {
        "patch_to_emb": dense(seq_linears(mod.patch_to_emb)[0]),
        "i_classifier": dense(mod.i_classifier),
        "b_classifier": {
            "q": dense(mod.b_classifier.q),
            "fcc_kernel": t2n(mod.b_classifier.fcc.weight),
            "fcc_bias": t2n(mod.b_classifier.fcc.bias),
        },
    }
    save("dsmil", {"x": t2n(x)}, params,
         {"bag_logits": t2n(bag_logits), "classes": t2n(classes)})


def gen_transmil():
    seeded()
    mod = ref_transmil.TransMIL(input_dim=1024, n_classes=2, dropout=False,
                                act="relu").eval()
    x = torch.randn(1, 937, 1024)
    with torch.no_grad():
        y = mod(x)

    def translayer(layer):
        return {"norm": layernorm(layer.norm),
                "attn": nystrom_params(layer.attn)}

    ppeg = {}
    for name in ("proj", "proj1", "proj2"):
        c = getattr(mod.pos_layer, name)
        ppeg[f"{name}_kernel"] = conv_hwio(c.weight)
        ppeg[f"{name}_bias"] = t2n(c.bias)
    params = {
        "fc1": dense(seq_linears(mod._fc1)[0]),
        "cls_token": t2n(mod.cls_token),
        "layer1": translayer(mod.layer1),
        "layer2": translayer(mod.layer2),
        "pos_layer": ppeg,
        "norm": layernorm(mod.norm),
        "fc2": dense(mod._fc2),
    }
    save("transmil", {"x": t2n(x)}, params, {"y": t2n(y)})


def gen_ibmil():
    seeded()
    protos = np.random.randn(8, 512).astype(np.float32)
    proto_path = os.path.join(OUT, "_ibmil_protos.npy")
    np.save(proto_path, protos)
    mod = ref_ibmil.Dattention_ori(out_dim=2, in_size=1024, dropout=0.25,
                                   confounder_path=proto_path).eval()
    x = torch.randn(937, 1024)
    with torch.no_grad():
        y = mod(x)
    att = seq_linears(mod.attention)
    params = {
        "embedding": {"fc": dense(seq_linears(mod.embedding.embed)[0])},
        "attn_fc1": dense(att[0]), "attn_fc2": dense(att[1]),
        "W_q": dense(mod.W_q), "W_k": dense(mod.W_k),
        "head": dense(mod.head),
    }
    save("ibmil", {"x": t2n(x)[None], "confounders": protos}, params,
         {"y": t2n(y)})
    os.remove(proto_path)


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


def gen_topk_svm():
    """Loss values AND input gradients of the reference topk SVM family
    (modules/topk/svm.py) on mixed smooth/hard batches."""
    from modules.topk.svm import (MaxTop1SVM, MaxTopkSVM, SmoothTop1SVM,
                                  SmoothTopkSVM)

    seeded()
    n, c = 12, 8
    x = torch.randn(n, c)
    x[3] *= 40.0          # top-gap >> k*tau*log(1e3): forces the hard branch
    x[7] *= 40.0
    y = torch.randint(0, c, (n,))

    cases = {
        "smooth_top1": SmoothTop1SVM(n_classes=c, tau=1.0),
        "smooth_top1_tau05": SmoothTop1SVM(n_classes=c, tau=0.5),
        "smooth_topk3": SmoothTopkSVM(n_classes=c, k=3, tau=1.0),
        "smooth_topk5_tau07": SmoothTopkSVM(n_classes=c, k=5, tau=0.7),
        "max_top1": MaxTop1SVM(n_classes=c),
        "max_topk3": MaxTopkSVM(n_classes=c, k=3),
    }
    outputs = {}
    for name, mod in cases.items():
        xg = x.clone().requires_grad_(True)
        loss = mod(xg, y)
        loss.backward()
        outputs[f"{name}_loss"] = np.asarray(loss.item(), np.float32)
        outputs[f"{name}_grad"] = t2n(xg.grad)
    save("topk_svm", {"x": t2n(x), "y": y.numpy()}, {}, outputs)


def gen_train_long():
    """Multi-hundred-step reference training trajectory + per-epoch val AUC
    (the closest achievable stand-in for the +-0.5-AUC 5-fold north star
    without real WSI features): RRTMIL + CE + torch Adam + per-epoch
    CosineAnnealingLR, dropout off, fixed bag order -- the reference
    train_loop/val_loop semantics end-to-end (main.py:415-559) for
    15 epochs x 20 bags = 300 optimizer steps, validated on 12 held-out
    planted-signal bags with the reference's own five_scores AUC."""
    seeded()
    import utils as ref_utils  # /root/reference/utils.py (five_scores)

    rng = np.random.default_rng(42)
    dim = 64
    signal = rng.normal(size=(dim,))
    signal /= np.linalg.norm(signal)

    def make_bags(n):
        bags, labels = [], []
        for i in range(n):
            length = int(rng.integers(80, 300))
            bag = rng.normal(size=(length, dim)).astype(np.float32)
            label = i % 2
            if label:
                bag[: max(3, length // 10)] += 4.0 * signal.astype(np.float32)
            bags.append(bag)
            labels.append(label)
        return bags, labels

    train_bags, train_labels = make_bags(20)
    val_bags, val_labels = make_bags(12)

    mod = RRTMIL(n_classes=2, dropout=0.0, trans_dropout=0.0, input_dim=dim,
                 epeg_k=9, crmsa_k=3).train()
    params0 = rrtmil_params(mod)
    optimizer = torch.optim.Adam(mod.parameters(), lr=2e-4, weight_decay=1e-5)
    num_epochs = 15
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, num_epochs, 0)
    criterion = nn.CrossEntropyLoss()

    losses, aucs, val_losses, val_probs = [], [], [], []
    for _ in range(num_epochs):
        mod.train()
        for bag, label in zip(train_bags, train_labels):
            optimizer.zero_grad()
            logits = mod(torch.from_numpy(bag)[None])
            loss = criterion(logits.view(1, -1), torch.tensor([label]))
            loss.backward()
            optimizer.step()
            losses.append(loss.item())
        scheduler.step()
        mod.eval()
        probs, vloss = [], 0.0
        with torch.no_grad():
            for bag, label in zip(val_bags, val_labels):
                logits = mod(torch.from_numpy(bag)[None]).view(1, -1)
                vloss += criterion(logits, torch.tensor([label])).item()
                probs.append(torch.softmax(logits, -1)[0, 1].item())
        _, auc, _, _, _ = ref_utils.five_scores(val_labels, probs,
                                                sub_typing=False)
        aucs.append(auc)
        val_losses.append(vloss / len(val_bags))
        val_probs.append(probs)

    inputs = {f"tbag{i}": b for i, b in enumerate(train_bags)}
    inputs.update({f"vbag{i}": b for i, b in enumerate(val_bags)})
    save("train_long", inputs, params0,
         {"losses": np.asarray(losses, np.float64),
          "val_aucs": np.asarray(aucs, np.float64),
          "val_losses": np.asarray(val_losses, np.float64),
          "val_probs": np.asarray(val_probs, np.float64),
          "train_labels": np.asarray(train_labels),
          "val_labels": np.asarray(val_labels)},
         meta={"num_epochs": num_epochs})


def gen_train_clam():
    """CLAM_SB training trajectory: the aux-loss path of the reference
    train_loop (main.py:445-457) with the post-parse-forced 0.7 CE / 0.3
    SmoothTop1SVM weights (main.py:719-726), torch Adam (lr 2e-4, wd 1e-5)
    + per-epoch CosineAnnealingLR -- 5 epochs x 8 bags = 40 optimizer
    steps, dropout off.  Validates grads through the instance-eval top-k
    sampling and the SmoothTop1SVM detect_large switch end-to-end."""
    seeded()
    rng = np.random.default_rng(11)
    dim = 64
    bags, labels = [], []
    for i in range(8):
        n = int(rng.integers(80, 280))
        bag = rng.normal(size=(n, dim)).astype(np.float32)
        if i % 2:
            bag[: max(8, n // 8)] += 1.5
        bags.append(bag)
        labels.append(i % 2)
    mod = ref_clam.CLAM_SB(input_dim=dim, n_classes=2, dropout=0.0).train()
    params0 = _clam_common(mod, False)
    optimizer = torch.optim.Adam(mod.parameters(), lr=2e-4, weight_decay=1e-5)
    num_epochs = 5
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, num_epochs, 0)
    criterion = nn.CrossEntropyLoss()
    losses, logit_losses, inst_losses, logits_hist = [], [], [], []
    for _ in range(num_epochs):
        for bag, label in zip(bags, labels):
            optimizer.zero_grad()
            lbl = torch.tensor([label])
            logits, inst_loss, _ps = mod(torch.from_numpy(bag)[None], lbl,
                                         criterion)
            logit_loss = criterion(logits.view(1, -1), lbl)
            loss = 0.7 * logit_loss + 0.3 * inst_loss
            loss.backward()
            optimizer.step()
            losses.append(loss.item())
            logit_losses.append(logit_loss.item())
            inst_losses.append(float(inst_loss))
            logits_hist.append(t2n(logits))
        scheduler.step()
    save("train_clam", {f"bag{i}": b for i, b in enumerate(bags)}, params0,
         {"losses": np.asarray(losses, np.float64),
          "logit_losses": np.asarray(logit_losses, np.float64),
          "inst_losses": np.asarray(inst_losses, np.float64),
          "logits": np.concatenate(logits_hist, 0),
          "labels": np.asarray(labels)},
         meta={"num_epochs": num_epochs})


def _load_ref_module(name, path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def gen_train_surv():
    """Survival training trajectories: the vendored RRT network
    (Survival/models/RRTMIL/network.py:753-794, region_num=16 per
    Survival/main.py:125) + NLLSurvLoss(alpha=0) + per-epoch
    CosineAnnealingLR, once with RAdam and once with Lookahead(Adam)
    (Survival/utils/optimizer.py:14-20), reproducing Engine.train's
    backward/step/zero order (Survival/models/RRTMIL/engine.py:62-94).
    4 epochs x 8 bags; per-epoch val losses and risk scores recorded
    (risk = -sum(S), engine.py:79)."""
    surv_net = _load_ref_module(
        "surv_rrt_network", "/root/reference/Survival/models/RRTMIL/network.py")
    surv_loss = _load_ref_module(
        "surv_loss", "/root/reference/Survival/utils/loss.py")
    surv_opt = _load_ref_module(
        "surv_optimizer", "/root/reference/Survival/utils/optimizer.py")

    rng = np.random.default_rng(13)
    dim = 64
    n_bags, n_val = 8, 5
    bags, events, cens, ybin = [], [], [], []
    for i in range(n_bags + n_val):
        n = int(rng.integers(400, 900))
        risk = rng.uniform()
        bag = rng.normal(size=(n, dim)).astype(np.float32)
        bag[: max(8, n // 10)] += 1.2 * risk
        bags.append(bag)
        events.append(float(2000 * (1.05 - risk)))
        cens.append(int(rng.uniform() < 0.3))
        ybin.append(int(min(3, risk * 4)))

    criterion = surv_loss.NLLSurvLoss(alpha=0.0)
    num_epochs = 4
    out = {}
    for opt_name in ("radam", "lookahead"):
        seeded()
        mod = surv_net.RRT(input_dim=dim, n_classes=4, region_num=16,
                           epeg_k=15, crmsa_k=3, dropout=0.0,
                           trans_dropout=0.0).train()
        if opt_name == "radam":
            optimizer = surv_opt.RAdam(mod.parameters(), lr=2e-4,
                                       weight_decay=1e-5)
        else:
            optimizer = surv_opt.Lookahead(
                torch.optim.Adam(mod.parameters(), lr=2e-4,
                                 weight_decay=1e-5))
        scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
            optimizer, num_epochs, 0)
        params0 = rrtmil_params(mod)
        losses, val_losses, val_risks = [], [], []
        for _ in range(num_epochs):
            mod.train()
            for i in range(n_bags):
                hazards, S = mod(torch.from_numpy(bags[i])[None])
                loss = criterion(hazards=hazards, S=S,
                                 Y=torch.tensor([ybin[i]]),
                                 c=torch.tensor([float(cens[i])]))
                loss.backward()
                optimizer.step()
                optimizer.zero_grad()
                losses.append(loss.item())
            mod.eval()
            vl, vr = 0.0, []
            with torch.no_grad():
                for i in range(n_bags, n_bags + n_val):
                    hazards, S = mod(torch.from_numpy(bags[i])[None])
                    vl += criterion(hazards=hazards, S=S,
                                    Y=torch.tensor([ybin[i]]),
                                    c=torch.tensor([float(cens[i])])).item()
                    vr.append(float(-S.sum().item()))
            val_losses.append(vl / n_val)
            val_risks.append(vr)
            scheduler.step()
        out[f"{opt_name}_losses"] = np.asarray(losses, np.float64)
        out[f"{opt_name}_val_losses"] = np.asarray(val_losses, np.float64)
        out[f"{opt_name}_val_risks"] = np.asarray(val_risks, np.float64)
        if opt_name == "radam":
            surv_params0 = params0
    save("train_surv", {f"bag{i}": b for i, b in enumerate(bags)},
         surv_params0,
         dict(out, events=np.asarray(events), cens=np.asarray(cens),
              ybin=np.asarray(ybin)),
         meta={"num_epochs": num_epochs, "n_train": n_bags, "n_val": n_val})


def _pin_manifest():
    """Record file -> sha256 for every fixture (tests/golden_utils verifies
    this once per process; VERDICT r3 missing #3)."""
    tests_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
    sys.path.insert(0, tests_dir)
    import golden_utils
    golden_utils.write_manifest()
    print(f"  pinned {golden_utils.MANIFEST}")


def main():
    print("Generating goldens from /root/reference (torch CPU)...")
    if len(sys.argv) > 1:          # regenerate selected goldens only
        for name in sys.argv[1:]:
            globals()[f"gen_{name}"]()
        _pin_manifest()
        print("done.")
        return
    gen_train_steps()
    gen_train_long()
    gen_train_clam()
    gen_train_surv()
    gen_topk_svm()
    gen_attmil()
    gen_attmil_rrt()
    gen_mean_max()
    gen_clam()
    gen_dsmil()
    gen_transmil()
    gen_ibmil()
    gen_inner_attention()
    gen_region_attention()
    gen_crmsa()
    gen_nystrom()
    gen_dattention()
    gen_encoder()
    gen_rrtmil()
    _pin_manifest()
    print("done.")


if __name__ == "__main__":
    main()
