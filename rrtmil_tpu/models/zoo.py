"""Model factory, mirroring reference main.py:138-222.

Every baseline accepts an optional injected RRT encoder config (the
`--only_rrt_enc` path builds one shared config, main.py:138-155).  Models
whose forward produces an aux loss (CLAM) or aux logits (DSMIL) are wrapped
by the Engine via `aux_mode`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from ..config import RRTEncoderConfig, RRTMILConfig, PoolConfig
from .abmil import ABMIL, GatedABMIL
from .clam import CLAM_MB, CLAM_SB
from .dsmil import DSMIL
from .ibmil import IBMIL
from .mean_max import MaxMIL, MeanMIL
from .rrt import RRTMIL
from .transmil import TransMIL

# model name -> (class, aux_mode)
#   aux_mode: None        - forward returns logits
#             'loss'      - train forward returns (logits, aux_loss, ps)
#             'logits'    - forward returns (logits, aux_logits[, ps]); the
#                           engine applies the criterion to aux_logits
_REGISTRY = {
    "rrtmil": (RRTMIL, None),
    "attmil": (ABMIL, None),
    "gattmil": (GatedABMIL, None),
    "clam_sb": (CLAM_SB, "loss"),
    "clam_mb": (CLAM_MB, "loss"),
    "dsmil": (DSMIL, "logits"),
    "transmil": (TransMIL, None),
    "meanmil": (MeanMIL, None),
    "maxmil": (MaxMIL, None),
    "ibmil": (IBMIL, None),
}

# loss-weight overrides forced by the reference harness (main.py:213-214,
# 719-726): CLAM -> 0.7/0.3, DSMIL -> 0.5/0.5.
LOSS_WEIGHT_OVERRIDES = {
    "clam_sb": (0.7, 0.3),
    "clam_mb": (0.7, 0.3),
    "dsmil": (0.5, 0.5),
}


def model_names():
    return sorted(_REGISTRY)


def aux_mode(name: str) -> Optional[str]:
    if name not in _REGISTRY:
        return None     # models with dedicated engines (dtfd, mhim)
    return _REGISTRY[name][1]


def build_model(name: str, input_dim: int = 1024, n_classes: int = 2,
                dropout: float = 0.25, act: str = "relu",
                rrt: Optional[RRTEncoderConfig] = None,
                rrtmil_cfg: Optional[RRTMILConfig] = None,
                confounders=None, pool: str = "attn", **kwargs):
    """Instantiate a zoo model by its reference CLI name."""
    name = name.lower()
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; choose from {model_names()}")
    cls, _ = _REGISTRY[name]
    if name == "rrtmil":
        cfg = rrtmil_cfg or RRTMILConfig(
            input_dim=input_dim, n_classes=n_classes, act=act, dropout=dropout,
            encoder=rrt or RRTEncoderConfig(),
            pool=PoolConfig(kind=pool, **kwargs.get("pool_kwargs", {})))
        return RRTMIL(cfg)
    if name == "ibmil":
        return IBMIL(input_dim=input_dim, n_classes=n_classes, act=act,
                     dropout=dropout, rrt=rrt, confounders=confounders)
    if name == "transmil":
        return TransMIL(input_dim=input_dim, n_classes=n_classes, act=act,
                        dropout=dropout,
                        cls_token_std=kwargs.get("cls_token_std", 1.0))
    if name in ("clam_sb", "clam_mb"):
        return cls(input_dim=input_dim, n_classes=n_classes, act=act,
                   dropout=dropout, rrt=rrt,
                   subtyping=kwargs.get("subtyping", False))
    return cls(input_dim=input_dim, n_classes=n_classes, act=act,
               dropout=dropout, rrt=rrt)


def requires_exact(model) -> bool:
    return bool(getattr(model, "requires_exact", False))
