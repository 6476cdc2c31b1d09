"""Record optimizer-trajectory goldens from the reference torch optimizers.

Runs the reference Survival/utils/optimizer.py RAdam and Lookahead(Adam)
(exactly as define_optimizer builds them, optimizer.py:12-20) on a synthetic
parameter set with a deterministic gradient stream, and saves the parameter
trajectory after every step to tests/goldens/optim_trajectories.npz.

tests/test_optim_parity.py replays the same gradient stream through
rrtmil_tpu.train.optim.make_optimizer under the framework's external-lr
convention and asserts trajectory agreement.

Torch runs ONLY here, offline; the committed .npz keeps the suite torch-free.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference/Survival")

import torch  # noqa: E402

from utils.optimizer import RAdam, Lookahead  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "optim_trajectories.npz")

STEPS = 20
LR = 1e-3
WD = 1e-5
SHAPES = {"w": (4, 3), "b": (3,)}


def grad_stream(rng: np.random.Generator):
    return [{k: rng.standard_normal(s).astype(np.float32)
             for k, s in SHAPES.items()} for _ in range(STEPS)]


def run(opt_name: str):
    rng = np.random.default_rng(0)
    init = {k: rng.standard_normal(s).astype(np.float32)
            for k, s in SHAPES.items()}
    grads = grad_stream(np.random.default_rng(1))

    params = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
    plist = [params[k] for k in sorted(SHAPES)]
    if opt_name == "radam":
        opt = RAdam(plist, lr=LR, weight_decay=WD)
    elif opt_name == "lookahead":
        # define_optimizer's 'Lookahead' branch (optimizer.py:19-20)
        opt = Lookahead(torch.optim.Adam(plist, lr=LR, weight_decay=WD))
    else:
        raise ValueError(opt_name)

    traj = []
    for g in grads:
        for k in SHAPES:
            params[k].grad = torch.tensor(g[k])
        opt.step()
        traj.append({k: params[k].detach().numpy().copy() for k in SHAPES})
    return init, grads, traj


def main():
    out = {}
    for name in ("radam", "lookahead"):
        init, grads, traj = run(name)
        for k in SHAPES:
            out[f"{name}_init_{k}"] = init[k]
            out[f"{name}_grads_{k}"] = np.stack([g[k] for g in grads])
            out[f"{name}_traj_{k}"] = np.stack([t[k] for t in traj])
    np.savez_compressed(OUT, lr=LR, wd=WD, steps=STEPS, **out)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
