"""Convert the reference's dsmil warm-start checkpoint to .npz.

The reference ships `modules/init_ckp/dsmil_init.pth` and loads it
non-strict before DSMIL training (reference main.py:215-218).  This tool
re-exports it as a plain .npz so torch-free deployments can warm-start via
`rrtmil_tpu.models.dsmil.load_warm_start`.

Usage:  python tools/convert_dsmil_init.py IN.pth OUT.npz
"""
from __future__ import annotations

import sys

import numpy as np


def convert(src: str, dst: str) -> None:
    import torch
    sd = torch.load(src, map_location="cpu", weights_only=True)
    np.savez(dst, **{k: v.numpy() for k, v in sd.items()})
    print(f"wrote {dst}: {sorted(sd)}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
