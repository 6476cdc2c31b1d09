"""Helpers for loading golden .npz fixtures produced by tools/make_goldens.py."""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
_REFERENCE = "/root/reference"


def ensure_goldens():
    """Generate goldens from the reference checkout if they are missing.

    The fixtures are ~300 MB of fp32 tensors, so they are not committed; the
    generator is deterministic (fixed seeds) and runs once per checkout."""
    marker = os.path.join(GOLDEN_DIR, "rrtmil_c16r50_l937.npz")
    if os.path.exists(marker):
        return True
    if not os.path.isdir(_REFERENCE):
        return False
    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "make_goldens.py")
    subprocess.run([sys.executable, tool], check=True)
    return os.path.exists(marker)


def load(name):
    """Returns (inputs, params_tree, outputs, meta) dicts from a golden file."""
    data = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    inputs, flat_params, outputs, meta = {}, {}, {}, {}
    for key in data.files:
        kind, _, rest = key.partition(":")
        if kind == "in":
            inputs[rest] = data[key]
        elif kind == "p":
            flat_params[rest] = data[key]
        elif kind == "out":
            outputs[rest] = data[key]
        elif kind == "meta":
            meta[rest] = data[key]
    params = {}
    for path, value in flat_params.items():
        node = params
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return inputs, params, outputs, meta
