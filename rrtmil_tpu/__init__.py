"""rrtmil_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capabilities
of DearCaat/RRT-MIL (CVPR 2024): MIL over whole-slide-image patch features,
with the RRT re-embedding encoder (R-MSA + EPEG + CR-MSA), a model zoo,
classification and survival harnesses, and multi-chip scaling."""

__version__ = "0.1.0"

from . import config  # noqa: F401
