from .rrt import RRTEncoder, RRTMIL, TransLayer, InnerAttention, RegionAttention, CrossRegionAttention  # noqa: F401
from .pool import DAttention, Attention, AttentionGated, MeanPool, MaxPool  # noqa: F401
from .nystrom import NystromAttention  # noqa: F401
