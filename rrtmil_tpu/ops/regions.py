"""Square-grid region geometry, partition and reverse.

Reference semantics (modules/rmsa.py:175-202 `RegionAttntion.padding`):

    H = W = ceil(sqrt(L));  H += (-H) % region_num          # grid side
    region_size = H // region_num
    pad bag with ZEROS to H*W tokens; the zero tokens ATTEND (they are not
    masked) and are sliced off after the attention (rmsa.py:227-228).

Key TPU insight: because the grid side is always rounded up to a multiple of
`region_num`, the set of distinct padded lengths {H*W} is tiny (H in
{8,16,24,...}).  The reference's own padding scheme therefore doubles as an
XLA-friendly *bucketing* scheme: pad every bag to its reference grid H*W at
the data layer, keep shapes static per bucket, and the numerics are exactly
those of the reference for every true length L.  Only the final MIL pooling
needs the true length (as a mask), because the reference unpads before
pooling.

All functions here are shape-static: geometry is computed in Python at trace
time from the static sequence length, so XLA sees fixed shapes.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..config import RegionConfig


@dataclasses.dataclass(frozen=True)
class RegionGeometry:
    """Resolved grid geometry for a bag of true length `length`."""

    length: int        # true token count L
    grid: int          # H == W, the square grid side
    region_size: int   # tokens per region side
    region_num: int    # regions per grid side (grid // region_size)

    @property
    def padded_length(self) -> int:
        return self.grid * self.grid

    @property
    def pad(self) -> int:
        return self.padded_length - self.length

    @property
    def tokens_per_region(self) -> int:
        return self.region_size * self.region_size

    @property
    def num_regions(self) -> int:
        return self.region_num * self.region_num


def grid_geometry(length: int, cfg: RegionConfig) -> RegionGeometry:
    """Mirror of reference modules/rmsa.py:175-198 `padding`, shapes only.

    Includes the `min_region_num` / `min_region_ratio` fallback to one global
    region (rmsa.py:193-198); with the default 0/0 config the fallback never
    triggers because the threshold is L/1e-8.
    """
    side = int(math.ceil(math.sqrt(length)))
    if cfg.region_size > 0:
        side += (-side) % cfg.region_size
        region_size = cfg.region_size
        region_num = side // region_size
    else:
        side += (-side) % cfg.region_num
        region_num = cfg.region_num
        region_size = side // region_num

    pad = side * side - length
    if pad > length / (cfg.min_region_ratio + 1e-8) or length < cfg.min_region_num:
        side = int(math.ceil(math.sqrt(length)))
        side += (-side) % 2
        region_size = side
        region_num = 1
    return RegionGeometry(length=length, grid=side,
                          region_size=region_size, region_num=region_num)


def bucket_length(length: int, cfg: RegionConfig) -> int:
    """Static padded length the data layer should pad a bag of `length` to."""
    return grid_geometry(length, cfg).padded_length


def pad_to_grid(x: jnp.ndarray, geom: RegionGeometry) -> jnp.ndarray:
    """Zero-pad (B, L, C) to (B, H*W, C).  Matches rmsa.py:199-200: padding is
    zeros and participates in attention."""
    if geom.pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, geom.pad), (0, 0)))


def region_partition(x: jnp.ndarray, region_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (num_regions*B, region_size**2, C).

    Mirrors reference modules/rmsa.py:28-39: row-major over the
    (H/rs, W/rs) region grid, batch-major overall.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // region_size, region_size, w // region_size, region_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, region_size * region_size, c)


def region_reverse(regions: jnp.ndarray, region_size: int, h: int, w: int) -> jnp.ndarray:
    """(num_regions*B, region_size**2, C) -> (B, H*W, C).

    Mirrors reference modules/rmsa.py:41-54 (plus the flatten at rmsa.py:225).
    """
    c = regions.shape[-1]
    b = regions.shape[0] * region_size * region_size // (h * w)
    x = regions.reshape(b, h // region_size, w // region_size, region_size, region_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * w, c)
