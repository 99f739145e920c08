"""Radar heatmap rasterizer — on-device scatter-add histogram.

Re-implements ``plot_radar_heatmap`` (datasets.py:56-106) as a fixed-shape
JAX op: three channels over the image plane at ~1/16 scale,

  ch0  point count            clipped/scaled by range (0, 5)
  ch1  mean depth per bin     empty or <1 -> 100, then range (12, 0) REVERSED
  ch2  |mean velocity|        range (0, 4)

``np.histogram2d`` becomes a masked scatter-add (right-inclusive last edge,
like numpy). Points arrive padded [P, 4] (u, v, z, V) with a validity mask,
so the op jits with static shapes and fuses into the ingest graph.
"""
from __future__ import annotations

import jax.numpy as jnp

RANGES = ((0.0, 5.0), (12.0, 0.0), (0.0, 4.0))


def heatmap_bins(img_size, map_size=32):
    """(bin_w, bin_h) like the reference: scale = max(img)/map_size,
    bins = round(dim/scale)."""
    scale = max(img_size) / map_size
    return int(round(img_size[0] / scale)), int(round(img_size[1] / scale))


def radar_heatmap(points, pmask, img_size, map_size=32):
    """points [P, 4] (u, v, z, V); pmask [P] bool; img_size (w, h) python ints.

    Returns [bin_h, bin_w, 3] float32 in [0, 1].
    """
    w, h = img_size
    bin_w, bin_h = heatmap_bins(img_size, map_size)

    u, v, z, vel = points[:, 0], points[:, 1], points[:, 2], points[:, 3]
    in_range = (u >= 0) & (u <= w) & (v >= 0) & (v <= h) & pmask
    bx = jnp.clip((u / w * bin_w).astype(jnp.int32), 0, bin_w - 1)
    by = jnp.clip((v / h * bin_h).astype(jnp.int32), 0, bin_h - 1)
    # out-of-range points scatter out of bounds and drop
    by = jnp.where(in_range, by, bin_h)

    zero = jnp.zeros((bin_h, bin_w), jnp.float32)
    ones = jnp.ones_like(u, jnp.float32)
    h0 = zero.at[by, bx].add(ones, mode="drop")
    zsum = zero.at[by, bx].add(z, mode="drop")
    vsum = zero.at[by, bx].add(vel, mode="drop")

    depth = zsum / (h0 + 1e-6)
    depth = jnp.where(depth < 1, 100.0, depth)
    speed = jnp.abs(vsum / (h0 + 1e-6))

    maps = jnp.stack([h0, depth, speed], axis=-1)
    lo = jnp.asarray([r[0] for r in RANGES], jnp.float32)
    hi = jnp.asarray([r[1] for r in RANGES], jnp.float32)
    return jnp.clip((maps - lo) / (hi - lo), 0.0, 1.0)
