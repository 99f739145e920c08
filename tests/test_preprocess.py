"""Letterbox / resize / heatmap rasterizer vs. torch + numpy references."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from millieye_tpu.ops.letterbox import (
    pad_to_square, resize_nearest, resize_bilinear_align_corners, to_float,
)
from millieye_tpu.ops.rasterize import radar_heatmap, heatmap_bins


def test_pad_to_square_landscape(rng):
    img = rng.uniform(size=(480, 640, 3)).astype(np.float32)
    out, pad = pad_to_square(jnp.asarray(img), 0.0)
    assert out.shape == (640, 640, 3)
    assert pad == (0, 0, 80, 80)
    t = F.pad(torch.tensor(img).permute(2, 0, 1), (0, 0, 80, 80)).permute(1, 2, 0)
    np.testing.assert_array_equal(np.asarray(out), t.numpy())


def test_pad_to_square_portrait(rng):
    img = rng.uniform(size=(101, 50, 3)).astype(np.float32)
    out, pad = pad_to_square(jnp.asarray(img), 0.0)
    assert out.shape == (101, 101, 3)
    assert pad == (25, 26, 0, 0)  # diff//2 leading, rest trailing


def test_resize_nearest_matches_torch(rng):
    img = rng.uniform(size=(640, 640, 3)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(img), 416))
    t = F.interpolate(torch.tensor(img).permute(2, 0, 1)[None], size=416,
                      mode="nearest")[0].permute(1, 2, 0).numpy()
    np.testing.assert_array_equal(got, t)


def test_resize_bilinear_ac_matches_torch(rng):
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), 26))
    t = F.interpolate(torch.tensor(img).permute(2, 0, 1)[None], size=26,
                      mode="bilinear", align_corners=True)[0].permute(1, 2, 0)
    np.testing.assert_allclose(got, t.numpy(), rtol=1e-5, atol=1e-6)


def np_heatmap(points, img_size, map_size=32):
    """Reference formulation via np.histogram2d (datasets.py:56-106)."""
    scale = max(img_size) / map_size
    bw, bh = round(img_size[0] / scale), round(img_size[1] / scale)
    rng_ = [[0, img_size[0]], [0, img_size[1]]]
    h0 = np.histogram2d(points[0], points[1], bins=[bw, bh], range=rng_)[0].T
    h1 = np.histogram2d(points[0], points[1], bins=[bw, bh], range=rng_,
                        weights=points[2])[0].T
    h1 /= (h0 + 1e-6)
    h1 = np.where(h1 < 1, 100, h1)
    h2 = np.histogram2d(points[0], points[1], bins=[bw, bh], range=rng_,
                        weights=points[3])[0].T
    h2 = np.abs(h2 / (h0 + 1e-6))
    maps = np.stack((h0, h1, h2), -1)
    ranges = ((0, 5), (12, 0), (0, 4))
    for i in range(3):
        lo, hi = ranges[i]
        maps[..., i] = np.clip((maps[..., i] - lo) / (hi - lo), 0, 1)
    return maps


def test_heatmap_matches_histogram2d(rng):
    w, h = 640, 480
    p = np.zeros((60, 4), np.float32)
    p[:, 0] = rng.uniform(-20, w + 20, size=60)   # includes out-of-range
    p[:, 1] = rng.uniform(-20, h + 20, size=60)
    p[:, 2] = rng.uniform(0, 12, size=60)
    p[:, 3] = rng.uniform(-4, 4, size=60)
    mask = np.ones(60, bool)

    got = np.asarray(radar_heatmap(jnp.asarray(p), jnp.asarray(mask), (w, h)))
    inr = (p[:, 0] >= 0) & (p[:, 0] <= w) & (p[:, 1] >= 0) & (p[:, 1] <= h)
    want = np_heatmap(p[inr].T, (w, h))
    assert got.shape == want.shape == (heatmap_bins((w, h))[1],
                                       heatmap_bins((w, h))[0], 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_heatmap_padded_points_ignored(rng):
    w, h = 640, 480
    p = rng.uniform(0, 400, size=(16, 4)).astype(np.float32)
    mask = np.zeros(16, bool)
    mask[:4] = True
    full = np.asarray(radar_heatmap(jnp.asarray(p), jnp.asarray(mask), (w, h)))
    trimmed = np.asarray(radar_heatmap(jnp.asarray(p[:4]),
                                       jnp.ones(4, bool), (w, h)))
    np.testing.assert_array_equal(full, trimmed)


def test_heatmap_empty():
    out = np.asarray(radar_heatmap(jnp.zeros((8, 4)), jnp.zeros(8, bool),
                                   (640, 480)))
    # empty depth bins -> 100 -> reversed range clips to 0
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[..., 0], 0)
    np.testing.assert_array_equal(out[..., 1], 0)
