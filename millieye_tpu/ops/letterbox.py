"""On-device image preprocessing (letterbox pad / resize).

The reference does ToTensor + pad_to_square + interpolate on the host in
DataLoader workers or the demo's producer process (datasets.py:16-31,
run_mp.py:111-143); here the same transforms are jit-compiled JAX so camera
frames stream straight into the inference graph (host does only JPEG/video
decode).

Interpolation conventions match torch:
* ``resize_nearest``: F.interpolate(mode="nearest") — src = floor(dst*in/out);
* ``resize_bilinear_align_corners``: F.interpolate(mode="bilinear",
  align_corners=True) — src = dst*(in-1)/(out-1) (used for radar maps,
  datasets.py:321).
"""
from __future__ import annotations

import jax.numpy as jnp


def to_float(img_u8):
    """uint8 [..., C] -> float32 in [0, 1] (torchvision ToTensor without the
    CHW transpose — this framework is NHWC)."""
    return img_u8.astype(jnp.float32) / 255.0


def pad_to_square(img, pad_value=0.0):
    """img [H, W, C] -> ([S, S, C], (left, right, top, bottom)).

    Splits the difference like the reference (datasets.py:16-26):
    pad1 = diff//2 leading, pad2 = diff - diff//2 trailing.
    """
    h, w = img.shape[0], img.shape[1]
    diff = abs(h - w)
    p1, p2 = diff // 2, diff - diff // 2
    if h <= w:
        pads = ((p1, p2), (0, 0), (0, 0))
        pad_ltrb = (0, 0, p1, p2)
    else:
        pads = ((0, 0), (p1, p2), (0, 0))
        pad_ltrb = (p1, p2, 0, 0)
    return jnp.pad(img, pads, constant_values=pad_value), pad_ltrb


def resize_nearest(img, size):
    """img [H, W, C] -> [size, size, C], torch nearest semantics."""
    h, w = img.shape[0], img.shape[1]
    ri = jnp.floor(jnp.arange(size) * (h / size)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(size) * (w / size)).astype(jnp.int32)
    return img[ri][:, ci]


def _ac_weights(in_size, out_size):
    if out_size == 1:
        src = jnp.zeros((1,))
    else:
        src = jnp.arange(out_size) * ((in_size - 1) / (out_size - 1))
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = src - lo
    return lo, hi, frac.astype(jnp.float32)


def resize_bilinear_align_corners(img, size):
    """img [H, W, C] -> [size, size, C], torch align_corners=True bilinear."""
    h, w = img.shape[0], img.shape[1]
    rlo, rhi, rf = _ac_weights(h, size)
    clo, chi, cf = _ac_weights(w, size)
    top = img[rlo] * (1 - rf)[:, None, None] + img[rhi] * rf[:, None, None]
    out = (top[:, clo] * (1 - cf)[None, :, None]
           + top[:, chi] * cf[None, :, None])
    return out


def letterbox_image(img_u8, size):
    """Full camera-frame ingest: uint8 HWC -> float [size, size, C] + pads.

    Equivalent to ToTensor -> pad_to_square(0) -> resize(nearest)
    (run_mp.py:114-142 producer path), but on-device.
    """
    img = to_float(img_u8)
    img, pad = pad_to_square(img, 0.0)
    return resize_nearest(img, size), pad
