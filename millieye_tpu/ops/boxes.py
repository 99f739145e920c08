"""Box coordinate math, jit-friendly and shape-polymorphic.

Behavioral parity notes (reference: sxontheway/milliEye):

* ``iou_matrix(..., plus_one=True)`` reproduces the reference's +1 pixel
  convention (``module3_our_dataset/utils/utils.py:269-274``): intersection
  and areas use ``x2 - x1 + 1``.  torchvision kernels (used by the
  reference's NMS, ``utils/utils.py:372``) do NOT add 1 — pass
  ``plus_one=False`` there.  This distinction silently shifts mAP, so it is
  explicit here.
* ``box_regress`` / ``encode_boxes`` follow
  ``module3_our_dataset/my_models.py:378-408`` (dx·w + x, exp(dw)·w coding,
  log(+1e-16) encode).  ``exp`` runs in float32 — bf16 overflows.

All functions accept [..., 4] arrays; coordinates are (x1, y1, x2, y2) for
"xyxy" and (cx, cy, w, h) for "xywh".
"""
from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(b):
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Ref: utils/utils.py:68-74."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(b):
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Ref: utils/utils.py:58-65."""
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def _iou_core(a, b, plus_one):
    one = 1.0 if plus_one else 0.0
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(ix2 - ix1 + one, 0, None) * jnp.clip(iy2 - iy1 + one, 0, None)
    area_a = (a[..., 2] - a[..., 0] + one) * (a[..., 3] - a[..., 1] + one)
    area_b = (b[..., 2] - b[..., 0] + one) * (b[..., 3] - b[..., 1] + one)
    return inter / (area_a + area_b - inter + 1e-16)


def iou_pairwise(a, b, plus_one=True):
    """Elementwise IoU of equal-shaped [..., 4] xyxy boxes.

    Defaults to the reference's +1 convention (utils/utils.py:248-278).
    """
    return _iou_core(a, b, plus_one)


def iou_matrix(a, b, plus_one=True):
    """All-pairs IoU: a [n, 4] x b [m, 4] -> [n, m] (xyxy)."""
    return _iou_core(a[:, None, :], b[None, :, :], plus_one)


def wh_iou(wh1, wh2):
    """IoU by shape only (boxes co-centered): wh1 [n, 2] x wh2 [m, 2] -> [n, m].

    Ref: bbox_wh_iou, utils/utils.py:239-245 (note the 1e-16 inside union).
    """
    w1, h1 = wh1[:, None, 0], wh1[:, None, 1]
    w2, h2 = wh2[None, :, 0], wh2[None, :, 1]
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    union = (w1 * h1 + 1e-16) + w2 * h2 - inter
    return inter / union


def rescale_boxes(boxes, current_dim, original_shape):
    """Undo letterbox padding: map boxes from the padded square back to the
    original image. Ref: utils/utils.py:41-55 (including the ``//2`` floor).

    boxes: [..., 4] xyxy in the ``current_dim`` square; original_shape (h, w).
    """
    orig_h, orig_w = original_shape
    m = max(original_shape)
    pad_x = max(orig_h - orig_w, 0) * (current_dim / m)
    pad_y = max(orig_w - orig_h, 0) * (current_dim / m)
    unpad_h = current_dim - pad_y
    unpad_w = current_dim - pad_x
    x1 = (boxes[..., 0] - pad_x // 2) / unpad_w * orig_w
    y1 = (boxes[..., 1] - pad_y // 2) / unpad_h * orig_h
    x2 = (boxes[..., 2] - pad_x // 2) / unpad_w * orig_w
    y2 = (boxes[..., 3] - pad_y // 2) / unpad_h * orig_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_regress(regress_param, roi_xyxy):
    """Apply regression deltas to RoIs. Ref: my_models.py:378-391.

    regress_param [..., 4] (dx, dy, dw, dh); roi_xyxy [..., 4] in image scale.
    Returns regressed xyxy. exp() is computed in float32.
    """
    xywh = xyxy_to_xywh(roi_xyxy)
    x, y, w, h = xywh[..., 0], xywh[..., 1], xywh[..., 2], xywh[..., 3]
    p = regress_param.astype(jnp.float32)
    xr = p[..., 0] * w + x
    yr = p[..., 1] * h + y
    # clamped so arbitrary (e.g. untrained) head outputs stay finite;
    # trained deltas live in (-1, 1), far inside the clamp
    wr = jnp.exp(jnp.clip(p[..., 2], -20.0, 20.0)) * w
    hr = jnp.exp(jnp.clip(p[..., 3], -20.0, 20.0)) * h
    return xywh_to_xyxy(jnp.stack([xr, yr, wr, hr], axis=-1))


def encode_boxes(roi_xyxy, target_xyxy):
    """Regression targets for (roi -> target). Ref: regression_loss,
    my_models.py:394-408: ((xt-x)/w, (yt-y)/h, log(wt/w + 1e-16), ...).
    """
    r = xyxy_to_xywh(roi_xyxy)
    t = xyxy_to_xywh(target_xyxy)
    x, y, w, h = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    xt, yt, wt, ht = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    return jnp.stack(
        [
            (xt - x) / (w + 1e-16),
            (yt - y) / (h + 1e-16),
            jnp.log(wt / w + 1e-16),
            jnp.log(ht / h + 1e-16),
        ],
        axis=-1,
    )
