"""YOLO detection loss (6-term) over padded targets.

Mirrors YOLOLayer's training branch (yolov3/models.py:178-232): masked MSE
on x/y/w/h at assigned cells, BCE objectness with obj_scale=1 /
noobj_scale=100, BCE classification at assigned cells. torch's
``mean``-reduction over boolean-indexed selections becomes
sum(term * mask) / count; empty masks divide by a clamped count of 1
(the reference would produce NaN there — this framework defines the empty
case as 0 loss instead).
"""
from __future__ import annotations

import jax.numpy as jnp

from millieye_tpu.ops.targets import build_targets

OBJ_SCALE = 1.0
NOOBJ_SCALE = 100.0
_EPS = 1e-12


def _masked_mean(values, mask):
    count = jnp.maximum(mask.sum(), 1.0)
    # hard-select, don't multiply: values * mask lets a NaN/inf in a
    # masked-OUT cell poison the sum (NaN*0 = NaN) — and its gradient.
    # where() zeroes both the value and the grad path of unselected cells.
    return jnp.where(mask > 0, values, 0.0).sum() / count


def _sel(mask, values, neutral):
    """Replace masked-out cells with a neutral constant BEFORE the
    differentiable ops: masking only the summed output is not enough,
    because backprop multiplies the upstream zero by the local
    derivative, and 0 * NaN = NaN (a saturated/poisoned prediction in an
    unassigned cell would otherwise NaN the whole gradient)."""
    return jnp.where(mask > 0, values, neutral)


def _bce(p, t):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def yolo_scale_loss(pred, anchors_px, stride, targets, tmask, ignore_thresh=0.5):
    """Loss for one YOLO scale.

    pred: [B, A, G, G, 5+C] — (sigmoid-x, sigmoid-y, tw, th, sigmoid-conf,
          sigmoid-cls), the ``preds`` output of Darknet.apply.
    anchors_px: [A, 2] anchors in pixels; stride: image pixels per cell.
    targets: [B, T, 5] normalized (class, cx, cy, w, h); tmask: [B, T].

    Returns (total_loss, metrics dict).
    """
    anchors_grid = jnp.asarray(anchors_px, jnp.float32) / stride
    g = pred.shape[2]
    # decoded boxes in grid units, for assignment metrics
    import jax

    gy = jax.lax.broadcasted_iota(jnp.float32, (g, g), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (g, g), 1)
    bx = pred[..., 0] + gx[None, None]
    by = pred[..., 1] + gy[None, None]
    # clamp like the decode path (darknet.decode_yolo): noobj cells' tw/th
    # are unconstrained by any loss term and can drift past exp overflow,
    # which turns the assignment IoUs (and metrics) into inf/NaN
    bw = jnp.exp(jnp.clip(pred[..., 2], -20.0, 20.0)) * (
        anchors_grid[None, :, 0, None, None])
    bh = jnp.exp(jnp.clip(pred[..., 3], -20.0, 20.0)) * (
        anchors_grid[None, :, 1, None, None])
    pred_boxes = jnp.stack([bx, by, bw, bh], axis=-1)

    t = build_targets(pred_boxes, pred[..., 5:], targets, tmask,
                      anchors_grid, ignore_thresh)
    obj, noobj = t["obj_mask"], t["noobj_mask"]

    loss_x = _masked_mean((_sel(obj, pred[..., 0], 0.0) - t["tx"]) ** 2, obj)
    loss_y = _masked_mean((_sel(obj, pred[..., 1], 0.0) - t["ty"]) ** 2, obj)
    loss_w = _masked_mean((_sel(obj, pred[..., 2], 0.0) - t["tw"]) ** 2, obj)
    loss_h = _masked_mean((_sel(obj, pred[..., 3], 0.0) - t["th"]) ** 2, obj)
    conf = pred[..., 4]
    loss_conf_obj = _masked_mean(
        _bce(_sel(obj, conf, 0.5), t["tconf"]), obj)
    loss_conf_noobj = _masked_mean(
        _bce(_sel(noobj, conf, 0.5), t["tconf"]), noobj)
    loss_conf = OBJ_SCALE * loss_conf_obj + NOOBJ_SCALE * loss_conf_noobj
    loss_cls = _masked_mean(
        _bce(_sel(obj[..., None], pred[..., 5:], 0.5), t["tcls"]).mean(-1),
        obj
    )
    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls

    n_obj = jnp.maximum(obj.sum(), 1e-16)
    conf50 = (conf > 0.5).astype(jnp.float32)
    iou50 = (t["iou_scores"] > 0.5).astype(jnp.float32)
    iou75 = (t["iou_scores"] > 0.75).astype(jnp.float32)
    detected = conf50 * t["class_mask"] * t["tconf"]
    metrics = {
        "loss": total,
        "x": loss_x, "y": loss_y, "w": loss_w, "h": loss_h,
        "conf": loss_conf, "cls": loss_cls,
        "cls_acc": 100.0 * _masked_mean(t["class_mask"], obj),
        "recall50": (iou50 * detected).sum() / n_obj,
        "recall75": (iou75 * detected).sum() / n_obj,
        "precision": (iou50 * detected).sum() / jnp.maximum(conf50.sum(), 1e-16),
        "conf_obj": _masked_mean(conf, obj),
        "conf_noobj": _masked_mean(conf, noobj),
    }
    return total, metrics


def yolo_loss(preds, anchors_per_scale, img_dim, targets, tmask,
              ignore_thresh=0.5):
    """Sum of per-scale losses (Darknet.forward accumulates layer losses,
    yolov3/models.py:262-263). Returns (loss, list-of-metrics)."""
    total = 0.0
    all_metrics = []
    for pred, anchors in zip(preds, anchors_per_scale):
        stride = img_dim / pred.shape[2]
        loss, metrics = yolo_scale_loss(
            pred, anchors, stride, targets, tmask, ignore_thresh)
        total = total + loss
        all_metrics.append(metrics)
    return total, all_metrics
