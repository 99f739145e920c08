"""Vectorized YOLO target assignment (grid/anchor matching).

The reference ``build_targets`` (utils/utils.py:381-440) loops in Python
over targets to scatter masks; here the whole assignment is one batched
scatter over a padded target tensor — targets arrive as [B, T, 5]
(class, cx, cy, w, h all normalized to (0,1)) with a validity mask [B, T],
so the op is jit/pjit-friendly with static shapes.

Semantics preserved:
* best anchor per target by shape-only IoU (bbox_wh_iou);
* noobj mask zeroed for every anchor whose shape-IoU exceeds
  ``ignore_thresh`` at the target cell;
* tw/th = log(gwh / anchor + 1e-16);
* iou_scores/class_mask computed at the assigned cell against the decoded
  prediction, using the +1-pixel IoU on xywh boxes (bbox_iou(x1y1x2y2=False)).

Duplicate assignment (two targets landing on the same cell+anchor): the
reference's indexed assignment keeps the later target; XLA scatter order is
unspecified, so one of the duplicates wins — which one is not guaranteed.
Duplicates are rare and only perturb single-cell regression targets.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from millieye_tpu.ops.boxes import iou_pairwise, xywh_to_xyxy


def build_targets(pred_boxes, pred_cls, targets, tmask, anchors, ignore_thresh=0.5):
    """
    pred_boxes: [B, A, G, G, 4] decoded (cx, cy, w, h) in *grid* units
    pred_cls:   [B, A, G, G, C] sigmoid class scores
    targets:    [B, T, 5] (class, cx, cy, w, h) normalized to (0,1)
    tmask:      [B, T] bool
    anchors:    [A, 2] in grid units

    Returns dict of [B, A, G, G] (+ tcls [B, A, G, G, C]) tensors:
    obj_mask, noobj_mask, tx, ty, tw, th, tcls, tconf, iou_scores, class_mask.
    """
    b_sz, a_sz, g = pred_boxes.shape[0], pred_boxes.shape[1], pred_boxes.shape[2]
    c_sz = pred_cls.shape[-1]
    anchors = jnp.asarray(anchors, jnp.float32)

    labels = targets[..., 0].astype(jnp.int32)                     # [B,T]
    gxy = targets[..., 1:3] * g
    gwh = targets[..., 3:5] * g

    # shape-only IoU vs each anchor: [B,T,A]
    inter = jnp.minimum(gwh[..., None, 0], anchors[None, None, :, 0]) * jnp.minimum(
        gwh[..., None, 1], anchors[None, None, :, 1]
    )
    union = (
        anchors[None, None, :, 0] * anchors[None, None, :, 1]
        + 1e-16
        + gwh[..., 0:1] * gwh[..., 1:2]
        - inter
    )
    anchor_ious = inter / union
    best_n = jnp.argmax(anchor_ious, axis=-1)                       # [B,T]

    gi = jnp.clip(gxy[..., 0].astype(jnp.int32), 0, g - 1)
    gj = jnp.clip(gxy[..., 1].astype(jnp.int32), 0, g - 1)
    b_idx = jnp.broadcast_to(jnp.arange(b_sz)[:, None], labels.shape)

    # invalid targets scatter out of bounds and are dropped
    b_safe = jnp.where(tmask, b_idx, b_sz)

    zeros = jnp.zeros((b_sz, a_sz, g, g), jnp.float32)
    obj_mask = zeros.at[b_safe, best_n, gj, gi].max(1.0, mode="drop")
    noobj = jnp.ones((b_sz, a_sz, g, g), jnp.float32)
    noobj = noobj.at[b_safe, best_n, gj, gi].min(0.0, mode="drop")
    # also ignore every anchor over the shape-IoU threshold at that cell
    ignore = (anchor_ious > ignore_thresh)                          # [B,T,A]
    anchor_range = jnp.broadcast_to(
        jnp.arange(a_sz)[None, None, :], ignore.shape
    )
    b_ig = jnp.where(tmask[..., None] & ignore, b_idx[..., None], b_sz)
    noobj = noobj.at[
        b_ig, anchor_range,
        jnp.broadcast_to(gj[..., None], ignore.shape),
        jnp.broadcast_to(gi[..., None], ignore.shape),
    ].min(0.0, mode="drop")

    tx = zeros.at[b_safe, best_n, gj, gi].set(
        gxy[..., 0] - jnp.floor(gxy[..., 0]), mode="drop")
    ty = zeros.at[b_safe, best_n, gj, gi].set(
        gxy[..., 1] - jnp.floor(gxy[..., 1]), mode="drop")
    anchor_best = anchors[best_n]                                   # [B,T,2]
    tw = zeros.at[b_safe, best_n, gj, gi].set(
        jnp.log(gwh[..., 0] / anchor_best[..., 0] + 1e-16), mode="drop")
    th = zeros.at[b_safe, best_n, gj, gi].set(
        jnp.log(gwh[..., 1] / anchor_best[..., 1] + 1e-16), mode="drop")
    tcls = jnp.zeros((b_sz, a_sz, g, g, c_sz), jnp.float32)
    tcls = tcls.at[b_safe, best_n, gj, gi, labels].set(1.0, mode="drop")

    # metrics at the assigned cell
    pred_at = pred_boxes[
        jnp.minimum(b_idx, b_sz - 1), best_n, gj, gi]               # [B,T,4]
    tb_xywh = jnp.concatenate([gxy, gwh], axis=-1)
    ious = iou_pairwise(xywh_to_xyxy(pred_at), xywh_to_xyxy(tb_xywh))
    iou_scores = zeros.at[b_safe, best_n, gj, gi].set(ious, mode="drop")
    pred_lab = jnp.argmax(
        pred_cls[jnp.minimum(b_idx, b_sz - 1), best_n, gj, gi], axis=-1
    )
    class_mask = zeros.at[b_safe, best_n, gj, gi].set(
        (pred_lab == labels).astype(jnp.float32), mode="drop")

    return {
        "obj_mask": obj_mask,
        "noobj_mask": noobj,
        "tx": tx,
        "ty": ty,
        "tw": tw,
        "th": th,
        "tcls": tcls,
        "tconf": obj_mask,
        "iou_scores": iou_scores,
        "class_mask": class_mask,
    }
