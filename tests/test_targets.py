"""build_targets + YOLO loss vs. an independent looped numpy reference."""
import numpy as np
import jax.numpy as jnp

from millieye_tpu.ops.targets import build_targets
from millieye_tpu.models.yolo_head import yolo_scale_loss


def np_build_targets(pred_boxes, pred_cls, targets_list, anchors, ignore_thresh):
    """Looped reference: targets_list is [(b, label, cx, cy, w, h)] normalized."""
    B, A, G = pred_boxes.shape[:3]
    C = pred_cls.shape[-1]
    obj = np.zeros((B, A, G, G))
    noobj = np.ones((B, A, G, G))
    tx = np.zeros((B, A, G, G))
    ty = np.zeros((B, A, G, G))
    tw = np.zeros((B, A, G, G))
    th = np.zeros((B, A, G, G))
    tcls = np.zeros((B, A, G, G, C))
    iou_scores = np.zeros((B, A, G, G))
    class_mask = np.zeros((B, A, G, G))

    def wh_iou(a, wh):
        inter = min(a[0], wh[0]) * min(a[1], wh[1])
        return inter / (a[0] * a[1] + 1e-16 + wh[0] * wh[1] - inter)

    def iou_xywh(b1, b2):
        # +1 convention, xywh input
        a1 = [b1[0] - b1[2] / 2, b1[1] - b1[3] / 2, b1[0] + b1[2] / 2, b1[1] + b1[3] / 2]
        a2 = [b2[0] - b2[2] / 2, b2[1] - b2[3] / 2, b2[0] + b2[2] / 2, b2[1] + b2[3] / 2]
        ix1, iy1 = max(a1[0], a2[0]), max(a1[1], a2[1])
        ix2, iy2 = min(a1[2], a2[2]), min(a1[3], a2[3])
        inter = max(ix2 - ix1 + 1, 0) * max(iy2 - iy1 + 1, 0)
        u1 = (a1[2] - a1[0] + 1) * (a1[3] - a1[1] + 1)
        u2 = (a2[2] - a2[0] + 1) * (a2[3] - a2[1] + 1)
        return inter / (u1 + u2 - inter + 1e-16)

    for (b, label, cx, cy, w, h) in targets_list:
        gx, gy, gw, gh = cx * G, cy * G, w * G, h * G
        ious = np.array([wh_iou(a, (gw, gh)) for a in anchors])
        best = int(ious.argmax())
        gi, gj = int(gx), int(gy)
        obj[b, best, gj, gi] = 1
        noobj[b, best, gj, gi] = 0
        for a_i, iou in enumerate(ious):
            if iou > ignore_thresh:
                noobj[b, a_i, gj, gi] = 0
        tx[b, best, gj, gi] = gx - gi
        ty[b, best, gj, gi] = gy - gj
        tw[b, best, gj, gi] = np.log(gw / anchors[best][0] + 1e-16)
        th[b, best, gj, gi] = np.log(gh / anchors[best][1] + 1e-16)
        tcls[b, best, gj, gi, int(label)] = 1
        iou_scores[b, best, gj, gi] = iou_xywh(pred_boxes[b, best, gj, gi],
                                               (gx, gy, gw, gh))
        class_mask[b, best, gj, gi] = float(
            pred_cls[b, best, gj, gi].argmax() == int(label))
    return dict(obj_mask=obj, noobj_mask=noobj, tx=tx, ty=ty, tw=tw, th=th,
                tcls=tcls, iou_scores=iou_scores, class_mask=class_mask)


def make_case(rng, B=2, A=3, G=13, C=12, T=6):
    pred_boxes = rng.uniform(0, G, size=(B, A, G, G, 4)).astype(np.float32)
    pred_cls = rng.uniform(0, 1, size=(B, A, G, G, C)).astype(np.float32)
    anchors = np.array([[2.5, 2.6], [4.2, 5.3], [10.8, 10.0]], np.float32)
    targets = np.zeros((B, T, 5), np.float32)
    tmask = np.zeros((B, T), bool)
    tlist = []
    # distinct cells to avoid duplicate-assignment tie-break ambiguity
    cells = rng.choice(G * G, size=B * T, replace=False)
    k = 0
    for b in range(B):
        for t in range(T - 1):  # leave one padded slot per image
            gi, gj = int(cells[k]) % G, int(cells[k]) // G
            k += 1
            cx = (gi + rng.uniform(0.1, 0.9)) / G
            cy = (gj + rng.uniform(0.1, 0.9)) / G
            w = rng.uniform(0.05, 0.6)
            h = rng.uniform(0.05, 0.6)
            label = rng.integers(0, C)
            targets[b, t] = (label, cx, cy, w, h)
            tmask[b, t] = True
            tlist.append((b, label, cx, cy, w, h))
    return pred_boxes, pred_cls, anchors, targets, tmask, tlist


def test_build_targets_matches_reference(rng):
    pred_boxes, pred_cls, anchors, targets, tmask, tlist = make_case(rng)
    got = build_targets(jnp.asarray(pred_boxes), jnp.asarray(pred_cls),
                        jnp.asarray(targets), jnp.asarray(tmask),
                        anchors, ignore_thresh=0.5)
    want = np_build_targets(pred_boxes, pred_cls, tlist, anchors, 0.5)
    for key in ("obj_mask", "noobj_mask", "tx", "ty", "tw", "th",
                "tcls", "iou_scores", "class_mask"):
        # f32 op-ordering noise vs the f64 reference (log/div) -> 1e-4 atol
        np.testing.assert_allclose(np.asarray(got[key]), want[key],
                                   rtol=1e-3, atol=1e-4, err_msg=key)


def test_yolo_loss_finite_and_padded_invariant(rng):
    _, _, anchors, targets, tmask, _ = make_case(rng)
    B, A, G, C = 2, 3, 13, 12
    pred = rng.normal(size=(B, A, G, G, 5 + C)).astype(np.float32)
    pred01 = 1 / (1 + np.exp(-pred))  # mimic post-sigmoid channels
    pred[..., 0:2] = pred01[..., 0:2]
    pred[..., 4:] = pred01[..., 4:]

    loss1, m1 = yolo_scale_loss(jnp.asarray(pred), anchors * 16.0, 16.0,
                                jnp.asarray(targets), jnp.asarray(tmask))
    assert np.isfinite(float(loss1))
    # garbage in padded target slots must not change the loss
    targets2 = targets.copy()
    targets2[~tmask] = rng.uniform(0, 1, size=(int((~tmask).sum()), 5))
    loss2, _ = yolo_scale_loss(jnp.asarray(pred), anchors * 16.0, 16.0,
                               jnp.asarray(targets2), jnp.asarray(tmask))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)

    # empty-target batch: finite zero-ish loss, no NaN
    loss3, _ = yolo_scale_loss(jnp.asarray(pred), anchors * 16.0, 16.0,
                               jnp.zeros_like(targets), jnp.zeros_like(tmask))
    assert np.isfinite(float(loss3))
