"""Fixed-shape, on-device, class-aware NMS.

The reference round-trips detections to the CPU mid-forward and calls
torchvision's C++ ``batched_nms`` per image
(``module3_our_dataset/utils/utils.py:337-378``, invoked from
``my_models.py:457``). Here NMS is a pure XLA computation with static
shapes so the whole detector (backbone -> decode -> NMS -> RoI heads)
compiles into one TPU program:

* confidence filter + score sort become a masked ``lax.top_k``;
* class-awareness uses the coordinate-offset trick (equivalent to
  torchvision's ``batched_nms``: boxes of different classes never overlap);
* greedy suppression runs as a FIXPOINT iteration over the [K, K] IoU
  matrix: ``keep_i = valid_i and no higher-ranked kept box overlaps i``,
  iterated to convergence. The fixpoint equals greedy NMS exactly (the
  operator is monotone along the score ranking) but converges in
  suppression-chain-depth steps — typically <10 whole-matrix VPU ops
  instead of K(=512) sequential scalar-driven steps, the difference
  between ~10us and ~1ms of latency per image on TPU;
* outputs are padded to ``max_det`` rows with a validity mask.

Parity: torchvision NMS does NOT use the +1 pixel convention, so the IoU
here defaults to ``plus_one=False``; score is objectness only and the
top-``max_det`` (=200) detections survive, exactly like
``non_max_suppression_cpp`` (utils/utils.py:369-373).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from millieye_tpu.ops.boxes import iou_matrix, xywh_to_xyxy

def _class_offset(boxes, valid):
    """torchvision batched_nms's per-call class offset: ``boxes.max()+1``
    over the (valid) candidate boxes, so each class occupies a disjoint
    coordinate region REGARDLESS of box magnitude. A fixed constant
    (4096, "larger than any coordinate") breaks for unclipped decode
    extents — exp(tw) on a large anchor can exceed it at low conf
    thresholds, letting adjacent classes overlap and cross-suppress,
    which the reference never does (torchvision ops/boxes.py
    _batched_nms_coordinate_trick)."""
    mx = jnp.max(jnp.where(valid[:, None], boxes, -jnp.inf))
    return jnp.where(jnp.isfinite(mx), mx, 0.0) + 1.0


def nms_keep_mask_ref(boxes_xyxy, valid, iou_thresh, plus_one=False):
    """Reference greedy NMS (sequential fori_loop) — kept as the golden
    implementation the fast fixpoint version is tested against.

    boxes_xyxy: [K, 4] sorted by descending score; valid: [K] bool.
    """
    k = boxes_xyxy.shape[0]
    iou = iou_matrix(boxes_xyxy, boxes_xyxy, plus_one=plus_one)
    idx = jnp.arange(k)

    def body(i, keep):
        suppress = (iou[i] > iou_thresh) & (idx > i) & keep[i]
        return keep & ~suppress

    return lax.fori_loop(0, k, body, valid)


def nms_keep_mask(boxes_xyxy, valid, iou_thresh, plus_one=False):
    """Greedy NMS keep-mask via fixpoint iteration (exact, fast on TPU).

    Boxes must be sorted by descending score. Define the monotone operator
    F(keep)_i = valid_i AND NOT any_{j<i}(keep_j AND iou(i,j) > t).
    Greedy NMS is the unique fixpoint of F reached from keep=valid along
    the ranking; each application resolves one more level of the
    suppression-chain DAG, so convergence takes chain-depth iterations
    (bounded by K, typically single digits). Each iteration is one
    [K, K] masked reduction on the VPU.
    """
    k = boxes_xyxy.shape[0]
    iou = iou_matrix(boxes_xyxy, boxes_xyxy, plus_one=plus_one)
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    overlap = (iou > iou_thresh) & (col < row)      # j outranks i

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(overlap & keep[None, :], axis=1)
        return new, keep, it + 1

    init = valid & ~jnp.any(overlap & valid[None, :], axis=1)
    keep, _, _ = lax.while_loop(cond, body, (init, valid, jnp.int32(0)))
    return keep


def _compact(rows, keep, max_out):
    """Scatter kept rows (in order) to the front of a [max_out, ...] buffer."""
    rank = jnp.cumsum(keep) - 1
    ok = keep & (rank < max_out)
    dst = jnp.where(ok, rank, max_out)  # out-of-bounds rows are dropped
    out = jnp.zeros((max_out,) + rows.shape[1:], rows.dtype)
    out = out.at[dst].set(rows, mode="drop")
    valid_out = jnp.zeros((max_out,), bool).at[dst].set(ok, mode="drop")
    return out, valid_out


def nms_xyxy(boxes, scores, labels, valid, iou_thresh, max_out, plus_one=False):
    """Class-aware NMS on explicit boxes (e.g. the demo's post-merge pass,
    run_mp.py:320). Inputs [K, ...]; returns (kept [max_out, 6], valid).

    Output rows are (x1, y1, x2, y2, score, label), score-sorted.
    """
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    boxes, s, labels = boxes[order], s[order], labels[order]
    valid = jnp.isfinite(s)
    shifted = boxes + (labels.astype(boxes.dtype)
                       * _class_offset(boxes, valid))[:, None]
    keep = nms_keep_mask(shifted, valid, iou_thresh, plus_one)
    rows = jnp.concatenate(
        [boxes, s[:, None], labels.astype(boxes.dtype)[:, None]], axis=-1
    )
    return _compact(rows, keep, max_out)


@functools.partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "max_det", "pre_top_k",
                     "use_pallas", "use_blocked"),
)
def batched_nms(
    pred,
    conf_thresh,
    iou_thresh=0.5,
    max_det=200,
    pre_top_k=512,
    use_pallas=None,
    use_blocked=None,
):
    """YOLO-decode postprocessing for a batch.

    pred: [B, A, 5+C] rows of (cx, cy, w, h, obj, cls_0..cls_{C-1}) in image
    scale (the YOLO decode output, yolov3/models.py:169-176).

    Returns (detections [B, max_det, 7+C], valid [B, max_det]) where a row is
    (x1, y1, x2, y2, obj_conf, class_score, class_pred, scores_of_C_classes)
    — the ``non_max_suppression_cpp`` output layout (utils/utils.py:349-351).

    ``use_pallas=None`` auto-selects: on TPU the suppression runs as one
    Pallas kernel (ops/nms_pallas.py, IoU matrix VMEM-resident, ~1.6x the
    XLA fixpoint); elsewhere the XLA fixpoint runs. All paths return the
    identical keep set.
    """
    if use_pallas is None:
        # the Pallas kernel holds the [K, K] IoU matrix in VMEM — fine at
        # the serving K=512 (1 MB), not at the untruncated training K
        # (2535 -> 26 MB); large K falls back to the XLA fixpoint.
        # MILLIEYE_NMS_PALLAS=0 forces the (Mosaic-free) XLA fixpoint —
        # a last-resort escape hatch for the bench ladder. Read at TRACE
        # time: flip it only across process/compile boundaries.
        use_pallas = (jax.default_backend() == "tpu"
                      and min(pre_top_k, pred.shape[1]) <= 1024
                      and os.environ.get("MILLIEYE_NMS_PALLAS", "1") != "0")

    def prep(p):
        # ONE [K, 5+C] row gather at the top-k indices; everything the
        # suppression kernel needs (boxes, class offset) is computed on
        # the K gathered rows. Row ASSEMBLY for the [max_det, 7+C]
        # output happens AFTER suppression (late assembly): the old
        # spelling built+scattered [K, 7+C] rows for every candidate,
        # which profiled at ~0.5 ms/b32 — half the NMS block.
        obj = p[:, 4]
        score = jnp.where(obj >= conf_thresh, obj, -jnp.inf)
        top_s, idx = lax.top_k(score, min(pre_top_k, p.shape[0]))
        rows_k = p[idx]                                  # [K, 5+C]
        b = xywh_to_xyxy(rows_k[:, :4])
        v = jnp.isfinite(top_s)
        class_pred = jnp.argmax(rows_k[:, 5:], axis=-1).astype(p.dtype)
        shifted = b + (class_pred * _class_offset(b, v))[:, None]
        return rows_k, b, class_pred, shifted, v

    rows_k, bxyxy, class_pred, shifted, v = jax.vmap(prep)(pred)
    if use_pallas:
        from millieye_tpu.ops.nms_pallas import (
            nms_keep_mask_pallas, nms_keep_mask_pallas_blocked)
        if use_blocked is None:
            # MILLIEYE_NMS_BLOCKED=0 falls back to the chip-proven
            # whole-matrix kernel (the blocked kernel is newer Mosaic
            # surface; trace-time read, like above); callers that must
            # not depend on process env pass use_blocked explicitly
            # (e.g. FusionConfig.nms_use_blocked)
            use_blocked = os.environ.get("MILLIEYE_NMS_BLOCKED",
                                         "1") != "0"
        if shifted.shape[1] % 128 == 0 and use_blocked:
            # block-sequential kernel: same keep set (bit-identical,
            # tests), fixpoint iterations on [128,128] slices instead of
            # the full [K,K] matrix
            keep = nms_keep_mask_pallas_blocked(shifted, v, iou_thresh)
        else:
            keep = nms_keep_mask_pallas(shifted, v, iou_thresh)
    else:
        keep = jax.vmap(
            lambda b, vv: nms_keep_mask(b, vv, iou_thresh, plus_one=False)
        )(shifted, v)

    def assemble(rk, bx, cp, kp):
        # compact the kept CANDIDATE POSITIONS first ([K] int32 scatter),
        # then gather + assemble only the max_det surviving rows
        rank = jnp.cumsum(kp) - 1
        ok = kp & (rank < max_det)
        dst = jnp.where(ok, rank, max_det)               # OOB rows drop
        sel = jnp.zeros((max_det,), jnp.int32).at[dst].set(
            jnp.arange(kp.shape[0]), mode="drop")
        valid_out = jnp.zeros((max_det,), bool).at[dst].set(ok, mode="drop")
        rd = rk[sel]                                     # [max_det, 5+C]
        c = rd[:, 5:]
        out = jnp.concatenate(
            [bx[sel], rd[:, 4:5], c.max(axis=-1)[:, None], cp[sel][:, None],
             c], axis=-1)
        # invalid rows gathered row sel=0's data: zero them (the compact
        # scatter left them zero)
        out = jnp.where(valid_out[:, None], out, 0.0)
        return out, valid_out

    return jax.vmap(assemble)(rows_k, bxyxy, class_pred, keep)


@functools.partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "max_det", "pre_top_k"),
)
def pre_top_k_sufficient(pred, conf_thresh, iou_thresh=0.5, max_det=200,
                         pre_top_k=512):
    """[B] bool: whether truncating to the top ``pre_top_k`` objectness
    rows provably leaves ``batched_nms``'s final top-``max_det`` output
    unchanged vs running NMS on ALL conf-passing rows (the reference
    applies no pre-top-k, utils/utils.py:337-378).

    Greedy suppression flows only from higher- to lower-ranked rows, so
    a truncated row can never suppress a surviving one; truncation is
    exact iff (a) at most ``pre_top_k`` rows pass the confidence filter,
    or (b) at least ``max_det`` of the top ``pre_top_k`` rows survive
    suppression (every later row would rank below the cut anyway).
    Diagnostic for picking ``FusionConfig.pre_nms_top_k`` at a given
    operating point (e.g. the stage-3 training ``conf_thresh=0.01``,
    module3 train.py:106-107) — not part of the serving graph.
    """
    def one(p):
        obj = p[:, 4]
        n_pass = jnp.sum(obj >= conf_thresh)
        score = jnp.where(obj >= conf_thresh, obj, -jnp.inf)
        k = min(pre_top_k, p.shape[0])
        top_s, idx = lax.top_k(score, k)
        v = jnp.isfinite(top_s)
        cls = p[:, 5:][idx]
        class_pred = jnp.argmax(cls, axis=-1).astype(p.dtype)
        bx = xywh_to_xyxy(p[:, :4][idx])
        shifted = bx + (class_pred * _class_offset(bx, v))[:, None]
        keep = nms_keep_mask(shifted, v, iou_thresh, plus_one=False)
        return (n_pass <= k) | (jnp.sum(keep) >= max_det)

    return jax.vmap(one)(pred)
