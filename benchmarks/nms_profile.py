"""Decompose the ~0.9 ms/b32 NMS slice of the fusion graph.

The b32 attribution (fusion_profile.py: backbone_nms - backbone) charges
~935 us to ``batched_nms`` — with the RoI crops now VMEM-resident it is
the second-largest non-conv slice. This probe splits it on-chip:

    topk       lax.top_k(score, 512) over [B, 2535]
    prep       vmap'd top_k + row gathers + class argmax/shift (nms.py:153)
    keepmask   prep + the Pallas suppression kernel
    full       batched_nms (prep + keep + compact scatter)

Differences attribute device time to the gather/argmax prep, the
suppression fixpoint, and the compact scatter. Run on the real chip:

    python benchmarks/nms_profile.py

Appends nms_profile_* rows to BENCH_DETAILS.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import __graft_entry__ as g  # noqa: F401  (compile cache)
from benchmarks.backbone_profile import bench_scanned
from millieye_tpu.ops.boxes import xywh_to_xyxy
from millieye_tpu.ops.nms import batched_nms, _class_offset

B, A, C = 32, 2535, 12
CONF, IOU, MAX_DET, PRE_K = 0.2, 0.5, 200, 512


def make_pred(rng):
    """YOLO-decode-shaped rows: most anchors below conf, a few hundred
    above (the serving operating point)."""
    p = np.zeros((B, A, 5 + C), np.float32)
    cxy = rng.uniform(0, 416, (B, A, 2))
    wh = rng.uniform(8, 120, (B, A, 2))
    p[..., 0:2], p[..., 2:4] = cxy, wh
    obj = rng.uniform(0, 0.15, (B, A))
    hot = rng.random((B, A)) < (400 / A)          # ~400 pass conf=0.2
    obj[hot] = rng.uniform(0.2, 1.0, hot.sum())
    p[..., 4] = obj
    p[..., 5:] = rng.dirichlet(np.ones(C), (B, A))
    return jnp.asarray(p)


def prep_one(p):
    xyxy = xywh_to_xyxy(p[:, :4])
    obj = p[:, 4]
    cls = p[:, 5:]
    score = jnp.where(obj >= CONF, obj, -jnp.inf)
    top_s, idx = lax.top_k(score, PRE_K)
    b = xyxy[idx]
    c = cls[idx]
    o = obj[idx]
    v = jnp.isfinite(top_s)
    class_score = c.max(axis=-1)
    class_pred = jnp.argmax(c, axis=-1).astype(p.dtype)
    shifted = b + (class_pred * _class_offset(b, v))[:, None]
    rows = jnp.concatenate([b, o[:, None], class_score[:, None],
                            class_pred[:, None], c], axis=-1)
    return rows, shifted, v


def prep_new_one(p):
    """The round-4 batched_nms prep (ops/nms.py): ONE [K, 5+C] row
    gather; row assembly deferred to after suppression."""
    obj = p[:, 4]
    score = jnp.where(obj >= CONF, obj, -jnp.inf)
    top_s, idx = lax.top_k(score, PRE_K)
    rows_k = p[idx]
    b = xywh_to_xyxy(rows_k[:, :4])
    v = jnp.isfinite(top_s)
    class_pred = jnp.argmax(rows_k[:, 5:], axis=-1).astype(p.dtype)
    shifted = b + (class_pred * _class_offset(b, v))[:, None]
    return rows_k, shifted, v


def main():
    pred = make_pred(np.random.default_rng(0))

    def topk(p):
        score = jnp.where(p[..., 4] >= CONF, p[..., 4], -jnp.inf)
        return lax.top_k(score, PRE_K)[0]

    def prep(p):
        # round-3 spelling kept for the before/after record: full-row
        # assembly for EVERY candidate before suppression
        rows, shifted, v = jax.vmap(prep_one)(p)
        return rows.sum() + shifted.sum()

    def prep_new(p):
        rows, shifted, v = jax.vmap(prep_new_one)(p)
        return rows.sum() + shifted.sum()

    def keepmask(p):
        from millieye_tpu.ops.nms_pallas import nms_keep_mask_pallas
        rows, shifted, v = jax.vmap(prep_new_one)(p)
        keep = nms_keep_mask_pallas(shifted, v, IOU)
        return keep.sum() + rows.sum()

    def full(p):
        det, valid = batched_nms(p, CONF, IOU, max_det=MAX_DET,
                                 pre_top_k=PRE_K)
        return det.sum()

    def full_k256(p):
        det, valid = batched_nms(p, CONF, IOU, max_det=MAX_DET,
                                 pre_top_k=256)
        return det.sum()

    def full_blocked(p):
        det, valid = batched_nms(p, CONF, IOU, max_det=MAX_DET,
                                 pre_top_k=PRE_K, use_blocked=True)
        return det.sum()

    def full_xla(p):
        det, valid = batched_nms(p, CONF, IOU, max_det=MAX_DET,
                                 pre_top_k=PRE_K, use_pallas=False)
        return det.sum()

    # NOTE on attribution: each row times a WHOLE graph; "prefix" rows
    # (topk/prep/keepmask) are separate programs whose DCE/fusion can
    # differ from the full graph, so the slices need not add up exactly
    # (the round-3 record's prep+keepmask > full). Deltas between FULL
    # variants (full vs full_k256/full_blocked/full_xla) are the
    # decision-grade numbers; prefix rows are directional only.
    results = {}
    for name, fn in (("topk", topk), ("prep", prep),
                     ("prep_new", prep_new), ("keepmask", keepmask),
                     ("full", full), ("full_k256", full_k256),
                     ("full_blocked", full_blocked),
                     ("full_xla", full_xla)):
        t = bench_scanned(fn, pred, k=20)
        key = f"nms_profile_b{B}_{name}_us"
        results[key] = round(t * 1e6, 1)
        print(f"{key}: {results[key]}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
