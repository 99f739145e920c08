"""Evaluation harnesses: the reference's three mAP scripts as library calls.

* ``evaluate_yolo``    — raw Darknet + NMS (stage-1 check,
                         module2_mixed/test_mixed.py:23-97)
* ``evaluate_refine``  — YOLO + refinement (module2_mixed/
                         test_module2.py:25-96)
* ``evaluate_fusion``  — full radar fusion with per-mode / per-illumination
                         slicing and auto mode selection
                         (module3_our_dataset/test_fusion.py:24-115)

Each takes an iterable of collated batches (data.loader.DataLoader), runs
ONE jit-compiled padded-forward per batch, unpads at the host boundary and
feeds the numpy mAP engine (eval/metrics.py). Returns
(precision, recall, AP, f1, classes) per class plus the global PR curve —
the ``ap_per_class`` contract.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from millieye_tpu.eval.metrics import get_batch_statistics, ap_per_class
from millieye_tpu.ops.nms import batched_nms


def _unpad(boxes, valid, n=None):
    """[B, K, 7] + [B, K] -> list of [n_i, 7] numpy arrays (None if empty).

    ``n`` trims a tail batch that was padded to the fixed batch shape by
    repeating rows (DeviceCache loader, ``batch["_n"]``) — without it the
    duplicated samples would be double-counted in mAP."""
    boxes, valid = np.asarray(boxes), np.asarray(valid)
    if n is not None:
        boxes, valid = boxes[:n], valid[:n]
    out = []
    for b, v in zip(boxes, valid):
        out.append(b[v] if v.any() else None)
    return out


def _batch_n(batch):
    return int(batch.get("_n", np.shape(batch["tmask"])[0]))


def _targets_to_eval(targets, tmask, img_size):
    """[B, T, 5] (class, cx, cy, w, h in 0..1) -> [m, 6]
    (image_i, class, x1, y1, x2, y2) in image scale (test_fusion.py:94-99)."""
    rows = []
    targets, tmask = np.asarray(targets), np.asarray(tmask)
    for i, (t, m) in enumerate(zip(targets, tmask)):
        t = t[m]
        if not len(t):
            continue
        cx, cy, w, h = t[:, 1], t[:, 2], t[:, 3], t[:, 4]
        xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                        -1) * img_size
        rows.append(np.concatenate(
            [np.full((len(t), 1), i), t[:, :1], xyxy], -1))
    return np.concatenate(rows, 0) if rows else np.zeros((0, 6))


def _finish(stats, all_target_cls):
    if not stats:
        return None
    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pred = np.concatenate([s[2] for s in stats])
    return ap_per_class(tp, conf, pred, all_target_cls)


def evaluate_yolo(darknet, params, state, batches, conf_thresh=0.5,
                  nms_thresh=0.5, iou_thresh=0.5, max_det=200):
    """Stage-1: backbone + decode + NMS only (test_mixed.py path).

    params/state are jit ARGUMENTS, not closure constants: closure
    capture bakes the weights into the HLO, so every checkpoint/variant
    evaluated forces a fresh remote compile (minutes through the axon
    tunnel) instead of a persistent-cache hit."""

    @jax.jit
    def step(params, state, images):
        out = darknet.apply(params, state, images)
        det, valid = batched_nms(out["detections"], conf_thresh, nms_thresh,
                                 max_det=max_det)
        return det[:, :, :7], valid

    stats, target_cls = [], []
    for batch in batches:
        images = jnp.asarray(batch["images"])
        n = _batch_n(batch)
        det, valid = step(params, state, images)
        targets = _targets_to_eval(np.asarray(batch["targets"])[:n],
                                   np.asarray(batch["tmask"])[:n],
                                   images.shape[1])
        target_cls.extend(targets[:, 1].tolist())
        stats.extend(get_batch_statistics(_unpad(det, valid, n), targets,
                                          iou_thresh))
    return _finish(stats, target_cls)


def evaluate_refine(model, params, state, batches, iou_thresh=0.5):
    """Stage-2: YOLO + refinement + ensemble (test_module2.py path)."""

    @jax.jit
    def step(params, state, images):
        out = model.apply(params, state, images)
        return out["boxes"], out["valid"]

    stats, target_cls = [], []
    for batch in batches:
        images = jnp.asarray(batch["images"])
        n = _batch_n(batch)
        boxes, valid = step(params, state, images)
        targets = _targets_to_eval(np.asarray(batch["targets"])[:n],
                                   np.asarray(batch["tmask"])[:n],
                                   images.shape[1])
        target_cls.extend(targets[:, 1].tolist())
        stats.extend(get_batch_statistics(_unpad(boxes, valid, n), targets,
                                          iou_thresh))
    return _finish(stats, target_cls)


def auto_mode(images, brightness=None):
    """mode 3 selection: dark frames -> millieye, bright -> yolo
    (test_fusion.py:24-32: img.mean() < 0.1).

    ``brightness``: host-side batch mean (collate/DeviceCache provide it)
    — preferred, since ``jnp.mean`` + fetch costs a host<->device relay
    switch (~40 ms) per batch."""
    if brightness is None:
        brightness = float(jnp.mean(images))
    return 0 if brightness < 0.1 else 1


def evaluate_fusion(model, params, state, batches, mode=0, iou_thresh=0.5,
                    mesh=None):
    """Stage-3 full fusion. ``mode``: 0 millieye / 1 yolo / 2 radar /
    3 auto (per-batch selection).

    ``mesh``: optional ``jax.sharding.Mesh`` — batches are sharded over
    its "data" axis (params replicated) so evaluation scales across
    chips; batch size must divide the data-axis size.
    """
    if mesh is not None:
        from millieye_tpu.parallel import batch_sharding, replicated
        b_sh, r_sh = batch_sharding(mesh), replicated(mesh)
        params = jax.tree.map(lambda x: jax.device_put(x, r_sh), params)
        state = jax.tree.map(lambda x: jax.device_put(x, r_sh), state)

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, b_sh) if mesh is not None else x

    @functools.partial(jax.jit, static_argnums=(6,))
    def step(params, state, images, maps, rb, rmask, m):
        out = model.apply(params, state, images, maps, rb, rmask, mode=m)
        return out["boxes"], out["valid"]

    stats, target_cls = [], []
    for batch in batches:
        images = put(batch["images"])
        n = _batch_n(batch)
        m = (auto_mode(images, batch.get("brightness"))
             if mode == 3 else mode)
        boxes, valid = step(params, state, images,
                            put(batch["radar_maps"]),
                            put(batch["radar_boxes"]),
                            put(batch["rmask"]), m)
        targets = _targets_to_eval(np.asarray(batch["targets"])[:n],
                                   np.asarray(batch["tmask"])[:n],
                                   images.shape[1])
        target_cls.extend(targets[:, 1].tolist())
        stats.extend(get_batch_statistics(_unpad(boxes, valid, n), targets,
                                          iou_thresh))
    return _finish(stats, target_cls)


def summarize(result, class_names=None):
    """ap_per_class output -> printable per-class table + mAP
    (train.py:268-271 AsciiTable equivalent)."""
    if result is None:
        return "no detections", 0.0
    p, r, ap, f1, classes = result[:5]
    lines = ["cls     name            AP      P       R       F1"]
    for i, c in enumerate(classes):
        name = (class_names[int(c)] if class_names
                and int(c) < len(class_names) else str(int(c)))
        lines.append(f"{int(c):<7d} {name:<15s} {ap[i]:.4f}  {p[i]:.4f}  "
                     f"{r[i]:.4f}  {f1[i]:.4f}")
    m_ap = float(np.mean(ap)) if len(ap) else 0.0
    lines.append(f"mAP: {m_ap:.4f}")
    return "\n".join(lines), m_ap


def save_pr_curve(result, path, title="PR curve"):
    """Write the global PR-curve artifact (test_fusion.py:195-208 /
    test_module2.py:168-187 equivalent). Returns the path or None."""
    if result is None:
        return None
    curve = result[5]
    if not hasattr(curve[0], "__len__"):
        return None
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    precision, recall = curve
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(recall, precision)
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.05)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
