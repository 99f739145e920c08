"""Does stage-3 training LEARN, not just run?

Synthetic but learnable task: every image has one true object whose radar
heatmap is hot inside the box, plus one decoy radar proposal over a cold
region. The radar branch (radar_net over RoI-cropped radar features) can
solve this perfectly; training should (a) drive the conf loss down and
(b) separate refined confidence of true vs decoy radar proposals — the
exact mechanism milliEye's stage 3 exists for.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.train import frozen_adam, STAGE3_FROZEN
from millieye_tpu.train.steps import init_train_state, make_fusion_train_step

S = 128


def make_batch(rng, b=8):
    images = rng.uniform(0.0, 0.2, size=(b, S, S, 3)).astype(np.float32)
    maps = np.zeros((b, S // 16, S // 16, 3), np.float32)
    radar_boxes = np.zeros((b, 4, 4), np.float32)
    rmask = np.zeros((b, 4), bool)
    targets = np.zeros((b, 2, 5), np.float32)
    tmask = np.zeros((b, 2), bool)
    g = S // 16
    for i in range(b):
        # true object: box + hot radar cells inside it
        cx, cy = rng.uniform(0.3, 0.7, 2)
        w = h = 0.25
        targets[i, 0] = (0, cx, cy, w, h)
        tmask[i, 0] = True
        radar_boxes[i, 0] = (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)
        rmask[i, 0] = True
        x0, x1 = int((cx - w / 2) * g), int(np.ceil((cx + w / 2) * g))
        y0, y1 = int((cy - h / 2) * g), int(np.ceil((cy + h / 2) * g))
        maps[i, y0:y1, x0:x1, :] = rng.uniform(0.6, 1.0,
                                               (y1 - y0, x1 - x0, 3))
        # decoy proposal in an empty corner (cold radar)
        dx = 0.05 if cx > 0.5 else 0.7
        radar_boxes[i, 1] = (dx, 0.05, dx + 0.25, 0.3)
        rmask[i, 1] = True
    return {"images": images, "radar_maps": maps,
            "radar_boxes": radar_boxes, "rmask": rmask,
            "targets": targets, "tmask": tmask}


@pytest.mark.slow
def test_stage3_radar_branch_learns(rng):
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=8, max_radar=4, pre_nms_top_k=32))
    params, state = model.init(jax.random.PRNGKey(0))
    tx = frozen_adam(params, lr=3e-3, frozen_prefixes=STAGE3_FROZEN)
    ts = init_train_state(params, state, tx)
    step = jax.jit(make_fusion_train_step(model, tx))

    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(60):
        batch = make_batch(rng)
        key, sub = jax.random.split(key)
        ts, metrics = step(ts, batch, sub)
        losses.append(float(metrics["conf_loss"]))

    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)

    # refined radar confidence separates true vs decoy proposals
    batch = make_batch(rng)
    out = model.apply(ts.params, ts.state,
                      jnp.asarray(batch["images"]),
                      jnp.asarray(batch["radar_maps"]),
                      jnp.asarray(batch["radar_boxes"]),
                      jnp.asarray(batch["rmask"]), mode=2)
    boxes, valid = np.asarray(out["boxes"]), np.asarray(out["valid"])
    # mode 2 keeps only radar rows, priority-sorted by refined conf/5;
    # recover per-proposal confidences by matching coordinates
    k_img = out["num_img"]
    true_conf, decoy_conf = [], []
    for i in range(len(boxes)):
        for row, ok in zip(boxes[i], valid[i]):
            if not ok:
                continue
            xyxy = row[:4] / S
            if abs(xyxy[0] - batch["radar_boxes"][i, 0, 0]) < 1e-3:
                true_conf.append(row[4])
            elif abs(xyxy[0] - batch["radar_boxes"][i, 1, 0]) < 1e-3:
                decoy_conf.append(row[4])
    assert true_conf, "true proposals vanished from mode-2 output"
    if decoy_conf:
        assert np.mean(true_conf) > np.mean(decoy_conf) + 0.05, (
            np.mean(true_conf), np.mean(decoy_conf))
