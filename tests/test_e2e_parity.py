"""END-TO-END parity: the full RefineNetwork ("module2") pipeline vs an
independent torch+numpy composition at identical weights.

Per-component parity exists elsewhere (test_darknet, test_torch_parity,
test_roi_align, test_nms); this test catches INTEGRATION bugs — stage
ordering, row layouts, coordinate/scale handoffs — by rebuilding the whole
chain backbone -> decode -> conf-filter/top-k -> class-aware NMS ->
fcn score map -> PSRoIAlign -> refinement -> ensemble -> regression out
of torch primitives and the looped numpy kernel references, then demanding
the same final detections.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))

from test_darknet import torch_forward
from test_roi_align import np_ps_roi_align

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, RefineNetwork

S = 64
CONF_T, NMS_T, MAX_DET, PRE_K = 0.05, 0.5, 16, 64


def np_greedy_nms(xyxy, iou_t):
    k = len(xyxy)
    keep = np.ones(k, bool)
    for i in range(k):
        if not keep[i]:
            continue
        for j in range(i + 1, k):
            if not keep[j]:
                continue
            ix1 = max(xyxy[i, 0], xyxy[j, 0])
            iy1 = max(xyxy[i, 1], xyxy[j, 1])
            ix2 = min(xyxy[i, 2], xyxy[j, 2])
            iy2 = min(xyxy[i, 3], xyxy[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a = ((xyxy[i, 2] - xyxy[i, 0]) * (xyxy[i, 3] - xyxy[i, 1])
                 + (xyxy[j, 2] - xyxy[j, 0]) * (xyxy[j, 3] - xyxy[j, 1]))
            if inter / (a - inter + 1e-16) > iou_t:
                keep[j] = False
    return keep


def np_batched_nms_rows(det):
    """det [A, 5+C] decode rows -> kept rows [n, 7+C], reference
    non_max_suppression_cpp semantics."""
    obj = det[:, 4]
    order = np.argsort(-np.where(obj >= CONF_T, obj, -np.inf),
                       kind="stable")[:PRE_K]
    order = order[obj[order] >= CONF_T]
    d = det[order]
    cxcywh = d[:, :4]
    xyxy = np.stack([cxcywh[:, 0] - cxcywh[:, 2] / 2,
                     cxcywh[:, 1] - cxcywh[:, 3] / 2,
                     cxcywh[:, 0] + cxcywh[:, 2] / 2,
                     cxcywh[:, 1] + cxcywh[:, 3] / 2], -1)
    cls = d[:, 5:]
    cp = cls.argmax(-1).astype(np.float64)
    cs = cls.max(-1)
    # torchvision's class offset: boxes.max() + 1 over the candidates
    off = (xyxy.max() + 1.0) if len(xyxy) else 1.0
    keep = np_greedy_nms(xyxy + cp[:, None] * off, NMS_T)
    rows = np.concatenate(
        [xyxy, d[:, 4:5], cs[:, None], cp[:, None], cls], -1)[keep]
    return rows[:MAX_DET]


def t2n(t):
    return t.detach().numpy()


def test_refine_network_full_pipeline_parity(rng):
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = RefineNetwork(darknet, FusionConfig(
        conf_thresh=CONF_T, nms_thresh=NMS_T, class_num=12,
        max_det=MAX_DET, pre_nms_top_k=PRE_K, loss_variant="module2"))
    params, state = model.init(jax.random.PRNGKey(0))
    # non-trivial BN running stats in the backbone
    dstate = [{k: v + 0.05 for k, v in s.items()} for s in state["darknet"]]
    state = dict(state, darknet=dstate)

    img = rng.uniform(size=(1, S, S, 3)).astype(np.float32)

    # ---------------- JAX: one compiled pipeline
    out = model.apply(params, state, jnp.asarray(img))
    jb = np.asarray(out["boxes"][0])
    jv = np.asarray(out["valid"][0])

    # ---------------- independent torch+numpy composition
    x = torch.tensor(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        outputs, dets = torch_forward(darknet, params["darknet"], dstate, x)
    det_rows = np_batched_nms_rows(t2n(dets)[0].astype(np.float64))
    n = len(det_rows)
    assert n > 0, "no detections survived — fixture broken"

    # fcn score map: conv1x1 + BN(eval) + leaky on the feature tap
    tap = outputs[darknet.feature_tap]                  # [1, 256, g, g]
    p = params["fcn"][0]
    w = torch.tensor(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    with torch.no_grad():
        y = tF.conv2d(tap, w, torch.tensor(np.asarray(p["b"])))
        mean = torch.tensor(np.asarray(state["fcn"][0]["mean"]))
        var = torch.tensor(np.asarray(state["fcn"][0]["var"]))
        y = (y - mean[None, :, None, None]) / torch.sqrt(
            var[None, :, None, None] + 1e-5)
        y = y * torch.tensor(np.asarray(p["bn"]["gamma"]))[None, :, None,
                                                           None] \
            + torch.tensor(np.asarray(p["bn"]["beta"]))[None, :, None, None]
        score_map = tF.leaky_relu(y, 0.1)
    score_nhwc = t2n(score_map).transpose(0, 2, 3, 1).astype(np.float64)

    rois = np.concatenate(
        [np.zeros((n, 1)), det_rows[:, :4]], -1)
    crops = np_ps_roi_align(score_nhwc, rois, (7, 7), 1.0 / 16)  # [n,7,7,10]

    # refinement head (no radar, eval: no dropout)
    flat = crops.transpose(0, 3, 1, 2).reshape(n, -1)
    w0 = np.asarray(params["refine"]["net0"]["w"], np.float64)
    b0 = np.asarray(params["refine"]["net0"]["b"], np.float64)
    t = flat @ w0 + b0
    t = np.where(t > 0, t, 0.1 * t)
    reg = t @ np.asarray(params["refine"]["net1"]["w"], np.float64) \
        + np.asarray(params["refine"]["net1"]["b"], np.float64)
    vec = 1 / (1 + np.exp(-(t @ np.asarray(params["refine"]["net2"]["w"],
                                           np.float64)
                            + np.asarray(params["refine"]["net2"]["b"],
                                         np.float64))))

    # ensemble head (module2: fc2 has a LeakyReLU)
    yolo_vec = np.concatenate([det_rows[:, 4:5], det_rows[:, 7:]], -1)
    stack = np.stack([vec, yolo_vec], -1)               # [n, 13, 2]
    h = stack @ np.asarray(params["ensemble"]["fc1"]["w"], np.float64) \
        + np.asarray(params["ensemble"]["fc1"]["b"], np.float64)
    h = np.where(h > 0, h, 0.1 * h).reshape(n, -1)
    e = h @ np.asarray(params["ensemble"]["fc2"]["w"], np.float64) \
        + np.asarray(params["ensemble"]["fc2"]["b"], np.float64)
    e = np.where(e > 0, e, 0.1 * e)
    e = np.exp(e - e.max(-1, keepdims=True))
    masks = e / e.sum(-1, keepdims=True)
    fg = masks[:, 1]

    # regression (dx*w+x, exp-clamped dw*w) on the pre-NMS boxes
    xyxy = det_rows[:, :4]
    cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
    cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
    bw = xyxy[:, 2] - xyxy[:, 0]
    bh = xyxy[:, 3] - xyxy[:, 1]
    cxr = reg[:, 0] * bw + cx
    cyr = reg[:, 1] * bh + cy
    bwr = np.exp(np.clip(reg[:, 2], -20, 20)) * bw
    bhr = np.exp(np.clip(reg[:, 3], -20, 20)) * bh
    ref_boxes = np.stack([cxr - bwr / 2, cyr - bhr / 2,
                          cxr + bwr / 2, cyr + bhr / 2], -1)

    # positive = fg > 0 (threshold 0), sorted by fg descending
    pos = fg > 0.0
    order = np.argsort(-np.where(pos, fg, -np.inf), kind="stable")
    order = order[pos[order]]
    want = np.concatenate(
        [ref_boxes, fg[:, None], det_rows[:, 5:6], det_rows[:, 6:7]],
        -1)[order]

    got = jb[jv]
    assert len(got) == len(want), (len(got), len(want))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fusion_network_full_pipeline_parity(rng):
    """Same exercise for the module3 FusionNetwork: adds the radar
    encoder, radar RoIAlign, radar_net confidence fusion, image+radar
    proposal aggregation and the conf/5 priority sort."""
    from test_roi_align import np_roi_align
    from millieye_tpu.models.fusion import FusionNetwork

    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    # class filter keeps the class random weights collapse onto (the fused
    # class is 0 with real weights; any fixed class exercises the path)
    model0 = FusionNetwork(darknet, FusionConfig(
        conf_thresh=CONF_T, nms_thresh=NMS_T, max_det=MAX_DET,
        pre_nms_top_k=PRE_K))
    params, state = model0.init(jax.random.PRNGKey(0))
    img = rng.uniform(size=(1, S, S, 3)).astype(np.float32)
    d_out = darknet.apply(params["darknet"], state["darknet"],
                          jnp.asarray(img))
    det_all = np.asarray(d_out["detections"][0])
    kept = np_batched_nms_rows(det_all.astype(np.float64))
    dominant = int(np.bincount(kept[:, 6].astype(int), minlength=12).argmax())

    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=CONF_T, nms_thresh=NMS_T, max_det=MAX_DET,
        pre_nms_top_k=PRE_K, max_radar=3, class_idx=dominant))

    maps = rng.uniform(size=(1, S // 16, S // 16, 3)).astype(np.float32)
    rb = np.array([[[0.1, 0.1, 0.45, 0.5],
                    [0.5, 0.4, 0.9, 0.85],
                    [0.0, 0.0, 0.0, 0.0]]], np.float32)
    rmask = np.array([[True, True, False]])

    # ---------------- JAX
    out = model.apply(params, state, jnp.asarray(img), jnp.asarray(maps),
                      jnp.asarray(rb), jnp.asarray(rmask), mode=0)
    jb = np.asarray(out["boxes"][0])
    jv = np.asarray(out["valid"][0])

    # ---------------- torch+numpy composition
    x = torch.tensor(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        outputs, dets = torch_forward(darknet, params["darknet"],
                                      state["darknet"], x)
    det_rows = np_batched_nms_rows(t2n(dets)[0].astype(np.float64))
    det_rows = det_rows[det_rows[:, 6].astype(int) == dominant]
    n_img = len(det_rows)
    assert n_img > 0

    # img score map (img_cnn stack)
    tap = outputs[darknet.feature_tap]
    p = params["img_cnn"][0]
    w = torch.tensor(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    with torch.no_grad():
        y = tF.conv2d(tap, w, torch.tensor(np.asarray(p["b"])))
        mean = torch.tensor(np.asarray(state["img_cnn"][0]["mean"]))
        var = torch.tensor(np.asarray(state["img_cnn"][0]["var"]))
        y = (y - mean[None, :, None, None]) / torch.sqrt(
            var[None, :, None, None] + 1e-5)
        y = y * torch.tensor(np.asarray(p["bn"]["gamma"]))[None, :, None,
                                                           None] \
            + torch.tensor(np.asarray(p["bn"]["beta"]))[None, :, None, None]
        score_map = tF.leaky_relu(y, 0.1)
    score_nhwc = t2n(score_map).transpose(0, 2, 3, 1).astype(np.float64)

    # radar score map (radar encoder mirror)
    h = torch.tensor(maps.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for i in range(3):
            lp = params["radar_enc"][i]
            lw = torch.tensor(np.transpose(np.asarray(lp["w"]), (3, 2, 0, 1)))
            h = tF.conv2d(h, lw, torch.tensor(np.asarray(lp["b"])),
                          padding=1)
            mean = torch.tensor(np.asarray(state["radar_enc"][i]["mean"]))
            var = torch.tensor(np.asarray(state["radar_enc"][i]["var"]))
            h = (h - mean[None, :, None, None]) / torch.sqrt(
                var[None, :, None, None] + 1e-5)
            h = h * torch.tensor(
                np.asarray(params["radar_enc"][i]["bn"]["gamma"])
            )[None, :, None, None] + torch.tensor(
                np.asarray(params["radar_enc"][i]["bn"]["beta"])
            )[None, :, None, None]
            h = tF.leaky_relu(h, 0.1)
        fp = params["radar_enc"][3]
        fw = torch.tensor(np.transpose(np.asarray(fp["w"]), (3, 2, 0, 1)))
        h = torch.sigmoid(tF.conv2d(h, fw, torch.tensor(np.asarray(fp["b"]))))
    radar_nhwc = t2n(h).transpose(0, 2, 3, 1).astype(np.float64)

    # aggregate proposals: image rows then the 2 valid radar rows
    radar_xyxy = rb[0, :2].astype(np.float64) * S
    all_xyxy = np.concatenate([det_rows[:, :4], radar_xyxy], 0)
    n_all = len(all_xyxy)
    rois = np.concatenate([np.zeros((n_all, 1)), all_xyxy], -1)

    img_crops = np_ps_roi_align(score_nhwc, rois, (7, 7), 1.0 / 16)
    radar_crops = np_roi_align(radar_nhwc, rois, (7, 7), 1.0 / 16)

    # refinement head with radar fusion
    flat = img_crops.transpose(0, 3, 1, 2).reshape(n_all, -1)
    t = flat @ np.asarray(params["refine"]["net0"]["w"], np.float64) \
        + np.asarray(params["refine"]["net0"]["b"], np.float64)
    t = np.where(t > 0, t, 0.1 * t)
    reg = t @ np.asarray(params["refine"]["net1"]["w"], np.float64) \
        + np.asarray(params["refine"]["net1"]["b"], np.float64)
    vec = 1 / (1 + np.exp(-(t @ np.asarray(params["refine"]["net2"]["w"],
                                           np.float64)
                            + np.asarray(params["refine"]["net2"]["b"],
                                         np.float64))))
    rn = params["refine"]["radar_net"]
    with torch.no_grad():
        rc = torch.tensor(radar_crops.transpose(0, 3, 1, 2),
                          dtype=torch.float32)
        r7 = tF.conv2d(rc, torch.tensor(np.transpose(
            np.asarray(rn["conv7"]["w"]), (3, 2, 0, 1))),
            torch.tensor(np.asarray(rn["conv7"]["b"])))
        mean = torch.tensor(np.asarray(state["refine"]["radar_net"]["mean"]))
        var = torch.tensor(np.asarray(state["refine"]["radar_net"]["var"]))
        r7 = (r7 - mean[None, :, None, None]) / torch.sqrt(
            var[None, :, None, None] + 1e-5)
        r7 = r7 * torch.tensor(np.asarray(rn["bn"]["gamma"]))[None, :, None,
                                                              None] \
            + torch.tensor(np.asarray(rn["bn"]["beta"]))[None, :, None, None]
        r7 = tF.leaky_relu(r7, 0.1)
        r1 = tF.conv2d(r7, torch.tensor(np.transpose(
            np.asarray(rn["conv1"]["w"]), (3, 2, 0, 1))),
            torch.tensor(np.asarray(rn["conv1"]["b"])))
        radar_conf = torch.sigmoid(r1.reshape(n_all, 1))
    conf = 1 / (1 + np.exp(-(t2n(radar_conf).astype(np.float64)
                             + vec[:, :1])))

    # ensemble over image rows only (class_num=1 -> width-2 vectors)
    refinement_vec = np.concatenate([conf, vec[:, 1:2]], -1)
    yolo_vec = np.concatenate(
        [det_rows[:, 4:5], det_rows[:, 7:8]], -1)       # conf + class-0 score
    stack = np.stack([refinement_vec[:n_img], yolo_vec], -1)
    hh = stack @ np.asarray(params["ensemble"]["fc1"]["w"], np.float64) \
        + np.asarray(params["ensemble"]["fc1"]["b"], np.float64)
    hh = np.where(hh > 0, hh, 0.1 * hh).reshape(n_img, -1)
    e = hh @ np.asarray(params["ensemble"]["fc2"]["w"], np.float64) \
        + np.asarray(params["ensemble"]["fc2"]["b"], np.float64)
    e = np.exp(e - e.max(-1, keepdims=True))
    masks = e / e.sum(-1, keepdims=True)
    fg = np.concatenate([masks[:, 0], conf[n_img:, 0]])

    # regression + priority sort (radar priority / 5)
    cx = (all_xyxy[:, 0] + all_xyxy[:, 2]) / 2
    cy = (all_xyxy[:, 1] + all_xyxy[:, 3]) / 2
    bw = all_xyxy[:, 2] - all_xyxy[:, 0]
    bh = all_xyxy[:, 3] - all_xyxy[:, 1]
    cxr = reg[:, 0] * bw + cx
    cyr = reg[:, 1] * bh + cy
    bwr = np.exp(np.clip(reg[:, 2], -20, 20)) * bw
    bhr = np.exp(np.clip(reg[:, 3], -20, 20)) * bh
    ref_boxes = np.stack([cxr - bwr / 2, cyr - bhr / 2,
                          cxr + bwr / 2, cyr + bhr / 2], -1)
    # radar rows: reference output col 6 = radar_boxes col 6
    # = refinement_vector[:, 1] (class score), my_models.py:500-507 — NOT
    # the fused confidence column
    class_score = np.concatenate([det_rows[:, 5], vec[n_img:, 1]])
    class_pred = np.concatenate([det_rows[:, 6], np.zeros(n_all - n_img)])
    prio = fg * np.concatenate([np.ones(n_img),
                                np.full(n_all - n_img, 1 / 5)])
    pos = fg > 0.0
    order = np.argsort(-np.where(pos, prio, -np.inf), kind="stable")
    order = order[pos[order]]
    want = np.concatenate(
        [ref_boxes, fg[:, None], class_score[:, None],
         class_pred[:, None]], -1)[order]

    got = jb[jv]
    assert len(got) == len(want), (len(got), len(want))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
