"""Checkpoint-parity harness: reference ``.pth`` -> box-for-box diff.

The one externally-blocked acceptance is trained-checkpoint mAP parity
(the released module3 weights live behind a OneDrive link,
``/root/reference/README.md:68``). This harness is ready to fire the
moment a checkpoint is available — and is CI-tested end-to-end today
with a randomly-initialized state dict in the exact reference schema:

1. the ``.pth`` is loaded into the JAX FusionNetwork through
   ``io/torch_ckpt.fill_fusion_network`` (the production path);
2. the SAME file is read by an independent torch+numpy mirror in this
   module that walks the raw ``module3 Network.state_dict()`` keys
   (``base_detector.module_list...``, ``img_cnn_layers.net...``,
   ``radar_cnn_layers.conv...``, ``refinement_head...``,
   ``ensemble_head...`` — my_models.py:411-431) with its OWN layout
   transposes, torch convs and the untruncated numpy NMS;
3. detections are diffed row-for-row on real frames (the in-repo
   recording ``data_collection/data/20200729-213410`` when present,
   synthetic frames otherwise).

Any key-mapping, transpose, graph or numeric divergence between the two
paths shows up as a box diff. Usage::

    python benchmarks/checkpoint_parity.py [--ckpt fusion.pth]
        [--frames 4] [--img_size 416] [--out CKPT_PARITY.json]

Without --ckpt a random reference-schema state dict is generated on the
fly (the CI mode; also exercised by tests/test_ckpt_parity.py).
Reference acceptance flow being mirrored: test_fusion.py:119-211.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


# ----------------------------------------------------- random reference sd
def make_random_module3_state_dict(img_size=416, seed=0, scale=0.05):
    """Reference-schema ``module3 Network.state_dict()`` with random
    weights: every key/shape the real checkpoints carry, none of the
    values. Shapes are derived from the framework's own plan so the file
    round-trips through both loaders."""
    import jax
    from millieye_tpu.models import Darknet, tiny_yolov3_defs

    rng = np.random.default_rng(seed)
    model = Darknet(tiny_yolov3_defs(num_classes=12, img_size=img_size),
                    img_size=img_size)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params, _state = model.init(jax.random.PRNGKey(0))

    sd = {}

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * scale

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = 1.0 + t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = (1.0 + t(c)) ** 2
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(100)

    for i, info in enumerate(model._plan):
        if info["type"] != "convolutional":
            continue
        base = f"base_detector.module_list.{i}"
        w = np.asarray(params[i]["w"])          # HWIO
        sd[f"{base}.conv_{i}.weight"] = np.transpose(
            t(*w.shape), (3, 2, 0, 1))          # -> OIHW
        if info["bn"]:
            bn(f"{base}.batch_norm_{i}", info["filters"])
        else:
            sd[f"{base}.conv_{i}.bias"] = t(info["filters"])

    sd["img_cnn_layers.net.conv_0.weight"] = t(490, 256, 1, 1)
    sd["img_cnn_layers.net.conv_0.bias"] = t(490)
    bn("img_cnn_layers.net.batch_norm_0", 490)

    chans = [(3, 32, "conv1"), (32, 64, "conv2"), (64, 128, "conv3")]
    for cin, cout, name in chans:
        sd[f"radar_cnn_layers.{name}.0.weight"] = t(cout, cin, 3, 3)
        sd[f"radar_cnn_layers.{name}.0.bias"] = t(cout)
        bn(f"radar_cnn_layers.{name}.1", cout)
    sd["radar_cnn_layers.conv3.3.weight"] = t(10, 128, 1, 1)
    sd["radar_cnn_layers.conv3.3.bias"] = t(10)

    sd["refinement_head.net0.0.weight"] = t(256, 490)
    sd["refinement_head.net0.0.bias"] = t(256)
    sd["refinement_head.net1.0.weight"] = t(4, 256)
    sd["refinement_head.net1.0.bias"] = t(4)
    sd["refinement_head.net2.0.weight"] = t(13, 256)
    sd["refinement_head.net2.0.bias"] = t(13)
    sd["refinement_head.radar_net.0.weight"] = t(10, 10, 7, 7)
    sd["refinement_head.radar_net.0.bias"] = t(10)
    bn("refinement_head.radar_net.1", 10)
    sd["refinement_head.radar_net.3.weight"] = t(1, 10, 1, 1)
    sd["refinement_head.radar_net.3.bias"] = t(1)

    sd["ensemble_head.fc1.0.weight"] = t(32, 2)
    sd["ensemble_head.fc1.0.bias"] = t(32)
    sd["ensemble_head.fc2.0.weight"] = t(2, 64)
    sd["ensemble_head.fc2.0.bias"] = t(2)
    return sd


# -------------------------------------------------------- torch/np mirror
def _np_greedy_nms(xyxy, iou_t):
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


def _torch_darknet(sd, plan, x_nchw, feature_tap):
    """Raw-state-dict darknet walk + decode; returns (tap_nchw, dets)."""
    import torch
    import torch.nn.functional as F
    from test_darknet import torch_decode

    outputs, dets = [], []
    with torch.no_grad():
        for i, info in enumerate(plan):
            t = info["type"]
            inp = outputs[-1] if outputs else x_nchw
            if t == "convolutional":
                base = f"base_detector.module_list.{i}"
                w = torch.tensor(sd[f"{base}.conv_{i}.weight"])
                if info["bn"]:
                    y = F.conv2d(inp, w, None, info["stride"],
                                 (info["size"] - 1) // 2)
                    bnp = f"{base}.batch_norm_{i}"
                    y = F.batch_norm(
                        y, torch.tensor(sd[f"{bnp}.running_mean"]),
                        torch.tensor(sd[f"{bnp}.running_var"]),
                        torch.tensor(sd[f"{bnp}.weight"]),
                        torch.tensor(sd[f"{bnp}.bias"]), False, 0.0, 1e-5)
                else:
                    y = F.conv2d(inp, w,
                                 torch.tensor(sd[f"{base}.conv_{i}.bias"]),
                                 info["stride"], (info["size"] - 1) // 2)
                if info["act"] == "leaky":
                    y = F.leaky_relu(y, 0.1)
            elif t == "maxpool":
                if info["size"] == 2 and info["stride"] == 1:
                    y = F.max_pool2d(F.pad(inp, (0, 1, 0, 1)), 2, 1)
                else:
                    y = F.max_pool2d(inp, info["size"], info["stride"])
            elif t == "upsample":
                y = F.interpolate(inp, scale_factor=info["factor"],
                                  mode="nearest")
            elif t == "route":
                y = torch.cat([outputs[l] for l in info["layers"]], 1)
            elif t == "shortcut":
                y = inp + outputs[info["frm"]]
            else:  # yolo
                y = inp
                dets.append(torch_decode(y, info["anchors"], info["classes"],
                                         x_nchw.shape[2]))
            outputs.append(y)
    return outputs[feature_tap], torch.cat(dets, 1)


def _conv_bn_leaky(sd, prefix, conv_key, bn_key, x, pad=0):
    import torch
    import torch.nn.functional as F
    y = F.conv2d(x, torch.tensor(sd[f"{prefix}.{conv_key}.weight"]),
                 torch.tensor(sd[f"{prefix}.{conv_key}.bias"]), padding=pad)
    y = F.batch_norm(y, torch.tensor(sd[f"{prefix}.{bn_key}.running_mean"]),
                     torch.tensor(sd[f"{prefix}.{bn_key}.running_var"]),
                     torch.tensor(sd[f"{prefix}.{bn_key}.weight"]),
                     torch.tensor(sd[f"{prefix}.{bn_key}.bias"]),
                     False, 0.0, 1e-5)
    return F.leaky_relu(y, 0.1)


def torch_mirror_detections(sd, plan, feature_tap, image_nhwc, radar_map_nhwc,
                            radar_xyxy_px, img_size, conf_thresh=0.2,
                            nms_thresh=0.5, class_idx=0,
                            refine_threshold_radar=0.0):
    """One frame through the raw-sd mirror; returns [n, 7] rows
    (x1, y1, x2, y2, conf, class_score, class_pred), priority-sorted —
    the FusionNetwork mode-0 output contract (my_models.py:433-539)."""
    import torch
    import torch.nn.functional as F
    from test_roi_align import np_ps_roi_align, np_roi_align

    x = torch.tensor(image_nhwc[None].transpose(0, 3, 1, 2))
    tap, dets = _torch_darknet(sd, plan, x, feature_tap)

    # untruncated conf filter + class-aware greedy NMS (utils.py:337-378)
    d = dets[0].numpy().astype(np.float64)
    d = d[d[:, 4] >= conf_thresh]
    order = np.argsort(-d[:, 4], kind="stable")
    d = d[order]
    xyxy = np.stack([d[:, 0] - d[:, 2] / 2, d[:, 1] - d[:, 3] / 2,
                     d[:, 0] + d[:, 2] / 2, d[:, 1] + d[:, 3] / 2], -1)
    cp = d[:, 5:].argmax(-1)
    keep = _np_greedy_nms(xyxy + cp[:, None] * 4096.0, nms_thresh)
    xyxy, d, cp = xyxy[keep][:200], d[keep][:200], cp[keep][:200]
    sel = cp == class_idx                       # my_models.py:463
    det_xyxy = xyxy[sel]
    det_conf = d[sel][:, 4]
    det_cls_score = d[sel][:, 5:].max(-1)
    det_cls0 = d[sel][:, 5 + class_idx]
    n_img = len(det_xyxy)

    with torch.no_grad():
        score_map = _conv_bn_leaky(sd, "img_cnn_layers.net", "conv_0",
                                   "batch_norm_0", tap)
        h = torch.tensor(radar_map_nhwc[None].transpose(0, 3, 1, 2))
        for name in ("conv1", "conv2", "conv3"):
            h = _conv_bn_leaky(sd, f"radar_cnn_layers.{name}", "0", "1", h,
                               pad=1)
        h = torch.sigmoid(
            F.conv2d(h, torch.tensor(sd["radar_cnn_layers.conv3.3.weight"]),
                     torch.tensor(sd["radar_cnn_layers.conv3.3.bias"])))
    score_nhwc = score_map.numpy().transpose(0, 2, 3, 1).astype(np.float64)
    radar_nhwc = h.numpy().transpose(0, 2, 3, 1).astype(np.float64)

    all_xyxy = np.concatenate([det_xyxy, radar_xyxy_px], 0)
    n_all = len(all_xyxy)
    if n_all == 0:
        return np.zeros((0, 7))
    rois = np.concatenate([np.zeros((n_all, 1)), all_xyxy], -1)
    img_crops = np_ps_roi_align(score_nhwc, rois, (7, 7), 1.0 / 16)
    radar_crops = np_roi_align(radar_nhwc, rois, (7, 7), 1.0 / 16)

    def lin(prefix, v):
        return v @ sd[f"{prefix}.weight"].astype(np.float64).T \
            + sd[f"{prefix}.bias"].astype(np.float64)

    flat = img_crops.transpose(0, 3, 1, 2).reshape(n_all, -1)
    t = lin("refinement_head.net0.0", flat)
    t = np.where(t > 0, t, 0.1 * t)
    reg = lin("refinement_head.net1.0", t)
    vec = 1 / (1 + np.exp(-lin("refinement_head.net2.0", t)))

    with torch.no_grad():
        rc = torch.tensor(radar_crops.transpose(0, 3, 1, 2),
                          dtype=torch.float32)
        r = _conv_bn_leaky(sd, "refinement_head.radar_net", "0", "1", rc)
        r = F.conv2d(r, torch.tensor(sd["refinement_head.radar_net.3.weight"]),
                     torch.tensor(sd["refinement_head.radar_net.3.bias"]))
        radar_conf = torch.sigmoid(r.reshape(n_all, 1)).numpy()
    conf = 1 / (1 + np.exp(-(radar_conf.astype(np.float64) + vec[:, :1])))

    # ensemble over image rows (refinement conf + class-0; yolo conf +
    # class-0 score), module3 my_models.py:509-513
    refinement_vec = np.concatenate([conf, vec[:, 1:2]], -1)
    yolo_vec = np.stack([det_conf, det_cls0], -1)
    stack = np.stack([refinement_vec[:n_img], yolo_vec], -1)
    hfc = stack @ sd["ensemble_head.fc1.0.weight"].astype(np.float64).T \
        + sd["ensemble_head.fc1.0.bias"].astype(np.float64)
    hfc = np.where(hfc > 0, hfc, 0.1 * hfc)
    # explicit width keeps the zero-detection frame well-defined
    # (reshape(0, -1) cannot infer -1 from a size-0 array)
    hfc = hfc.reshape(n_img, hfc.shape[1] * hfc.shape[2])
    e = hfc @ sd["ensemble_head.fc2.0.weight"].astype(np.float64).T \
        + sd["ensemble_head.fc2.0.bias"].astype(np.float64)
    e = np.exp(e - e.max(-1, keepdims=True))
    masks = e / e.sum(-1, keepdims=True)
    fg = np.concatenate([masks[:, 0], conf[n_img:, 0]])

    cx = (all_xyxy[:, 0] + all_xyxy[:, 2]) / 2
    cy = (all_xyxy[:, 1] + all_xyxy[:, 3]) / 2
    bw = all_xyxy[:, 2] - all_xyxy[:, 0]
    bh = all_xyxy[:, 3] - all_xyxy[:, 1]
    cxr = reg[:, 0] * bw + cx
    cyr = reg[:, 1] * bh + cy
    bwr = np.exp(np.clip(reg[:, 2], -20, 20)) * bw
    bhr = np.exp(np.clip(reg[:, 3], -20, 20)) * bh
    out_xyxy = np.stack([cxr - bwr / 2, cyr - bhr / 2,
                         cxr + bwr / 2, cyr + bhr / 2], -1)

    class_score = np.concatenate([det_cls_score, vec[n_img:, 1]])
    class_pred = np.concatenate([cp[sel], np.zeros(n_all - n_img)])
    thr = np.concatenate([np.zeros(n_img),
                          np.full(n_all - n_img, refine_threshold_radar)])
    prio = fg * np.concatenate([np.ones(n_img),
                                np.full(n_all - n_img, 1 / 5)])
    pos = fg > thr
    order = np.argsort(-np.where(pos, prio, -np.inf), kind="stable")
    order = order[pos[order]]
    return np.concatenate(
        [out_xyxy, fg[:, None], class_score[:, None], class_pred[:, None]],
        -1)[order]


# ----------------------------------------------------------- input frames
DEFAULT_CALIB = ("/root/reference/module3_our_dataset/data_collection/"
                 "yaml/calib_FOV90.yaml")


def _pad_points(pts, n):
    pts = np.asarray(pts, np.float32).reshape(-1, 4)[:n]
    out = np.zeros((n, 4), np.float32)
    mask = np.zeros(n, bool)
    out[:len(pts)] = pts
    mask[:len(pts)] = True
    return out, mask


def _real_frames(rec_dir, n_frames, img_size, max_radar,
                 calib_path=DEFAULT_CALIB):
    """Frames + radar inputs from a recorded session. All preprocessing
    runs ONCE on the host/CPU so both pipelines see IDENTICAL inputs (the
    preprocessing itself has its own parity tests)."""
    from millieye_tpu.collection.prepare import iter_frames
    from millieye_tpu.collection.sync import (load_timestamps,
                                              load_pointcloud, match_frames)
    from millieye_tpu.radar.pipeline import (RadarPipeline, RadarParams,
                                             normalize_boxes_to_padded)
    from millieye_tpu.radar.projection import load_calib
    from millieye_tpu.data.preprocessing import (np_pad_to_square,
                                                 np_resize_nearest)
    import jax
    import jax.numpy as jnp
    from millieye_tpu.train.recipes import _map_ingest

    p = RadarParams()
    vt = load_timestamps(os.path.join(rec_dir, "timestamps.txt"))
    rt, rframes = load_pointcloud(os.path.join(rec_dir, "pointcloud.pkl"))
    matches = match_frames(vt, rt, p.num_nearest)
    radar = RadarPipeline(load_calib(calib_path), p)
    cpu = jax.local_devices(backend="cpu")[0]
    overlay = []
    out = []
    for idx, frame in iter_frames(rec_dir):
        if idx >= len(matches) or len(out) >= n_frames:
            break
        for ri in matches[idx]:
            overlay.append(rframes[ri])
        overlay = overlay[-p.overlay_num:]
        pts = (np.concatenate(overlay, axis=1) if overlay
               else np.zeros((4, 0)))
        res = radar.process(pts)

        img = np.asarray(frame, np.float32) / 255.0
        sq, _pad = np_pad_to_square(img)
        img = np_resize_nearest(sq, img_size).astype(np.float32)
        h_f, w_f = frame.shape[:2]
        with jax.default_device(cpu):
            uvzv, m = _pad_points(res["points_uvzv"], 256)
            heat = np.asarray(_map_ingest((w_f, h_f), img_size)(
                jnp.asarray(uvzv[None]), jnp.asarray(m[None])))[0]
        props = (np.asarray(res["proposals"], np.float64).reshape(-1, 4)
                 if len(res["proposals"]) else np.zeros((0, 4)))
        rb_n, valid = normalize_boxes_to_padded(props, (w_f, h_f))
        rb_px = (rb_n[valid][:max_radar] * img_size).astype(np.float64)
        out.append((img, heat.astype(np.float32), rb_px))
    return out


def _synthetic_frames(n_frames, img_size, max_radar, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_frames):
        img = rng.uniform(size=(img_size, img_size, 3)).astype(np.float32)
        heat = rng.uniform(size=(img_size // 16, img_size // 16, 3)).astype(
            np.float32)
        k = int(rng.integers(1, max_radar))
        rb = np.zeros((k, 4))
        rb[:, :2] = rng.uniform(0.05, 0.6, (k, 2)) * img_size
        rb[:, 2:] = rb[:, :2] + rng.uniform(0.1, 0.3, (k, 2)) * img_size
        out.append((img, heat, rb))
    return out


# ------------------------------------------------------------------ driver
DEFAULT_REC = ("/root/reference/module3_our_dataset/data_collection/data/"
               "20200729-213410")


def run_parity(sd, frames, img_size, conf_thresh=0.2, nms_thresh=0.5,
               max_radar=32, rtol=2e-3, atol=2e-3):
    """Diff the two pipelines on prepared frames. Returns a report dict;
    raises AssertionError on any box mismatch."""
    import jax
    import jax.numpy as jnp
    from millieye_tpu.io.torch_ckpt import fill_fusion_network
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        darknet = Darknet(tiny_yolov3_defs(num_classes=12,
                                           img_size=img_size),
                          img_size=img_size)
        n_anchors = sum(3 * (img_size // s) ** 2 for s in (32, 16))
        model = FusionNetwork(darknet, FusionConfig(
            conf_thresh=conf_thresh, nms_thresh=nms_thresh,
            pre_nms_top_k=n_anchors, max_det=200, max_radar=max_radar,
            nms_use_pallas=False))
        params, state = model.init(jax.random.PRNGKey(0))
        params, state = fill_fusion_network(model, params, state, sd)

        report = {"frames": 0, "boxes": 0, "max_box_err": 0.0,
                  "max_conf_err": 0.0}
        for img, heat, rb_px in frames:
            want = torch_mirror_detections(
                sd, darknet._plan, darknet.feature_tap, img, heat, rb_px,
                img_size, conf_thresh, nms_thresh)

            rb = np.zeros((1, max_radar, 4), np.float32)
            rm = np.zeros((1, max_radar), bool)
            k = len(rb_px)
            rb[0, :k] = rb_px / img_size
            rm[0, :k] = True
            out = model.apply(params, state, jnp.asarray(img[None]),
                              jnp.asarray(heat[None]), jnp.asarray(rb),
                              jnp.asarray(rm), mode=0)
            got = np.asarray(out["boxes"][0])[np.asarray(out["valid"][0])]

            assert len(got) == len(want), (len(got), len(want))
            if len(got):
                np.testing.assert_allclose(got[:, :4], want[:, :4],
                                           rtol=rtol, atol=atol)
                np.testing.assert_allclose(got[:, 4], want[:, 4],
                                           rtol=rtol, atol=atol)
                np.testing.assert_array_equal(
                    got[:, 6].astype(int), want[:, 6].astype(int))
                report["max_box_err"] = max(
                    report["max_box_err"],
                    float(np.abs(got[:, :4] - want[:, :4]).max()))
                report["max_conf_err"] = max(
                    report["max_conf_err"],
                    float(np.abs(got[:, 4] - want[:, 4]).max()))
            report["frames"] += 1
            report["boxes"] += int(len(got))
    report["ok"] = True
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None,
                    help="reference module3 .pth (default: generate a "
                         "random reference-schema state dict)")
    ap.add_argument("--recording", default=DEFAULT_REC)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--img_size", type=int, default=416)
    ap.add_argument("--out", default="CKPT_PARITY.json")
    args = ap.parse_args(argv)

    if args.ckpt:
        from millieye_tpu.io.torch_ckpt import read_state_dict
        sd = read_state_dict(args.ckpt)
        src = args.ckpt
    else:
        sd = make_random_module3_state_dict(args.img_size)
        src = "random-reference-schema"

    if os.path.isdir(args.recording):
        frames = _real_frames(args.recording, args.frames, args.img_size,
                              max_radar=32)
        frame_src = args.recording
    else:
        frames = _synthetic_frames(args.frames, args.img_size, max_radar=32)
        frame_src = "synthetic"

    report = run_parity(sd, frames, args.img_size)
    report.update(checkpoint=src, frames_from=frame_src)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
