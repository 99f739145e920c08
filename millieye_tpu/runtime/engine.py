"""Single compiled ingest + inference step for streaming.

The reference's demo splits work across a producer process (decode,
radar tracking, ToTensor/pad/resize/heatmap on CPU) and a consumer
(GPU forward, CPU NMS post-merge, rescale) — run_mp.py:42-160 / 302-334.
Here everything except JPEG/video decode and the tiny-N tracker is ONE
XLA program per frame:

  uint8 frame -> letterbox (on-device) ----------------------\
  radar points -> heatmap rasterize -> pad+resize (on-device) +-> fusion
  radar boxes (padded, normalized) --------------------------/   forward
  -> post-merge NMS (iou 0.3, run_mp.py:320) -> boxes in camera coords

so the host<->device boundary is crossed once per frame with a few KB of
raw inputs, and TPU sees a fixed-shape graph it compiles once.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from millieye_tpu.ops import letterbox as lb
from millieye_tpu.ops.rasterize import radar_heatmap, heatmap_bins
from millieye_tpu.ops.nms import nms_xyxy
from millieye_tpu.ops.boxes import rescale_boxes


def _sanitize_radar(points, pmask, radar_boxes, radar_mask):
    """Make untrusted sensor inputs total (NaN points/boxes masked, coords
    clamped, empty boxes dropped). Works on any leading batch dims."""
    points = jnp.asarray(points, jnp.float32)
    pmask = pmask & jnp.isfinite(points).all(-1)
    points = jnp.where(jnp.isfinite(points), points, 0.0)
    rb = jnp.asarray(radar_boxes, jnp.float32)
    finite_rb = jnp.isfinite(rb).all(-1)
    rb = jnp.clip(jnp.where(jnp.isfinite(rb), rb, 0.0), 0.0, 1.0)
    nonempty = (rb[..., 2] > rb[..., 0]) & (rb[..., 3] > rb[..., 1])
    radar_mask = radar_mask & finite_rb & nonempty
    return points, pmask, rb, radar_mask


def fold_for_serving(model, params, state, act_absmax=None):
    """Trained (raw) weights -> the model's serving representation:
    BN folded (cast to the compute dtype, hi-prec stages kept f32),
    s2d/im2col stem transforms applied, int8 weight/activation
    quantization per the FusionConfig. Shared by FusionEngine and the
    evaluate CLI's ``--serving`` presets."""
    cast = (jnp.dtype(model.cfg.compute_dtype)
            if model.cfg.compute_dtype != "float32" else None)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"], dtype=cast)
    if model.darknet.s2d_stages:
        fp = model.darknet.fold_s2d(fp)
    if getattr(model.darknet, "im2col_stages", ()):
        fp = model.darknet.fold_im2col(fp)
    if model.cfg.weights_int8:
        from millieye_tpu.ops.quantize import quantize_darknet
        kw = {}
        if model.cfg.acts_int8:
            if act_absmax is None:
                raise ValueError(
                    "acts_int8 serving needs act_absmax from "
                    "ops.quantize.calibrate_act_scales (run on the "
                    "folded/s2d graph over representative frames)")
            kw = dict(act_absmax=act_absmax,
                      act_skip=model.darknet.act_int8_skip)
        fp = quantize_darknet(fp, **kw)
    return dict(params, darknet=fp), dict(state, darknet=fs)


class FusionEngine:
    """Owns a FusionNetwork + weights; exposes one jit'd frame step."""

    def __init__(self, model, params, state, frame_size=(640, 480),
                 max_points=256, post_nms_iou=0.3, fold_bn=True,
                 act_absmax=None):
        self.model = model
        if fold_bn:
            params, state = fold_for_serving(model, params, state,
                                             act_absmax)
        # checkpoint restores yield NUMPY leaves; the step closes over
        # self.params, and numpy promotes `bf16_array + python_float`
        # to float32 during tracing (no weak types) — the same mixed-
        # dtype conv failure fixed in io/export.py:export_serving. jax
        # arrays keep weak-type promotion (and land on device once,
        # instead of re-transferring as fresh constants per mode).
        self.params = jax.tree.map(jnp.asarray, params)
        self.state = jax.tree.map(jnp.asarray, state)
        self.frame_size = frame_size
        self.max_points = max_points
        self.post_nms_iou = post_nms_iou
        self._steps = {}

    # ------------------------------------------------------------------ jit
    def _build_step(self, mode):
        cfg = self.model.cfg
        s = self.model.darknet.img_size
        w, h = self.frame_size

        def step(frame_u8, points, pmask, radar_boxes, radar_mask):
            # sanitize untrusted sensor inputs so the compiled graph is
            # total: non-finite radar points/boxes are masked invalid (a
            # NaN depth would otherwise poison its heatmap bin), box
            # coords clamp to the normalized frame and empty boxes drop
            points, pmask, radar_boxes, radar_mask = _sanitize_radar(
                points, pmask, radar_boxes, radar_mask)

            img, _ = lb.letterbox_image(frame_u8, s)
            heat = radar_heatmap(points, pmask, (w, h))
            heat, _ = lb.pad_to_square(heat, 0.0)
            heat = lb.resize_bilinear_align_corners(heat, s // 16)
            out = self.model.apply(
                self.params, self.state, img[None], heat[None],
                radar_boxes[None], radar_mask[None], mode=mode)
            boxes, valid = out["boxes"][0], out["valid"][0]
            # post-merge NMS across image+radar proposals (run_mp.py:320)
            merged, mvalid = nms_xyxy(
                boxes[:, :4], boxes[:, 4], boxes[:, 6].astype(jnp.int32),
                valid, self.post_nms_iou, boxes.shape[0])
            cam = rescale_boxes(merged[:, :4], s, (h, w))
            merged = jnp.concatenate([cam, merged[:, 4:]], -1)
            return merged, mvalid

        return jax.jit(step, static_argnums=())

    def step_fn(self, mode=0):
        if mode not in self._steps:
            self._steps[mode] = self._build_step(mode)
        return self._steps[mode]

    def _build_batched_step(self, mode):
        """Window-of-frames step: ingest + forward + post-NMS for W frames
        in ONE program. Throughput mode for streaming: one H2D transfer
        and one execution per window amortizes the relay's per-switch
        serialization (~40 ms) AND runs the network at batch efficiency
        (b32 is ~2x the per-frame rate of b1 on v5e)."""
        cfg = self.model.cfg
        s = self.model.darknet.img_size
        w, h = self.frame_size

        def step(frames_u8, points, pmask, radar_boxes, radar_mask):
            points, pmask, radar_boxes, radar_mask = _sanitize_radar(
                points, pmask, radar_boxes, radar_mask)

            img = jax.vmap(lambda f: lb.letterbox_image(f, s)[0])(frames_u8)

            def one_heat(p, m):
                heat = radar_heatmap(p, m, (w, h))
                heat, _ = lb.pad_to_square(heat, 0.0)
                return lb.resize_bilinear_align_corners(heat, s // 16)

            heat = jax.vmap(one_heat)(points, pmask)
            out = self.model.apply(self.params, self.state, img, heat,
                                   radar_boxes, radar_mask, mode=mode)
            boxes, valid = out["boxes"], out["valid"]

            def post(bx, vd):
                merged, mvalid = nms_xyxy(
                    bx[:, :4], bx[:, 4], bx[:, 6].astype(jnp.int32),
                    vd, self.post_nms_iou, bx.shape[0])
                cam = rescale_boxes(merged[:, :4], s, (h, w))
                return jnp.concatenate([cam, merged[:, 4:]], -1), mvalid

            return jax.vmap(post)(boxes, valid)

        return jax.jit(step)

    def batched_step_fn(self, mode=0):
        if mode == 3:
            raise ValueError("auto mode is per-frame; batched windows "
                             "need a static mode (0/1/2)")
        key = ("batched", mode)
        if key not in self._steps:
            self._steps[key] = self._build_batched_step(mode)
        return self._steps[key]

    # ----------------------------------------------------------------- host
    def pack_radar(self, points_uvzv, proposals_xyxy):
        """Host-side padding of the radar pipeline outputs."""
        from millieye_tpu.radar.pipeline import (normalize_boxes_to_padded,
                                                 pad_rows)
        pts, pmask = pad_rows(points_uvzv, self.max_points, 4)
        norm, valid = normalize_boxes_to_padded(proposals_xyxy,
                                                self.frame_size)
        rb, rmask = pad_rows(norm, self.model.cfg.max_radar, 4)
        rmask[:valid.shape[0]] &= valid[:self.model.cfg.max_radar]
        return pts, pmask, rb, rmask

    def infer(self, frame_u8, points_uvzv, proposals_xyxy, mode=0):
        """Full frame step; returns (boxes [K, 6] camera coords, valid [K]).

        mode 3 ("auto", test_fusion.py:24-32): dark frames run the fusion
        graph, bright frames the yolo-only graph, selected per frame from
        the mean intensity (< 0.1 of full scale)."""
        if mode == 3:
            mode = 0 if float(np.mean(frame_u8)) < 0.1 * 255 else 1
        pts, pmask, rb, rmask = self.pack_radar(points_uvzv, proposals_xyxy)
        step = self.step_fn(mode)
        boxes, valid = step(jnp.asarray(frame_u8), pts, pmask, rb, rmask)
        return np.asarray(boxes), np.asarray(valid)

    def warmup(self, mode=0):
        w, h = self.frame_size
        frame = np.zeros((h, w, 3), np.uint8)
        if mode == 3:                       # compile both auto branches
            self.warmup(0)
            return self.warmup(1)
        out = self.infer(frame, np.zeros((0, 4)), np.zeros((0, 4)), mode)
        return out
