"""Streaming demo CLI (reference run_sp.py / run_mp.py Quick Start).

  python -m millieye_tpu.cli.demo --recording data/20200729-213410 \
      --calib yaml/calib_FOV90.yaml --weights fusion.npz --mode 0

Replays a recorded session (video/frames + timestamps + pointcloud)
through the host radar tracker and the single compiled TPU step,
printing per-stage FPS (the reference prints gpu_fps per frame,
run_mp.py:316-317, and per-stage fps in run_sp.py:234). ``--save_video``
writes annotated frames when OpenCV/PIL are available.
"""
from __future__ import annotations

import argparse
import os

from millieye_tpu.cli._common import (build_fusion, serving_overrides,
                                      SERVING_PRESETS)
from millieye_tpu.cli.evaluate import _load_fusion
from millieye_tpu.radar.projection import load_calib
from millieye_tpu.radar.pipeline import RadarParams
from millieye_tpu.runtime.engine import FusionEngine
from millieye_tpu.runtime.stream import StreamingPipeline


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--recording", required=True)
    p.add_argument("--calib", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--mode", type=int, default=0)
    p.add_argument("--img_size", type=int, default=416)
    p.add_argument("--frame_w", type=int, default=640)
    p.add_argument("--frame_h", type=int, default=480)
    p.add_argument("--refine_threshold_radar", type=float, default=0.56,
                   help="run_mp.py:262 demo setting")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--save_dir", default=None,
                   help="write annotated frames here")
    p.add_argument("--serving", default="f32",
                   choices=sorted(SERVING_PRESETS),
                   help="serving preset: compute dtype / space-to-depth "
                        "stem / int8 weights / int8 activations "
                        "(int8_acts calibrates on the recording's first "
                        "frames)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    s2d, hi_prec, hi_store, pallas_kw, over = serving_overrides(
        args.serving)
    model, params, state = build_fusion(
        args, s2d_stages=s2d, hi_prec_stages=hi_prec,
        hi_prec_store=hi_store, **pallas_kw,
        refine_threshold_radar=args.refine_threshold_radar, **over)
    if args.weights:
        params, state = _load_fusion(model, params, state, args.weights)
    act_absmax = None
    if model.cfg.acts_int8:
        act_absmax = _calibrate(model, params, state, args)
    engine = FusionEngine(model, params, state,
                          frame_size=(args.frame_w, args.frame_h),
                          act_absmax=act_absmax)
    calib = load_calib(args.calib)
    pipe = StreamingPipeline(engine, args.recording, calib,
                             RadarParams(frame_size=(args.frame_w,
                                                     args.frame_h)),
                             mode=args.mode)

    on_result = None
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        on_result = _make_saver(args)

    n, report = pipe.run(on_result=on_result, max_frames=args.max_frames)
    print(f"frames: {n}  report: {report}")
    return report


def _calibrate(model, params, state, args, n_frames=8):
    """Int8-activation calibration over the recording's first frames,
    letterboxed exactly as the engine ingests them."""
    import numpy as np
    import jax.numpy as jnp
    from millieye_tpu.collection.prepare import iter_frames
    from millieye_tpu.ops import letterbox as lb
    from millieye_tpu.ops.quantize import calibrate_act_scales

    s = model.darknet.img_size
    frames = []
    for _, frame in iter_frames(args.recording):
        img, _ = lb.letterbox_image(jnp.asarray(frame), s)
        frames.append(img)
        if len(frames) >= n_frames:
            break
    if not frames:
        raise ValueError("int8_acts calibration needs at least one frame "
                         f"in {args.recording}")
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    if model.darknet.s2d_stages:
        fp = model.darknet.fold_s2d(fp)
    return calibrate_act_scales(model.darknet, fp, fs,
                                [jnp.stack(frames)])


def _make_saver(args):
    from PIL import Image
    from millieye_tpu.collection.prepare import iter_frames
    from millieye_tpu.radar.viz import draw_detections
    frames = {i: f for i, f in iter_frames(args.recording)}

    def save(idx, boxes, valid):
        frame = frames.get(idx)
        if frame is None:
            return
        out = draw_detections(frame, boxes, valid)
        Image.fromarray(out).save(
            os.path.join(args.save_dir, f"{idx:06d}.jpg"))

    return save


if __name__ == "__main__":
    main()
