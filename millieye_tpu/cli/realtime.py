"""Live camera + radar demo (reference data_collection/realtime_show.py +
the live half of run_mp.py).

  python -m millieye_tpu.cli.realtime --calib C.yaml --cfg radar.cfg \
      [--weights W] [--mode 0]

One process per sensor like the reference (camera capture thread + radar
UART reader), the tracker and the compiled TPU step in the main loop.
Requires OpenCV (display + capture) and pyserial (radar) — both optional
in this image, so the CLI degrades with a clear message instead of a
traceback. NB the reference's own live script has a broken import
(``from show import *``, realtime_show.py:11 — show.py is absent); this
is the working equivalent.
"""
from __future__ import annotations

import argparse
import queue
import threading
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--calib", required=True)
    p.add_argument("--cfg", required=True, help="TI radar .cfg")
    p.add_argument("--weights", default=None)
    p.add_argument("--mode", type=int, default=0)
    p.add_argument("--camera", type=int, default=0)
    p.add_argument("--frame_w", type=int, default=640)
    p.add_argument("--frame_h", type=int, default=480)
    p.add_argument("--img_size", type=int, default=416)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    try:
        import cv2
    except ImportError:
        print("realtime demo needs OpenCV (cv2) for capture/display; "
              "use `cli.demo` to replay recordings instead")
        return 1
    try:
        import serial  # noqa: F401
    except ImportError:
        print("realtime demo needs pyserial for the radar UART")
        return 1

    from millieye_tpu.cli._common import build_fusion
    from millieye_tpu.cli.evaluate import _load_fusion
    from millieye_tpu.collection.uart import RadarReader
    from millieye_tpu.radar.pipeline import RadarPipeline, RadarParams
    from millieye_tpu.radar.projection import load_calib
    from millieye_tpu.runtime.engine import FusionEngine
    from millieye_tpu.runtime.profiler import StageTimer

    model, params, state = build_fusion(args)
    if args.weights:
        params, state = _load_fusion(model, params, state, args.weights)
    engine = FusionEngine(model, params, state,
                          frame_size=(args.frame_w, args.frame_h))
    engine.warmup(args.mode)

    calib = load_calib(args.calib)
    radar = RadarPipeline(calib, RadarParams(frame_size=(args.frame_w,
                                                         args.frame_h)))
    reader = RadarReader(args.cfg)
    reader.boot()

    point_q = queue.Queue(maxsize=8)

    def radar_loop():
        while True:
            for _, xyzv in reader.poll():
                if point_q.full():
                    point_q.get_nowait()
                point_q.put(xyzv)

    threading.Thread(target=radar_loop, daemon=True).start()

    cap = cv2.VideoCapture(args.camera)
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, args.frame_w)
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, args.frame_h)
    timer = StageTimer(("frame",))
    latest = [np.zeros((0, 4), np.float32)]

    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        while not point_q.empty():
            latest.append(point_q.get_nowait())
            latest = latest[-2:]                    # overlay_num frames
        pts = (np.concatenate(latest, axis=0).T if latest[0].size
               else np.zeros((4, 0)))
        with timer("frame"):
            out = radar.process(pts)
            boxes, valid = engine.infer(bgr[:, :, ::-1], out["points_uvzv"],
                                        out["proposals"], args.mode)
        for b, v in zip(boxes, valid):
            if v:
                cv2.rectangle(bgr, (int(b[0]), int(b[1])),
                              (int(b[2]), int(b[3])), (0, 255, 0), 2)
        cv2.putText(bgr, f"{timer.fps('frame'):.1f} fps", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2)
        cv2.imshow("millieye_tpu", bgr)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cap.release()
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
