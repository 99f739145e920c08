"""End-to-end fusion decomposition at the b32 throughput point.

Where do the ~9.8 ms of a bf16 b32 batch go? Scan-amortized device time
for three graph prefixes:

    backbone   Darknet.apply -> detections (conv stack + YOLO decode)
    +nms       ... -> batched_nms (Pallas kernel, K=200/pre512)
    full       ... -> score maps -> PSRoIAlign+RoIAlign(232 rois/img)
               -> refinement/ensemble heads (mode 0)

Differences attribute time to NMS and to the RoI/head tail — the round-3
optimization targets. Appends fusion_profile_* to BENCH_DETAILS.json.

    python benchmarks/fusion_profile.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import __graft_entry__ as g  # noqa: F401  (compile cache)
from benchmarks.backbone_profile import bench_scanned


def main(b=32, dtype="bfloat16"):
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.ops.nms import batched_nms

    s = 416
    model, params, state = g._build_fusion(s, max_det=200, max_radar=32,
                                           pre_top_k=512)
    cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cpu = g._init_device()
    import contextlib
    with (jax.default_device(cpu) if cpu else contextlib.nullcontext()):
        fp, fs = model.darknet.fold_batchnorm(
            params["darknet"], state["darknet"],
            dtype=cd if dtype == "bfloat16" else None)
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    cfg = FusionConfig(compute_dtype=dtype)
    model = FusionNetwork(model.darknet, cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(b, s, s, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(b, s // 16, s // 16, 3)),
                       jnp.float32)
    rb = np.zeros((b, 32, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(b, 32, 2))
    rb[..., 2:] = rb[..., :2] + 0.2
    rb = jnp.asarray(rb)
    rmask = jnp.ones((b, 32), bool)

    def backbone(img):
        return model.darknet.apply(params["darknet"], state["darknet"],
                                   img, compute_dtype=cd)["detections"]

    def with_nms(img):
        det = backbone(img)
        out, valid = batched_nms(det, cfg.conf_thresh, cfg.nms_thresh,
                                 max_det=200, pre_top_k=512)
        return out

    def full(img):
        out = model.apply(params, state, img, maps, rb, rmask, mode=0)
        return out["boxes"]

    results = {}
    for name, fn in (("backbone", backbone), ("backbone_nms", with_nms),
                     ("full", full)):
        t = bench_scanned(fn, x, k=10)
        key = f"fusion_profile_{dtype}_b{b}_{name}_us"
        results[key] = round(t * 1e6, 1)
        print(f"{key}: {results[key]}", flush=True)

    nms = results[f"fusion_profile_{dtype}_b{b}_backbone_nms_us"] - \
        results[f"fusion_profile_{dtype}_b{b}_backbone_us"]
    tail = results[f"fusion_profile_{dtype}_b{b}_full_us"] - \
        results[f"fusion_profile_{dtype}_b{b}_backbone_nms_us"]
    print(f"attribution: backbone "
          f"{results[f'fusion_profile_{dtype}_b{b}_backbone_us']} us, "
          f"nms {nms:.1f} us, roi+heads {tail:.1f} us", flush=True)

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
