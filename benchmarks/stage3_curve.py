"""Stage-3 training-dynamics diagnostic: mode-0 fusion mAP per epoch.

The r3-regenerated synthetic model FAILS the dark-acceptance criterion
(SYNTH_RESULTS acceptance: fusion 0.8568 H / 0.6137 L vs yolo 0.8951 /
0.6357) even though its OWN stage-2 refine beats yolo on both splits
(0.9028 / 0.6507) — stage-3 training makes the detector worse than the
refine checkpoint it starts from. This walks the saved per-epoch
stage-3 checkpoints (runs/synthetic/stage3/module3_ckpt_*.npz) and
evaluates mode-0 H/L mAP for each, so the failure is localized to
"degrades from epoch 0" (loss/freezing bug or overfit) vs "never
reaches refine level" (init/transfer gap).

    python benchmarks/stage3_curve.py [epoch ...]

Writes runs/stage3_curve.json. Eval weights ride as jit ARGUMENTS —
one compile for the whole sweep (round-2 lesson (d), CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__  # noqa: F401  (persistent compile cache)

from millieye_tpu.data.loader import PaddedCollate
from millieye_tpu.data.device_cache import DeviceCache
from millieye_tpu.data.synthetic import SyntheticScenes
from millieye_tpu.eval.harness import evaluate_fusion, summarize
from millieye_tpu.io.checkpoint import load_checkpoint
from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.train.recipes import fusion_device_batch

IMG = 416
CKPT_DIR = "runs/synthetic/stage3"


def main():
    epochs = [int(a) for a in sys.argv[1:] if a.isdigit()] or \
        [0, 3, 7, 11, 15, 19, 23]
    cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=512, max_det=64,
                       max_radar=16)
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                      img_size=IMG)
    fusion = FusionNetwork(darknet, cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = fusion.init(jax.random.PRNGKey(0))

    caches = {
        light: DeviceCache.build(
            SyntheticScenes(400, seed=777, illumination=(light,)),
            PaddedCollate(img_size=IMG, max_targets=8, max_radar=16,
                          max_points=128))
        for light in ("H", "L")}

    rows = []
    for ep in epochs:
        path = os.path.join(CKPT_DIR, f"module3_ckpt_{ep}.npz")
        if not os.path.exists(path):
            print(f"skip epoch {ep}: no {path}", flush=True)
            continue
        with jax.default_device(cpu):
            restored = load_checkpoint(path, {"params": params,
                                              "state": state})
        p, s = restored["params"], restored["state"]
        row = {"epoch": ep}
        for light in ("H", "L"):
            batches = (fusion_device_batch(b, IMG)
                       for b in caches[light].loader(16))
            res = evaluate_fusion(fusion, p, s, batches, mode=0)
            row[f"map50_{light}"] = (round(summarize(res)[1], 4)
                                     if res else 0.0)
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs("runs", exist_ok=True)
    with open("runs/stage3_curve.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
