"""Epoch-scale three-stage training + mAP@0.5 on the synthetic scenes.

The round-1 gap (VERDICT "What's missing" #1): nothing showed the
framework trains a detector that *detects*, or that fusion beats
yolo-only in the dark — the reference's acceptance story
(module3_our_dataset/test_fusion.py:211, train.py:245-272) needs its
released checkpoints/datasets, which are unreachable here. This script is
the stand-in acceptance run, fully reproducible from seeds:

  stage 1  train tiny-YOLOv3 from scratch on bright+dark synthetic scenes
           -> mAP@0.5 per illumination (evaluate_yolo)
  stage 2  freeze YOLO, train the R-CNN refinement (module2)
           -> mAP@0.5 (evaluate_refine)
  stage 3  transfer + freeze module2, train radar fusion heads (module3)
           -> mAP@0.5 for mode 0 (millieye) vs mode 1 (yolo) vs mode 3
           (auto), sliced by illumination H / L

Acceptance: stage-1 yolo mAP is high on bright and degraded on dark;
mode-0 fusion recovers a large fraction of the dark-frame loss
(fusion > yolo on L), with parity on H. Writes SYNTH_RESULTS.json.

Run on the chip: nohup python -u benchmarks/synthetic_e2e.py > log &
(cold compiles through the tunnel dominate wall-clock; compute is
minutes). --quick trims scales for a smoke run.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import __graft_entry__  # noqa: F401  (persistent compile cache)

from millieye_tpu.data.loader import PaddedCollate
from millieye_tpu.data.device_cache import DeviceCache
from millieye_tpu.data.synthetic import SyntheticScenes
from millieye_tpu.eval.harness import (evaluate_yolo, evaluate_refine,
                                       evaluate_fusion, summarize)
from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import (FusionConfig, FusionNetwork,
                                        RefineNetwork)
from millieye_tpu.train.recipes import (yolo_trainer, refine_trainer,
                                        fusion_trainer, fusion_device_batch,
                                        transfer_module2_to_fusion)

IMG = 416

# The whole padded dataset lives on device (data/device_cache.py): the
# axon relay both serializes per-step H2D with executions (~40 ms/switch)
# and RETAINS every H2D payload client-side — a 33 MB image batch per
# step OOM-killed the first epoch-scale run after ~3.7k steps. With the
# cache, per-step host traffic is a ~100-byte index vector.


def radar_cache(ds):
    return DeviceCache.build(ds, PaddedCollate(
        img_size=IMG, max_targets=8, max_radar=16, max_points=128))


IMG_KEYS = ("images", "targets", "tmask")


def _map(res):
    return round(summarize(res)[1], 4) if res is not None else 0.0


def main(quick=False, out_path="SYNTH_RESULTS.json",
         ckpt_root="runs/synthetic", resume=False, e3_override=None):
    n_train = 400 if quick else 2000
    n_test = 120 if quick else 400
    # device-cached steps are ~12/s through the tunnel, so epoch counts
    # are set by optimization need, not wall-clock: stage 3's radar-row
    # scoring was visibly undertrained at 8 epochs (fusion trailed yolo
    # even on bright frames)
    # e2 sets the frozen regression quality that bounds stage-3's radar-
    # row boxes (module3 excludes the regression loss, my_models.py:635)
    # e3: the randomly-init fusion parts (radar encoder, radar_net,
    # ensemble gate) climb for dozens of epochs (the r3-regen per-epoch
    # curve, benchmarks/stage3_curve.py: mode-0 H 0.40 @ ep0 -> 0.86 @
    # ep23, still rising) — train long and pick the best epoch on a
    # HELD-OUT validation seed (555), never the test seed (777)
    e1, e2, e3 = (2, 1, 1) if quick else (16, 16, 72)
    if e3_override:
        e3 = e3_override
    batch = 16
    report = {"config": {"n_train": n_train, "n_test": n_test,
                         "epochs": [e1, e2, e3], "batch": batch,
                         "img": IMG, "seeds": {"train": 0, "test": 777}}}
    t_all = time.time()

    # conf_thresh 0.2 is the reference eval's default (test_fusion.py:143):
    # at 0.05 the fusion mode must rank ~200 junk image rows by ensemble
    # score and any calibration noise collapses precision; yolo mode is
    # immune (ranked by its own conf), which skews the comparison
    cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=512, max_det=64,
                       max_radar=16)
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                      img_size=IMG)

    # one mixed day/night cache serves all three stages, mirroring the
    # reference: module2 trains on ExDark — dark-but-VISIBLE images —
    # and module3 on the day+night radar set. Tuning history: when the
    # dark split was sub-noise-floor, mixed stage-2 collapsed bright
    # ranking (H 0.94->0.32) and bright-only stage-2 left dim frames OOD
    # for the frozen regression (stage-3 dark mAP ~0); dim-but-visible
    # darks + mixed training is the regime where both hold.
    print("building device caches...", flush=True)
    train_cache = radar_cache(SyntheticScenes(n_train, seed=0))
    test_cache = {
        light: radar_cache(
            SyntheticScenes(n_test, seed=777, illumination=(light,)))
        for light in ("H", "L")}

    # stage-final checkpoints double as resume points: a crash in stage 3
    # must not cost the earlier stages (each is tens of minutes on the
    # tunnel)
    from millieye_tpu.io.checkpoint import save_checkpoint, load_checkpoint

    def stage_ckpt(name):
        return os.path.join(ckpt_root, f"{name}_final.npz")

    # ---------------------------------------------------------------- stage 1
    print("== stage 1: YOLO from scratch ==", flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = darknet.init(jax.random.PRNGKey(0))
    tr1 = yolo_trainer(darknet, params, state,
                       os.path.join(ckpt_root, "stage1"), lr=1e-3,
                       log_every=50, grad_clip=10.0)
    t0 = time.time()
    if resume and os.path.exists(stage_ckpt("stage1")):
        restored = load_checkpoint(stage_ckpt("stage1"),
                                   {"params": params, "state": state})
        ts1 = tr1.ts._replace(params=restored["params"],
                              state=restored["state"])
        print("stage1: resumed from", stage_ckpt("stage1"), flush=True)
    else:
        ts1 = tr1.fit(train_cache.loader(batch, shuffle=True, seed=0), e1,
                      jax.random.PRNGKey(10),
                      lambda b: {k: b[k] for k in IMG_KEYS})
        save_checkpoint(stage_ckpt("stage1"),
                        {"params": ts1.params, "state": ts1.state})
    steps1 = int(ts1.step)
    report["stage1"] = {"steps": steps1,
                        "train_secs": round(time.time() - t0, 1)}
    for light in ("H", "L"):
        res = evaluate_yolo(darknet, ts1.params, ts1.state,
                            test_cache[light].loader(batch),
                            conf_thresh=cfg.conf_thresh)
        report["stage1"][f"yolo_map50_{light}"] = _map(res)
    print("stage1:", report["stage1"], flush=True)

    # ---------------------------------------------------------------- stage 2
    print("== stage 2: refinement (module2) ==", flush=True)
    refine = RefineNetwork(darknet, FusionConfig(
        conf_thresh=cfg.conf_thresh, pre_nms_top_k=cfg.pre_nms_top_k,
        max_det=cfg.max_det, max_radar=cfg.max_radar,
        class_num=12, loss_variant="module2", loss_lambda=(15.0, 5.0)))
    with jax.default_device(cpu):
        p2, s2 = refine.init(jax.random.PRNGKey(1))
    p2 = dict(p2, darknet=ts1.params)
    s2 = dict(s2, darknet=ts1.state)
    tr2 = refine_trainer(refine, p2, s2, os.path.join(ckpt_root, "stage2"),
                         log_every=50, grad_clip=10.0)
    t0 = time.time()
    if resume and os.path.exists(stage_ckpt("stage2")):
        tpl = {"params": tr2.ts.params, "state": tr2.ts.state}
        restored = load_checkpoint(stage_ckpt("stage2"), tpl)
        ts2 = tr2.ts._replace(params=restored["params"],
                              state=restored["state"])
        print("stage2: resumed from", stage_ckpt("stage2"), flush=True)
    else:
        ts2 = tr2.fit(train_cache.loader(batch, shuffle=True, seed=2), e2,
                      jax.random.PRNGKey(20),
                      lambda b: {k: b[k] for k in IMG_KEYS})
        save_checkpoint(stage_ckpt("stage2"),
                        {"params": ts2.params, "state": ts2.state})
    report["stage2"] = {"steps": int(ts2.step),
                        "train_secs": round(time.time() - t0, 1)}
    for light in ("H", "L"):
        res = evaluate_refine(refine, ts2.params, ts2.state,
                              test_cache[light].loader(batch))
        report["stage2"][f"refine_map50_{light}"] = _map(res)
    print("stage2:", report["stage2"], flush=True)

    # ---------------------------------------------------------------- stage 3
    print("== stage 3: radar fusion (module3) ==", flush=True)
    fusion = FusionNetwork(darknet, cfg)
    with jax.default_device(cpu):
        p3, s3 = fusion.init(jax.random.PRNGKey(2))
    # seed from ts2 (NOT ts1): Trainer.fit donates the train state, so
    # stage-2's first step consumed ts1's darknet buffers; the frozen
    # darknet values are identical in ts2
    p3 = dict(p3, darknet=ts2.params["darknet"])
    s3 = dict(s3, darknet=ts2.state["darknet"])
    p3, s3 = transfer_module2_to_fusion(ts2.params, ts2.state, p3, s3)
    tr3 = fusion_trainer(fusion, p3, s3, os.path.join(ckpt_root, "stage3"),
                         log_every=50, grad_clip=10.0)
    t0 = time.time()
    if resume and os.path.exists(stage_ckpt("stage3")):
        tpl = {"params": tr3.ts.params, "state": tr3.ts.state}
        restored = load_checkpoint(stage_ckpt("stage3"), tpl)
        ts3 = tr3.ts._replace(params=restored["params"],
                              state=restored["state"])
        print("stage3: resumed from", stage_ckpt("stage3"), flush=True)
    else:
        ts3 = tr3.fit(train_cache.loader(batch, shuffle=True, seed=3), e3,
                      jax.random.PRNGKey(30),
                      lambda b: fusion_device_batch(b, IMG))

        # best-epoch selection on a held-out VALIDATION seed: the fusion
        # parts train from random init and their mode-0 quality is not
        # monotone in epochs; picking by test-seed mAP would leak.
        # Weights ride the eval jit as ARGUMENTS — the sweep costs one
        # compile (round-2 lesson (d), CLAUDE.md).
        n_val = max(64, n_test // 2)
        val_cache = {
            light: radar_cache(SyntheticScenes(
                n_val, seed=555, illumination=(light,)))
            for light in ("H", "L")}
        stride = max(1, e3 // 12)
        cand = sorted(set(list(range(stride - 1, e3, stride)) + [e3 - 1]))
        tpl = {"params": ts3.params, "state": ts3.state}
        val_curve, best = [], (-1.0, None)
        for ep in cand:
            path = os.path.join(ckpt_root, "stage3",
                                f"module3_ckpt_{ep}.npz")
            if not os.path.exists(path):
                continue
            with jax.default_device(cpu):
                restored = load_checkpoint(path, tpl)
            row = {"epoch": ep}
            for light in ("H", "L"):
                batches = (fusion_device_batch(b, IMG) for b in
                           val_cache[light].loader(batch))
                res = evaluate_fusion(fusion, restored["params"],
                                      restored["state"], batches, mode=0)
                row[f"val_map50_{light}"] = _map(res)
            row["score"] = round((row["val_map50_H"]
                                  + row["val_map50_L"]) / 2, 4)
            val_curve.append(row)
            print("stage3 val:", json.dumps(row), flush=True)
            if row["score"] > best[0]:
                best = (row["score"], ep, restored)
        if best[1] is not None:
            print(f"stage3: selected epoch {best[1]} "
                  f"(val score {best[0]})", flush=True)
            ts3 = ts3._replace(params=best[2]["params"],
                               state=best[2]["state"])
            report["stage3_selection"] = {"epoch": best[1],
                                          "val_score": best[0],
                                          "stride": stride,
                                          "val_seed": 555,
                                          "n_val": n_val,
                                          "curve": val_curve}
        save_checkpoint(stage_ckpt("stage3"),
                        {"params": ts3.params, "state": ts3.state})
    # runs/ is gitignored and has been wiped between sessions (twice,
    # round 3) — mirror the serving-eval checkpoint somewhere tracked.
    # Unconditional (also on --resume) so the tracked copy never goes
    # stale relative to runs/synthetic/stage3_final.npz.
    from millieye_tpu.io.artifacts import mirror_checkpoint
    print("mirrored:", mirror_checkpoint(stage_ckpt("stage3")), flush=True)
    report["stage3"] = {"steps": int(ts3.step),
                        "train_secs": round(time.time() - t0, 1)}

    for light in ("H", "L"):
        for mode, name in ((1, "yolo"), (0, "millieye"), (2, "radar"),
                           (3, "auto")):
            batches = (fusion_device_batch(b, IMG) for b in
                       test_cache[light].loader(batch))
            res = evaluate_fusion(fusion, ts3.params, ts3.state, batches,
                                  mode=mode)
            report["stage3"][f"map50_{name}_{light}"] = _map(res)
            print(f"stage3 mode={name} light={light}:",
                  report["stage3"][f"map50_{name}_{light}"], flush=True)

    report["wall_secs"] = round(time.time() - t_all, 1)
    s3r = report["stage3"]
    report["acceptance"] = {
        "fusion_beats_yolo_dark": s3r["map50_millieye_L"] > s3r["map50_yolo_L"],
        "dark_gain": round(s3r["map50_millieye_L"] - s3r["map50_yolo_L"], 4),
        "bright_parity_gap": round(
            s3r["map50_millieye_H"] - s3r["map50_yolo_H"], 4),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="SYNTH_RESULTS.json")
    ap.add_argument("--resume", action="store_true",
                    help="reuse runs/synthetic/stage*_final.npz from a "
                         "previous (crashed) run instead of retraining")
    ap.add_argument("--e3", type=int, default=None,
                    help="stage-3 epoch override (default 72)")
    args = ap.parse_args()
    main(quick=args.quick, out_path=args.out, resume=args.resume,
         e3_override=args.e3)
