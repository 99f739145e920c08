"""5-fold scene cross-validation of the synthetic acceptance (VERDICT r4 #4).

The reference slices its recorded scenes into 5 folds and holds one out
per run (module3_our_dataset/utils/datasets.py:142-143, the
``test_list`` argument every CLI exposes). The repo implements and
unit-tests fold selection (RadarFusionDataset.FOLDS, cli --test_list),
but the recorded acceptance (SYNTH_RESULTS.json:acceptance) is a single
split. This harness adds the fold-robustness table: it PARTITIONS the
canonical held-out test pool (seed 777 — disjoint from the train seed 0
and the stage-3 validation seed 555) into 5 disjoint scene folds and
evaluates the trained stage-3 net per fold x illumination x mode, so the
acceptance criteria (fusion beats yolo dark, bright parity) are checked
per-fold rather than once. Fold rows are a partition of the recorded
test set: their image-weighted union reproduces the headline split.

Appends a ``fold_sweep`` block to SYNTH_RESULTS.json (merge, not
overwrite).

    python benchmarks/fold_sweep.py            # chip
    MILLIEYE_ALLOW_CPU=1 python benchmarks/fold_sweep.py --n 16  # dev
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__  # noqa: F401  (persistent compile cache)

from millieye_tpu.data.device_cache import DeviceCache
from millieye_tpu.data.loader import PaddedCollate
from millieye_tpu.data.synthetic import SyntheticScenes
from millieye_tpu.eval.harness import evaluate_fusion, summarize
from millieye_tpu.io.artifacts import resolve_checkpoint
from millieye_tpu.io.checkpoint import load_checkpoint
from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.train.recipes import fusion_device_batch

IMG = 416
N_FOLDS = 5
MODES = ((1, "yolo"), (0, "millieye"), (2, "radar"))


def _require_chip():
    if (jax.default_backend() == "cpu"
            and os.environ.get("MILLIEYE_ALLOW_CPU") != "1"):
        raise SystemExit("backend is cpu — refusing to record chip "
                         "benchmark results")


def _fold_cache(n_test, light, fold):
    """Device cache over the fold-th fifth of the canonical test pool.

    Slicing the illumination-filtered item list by ``fold::5`` assigns
    every underlying scene index to exactly one fold per split — the
    synthetic stand-in for the reference's held-out recording scenes."""
    ds = SyntheticScenes(n_test, seed=777, illumination=(light,))
    ds.items = ds.items[fold::N_FOLDS]
    return DeviceCache.build(ds, PaddedCollate(img_size=IMG, max_targets=8,
                                               max_radar=16, max_points=128))


def main(ckpt="runs/synthetic/stage3_final.npz",
         out_path="SYNTH_RESULTS.json", n_test=400, batch=16):
    _require_chip()
    cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=512, max_det=64,
                       max_radar=16)  # the synthetic_e2e eval config
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                      img_size=IMG)
    fusion = FusionNetwork(darknet, cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = fusion.init(jax.random.PRNGKey(0))
        restored = load_checkpoint(resolve_checkpoint(ckpt),
                                   {"params": params, "state": state})
    params, state = restored["params"], restored["state"]

    folds = []
    for fold in range(N_FOLDS):
        row = {"fold": fold}
        for light in ("H", "L"):
            cache = _fold_cache(n_test, light, fold)
            row[f"n_{light}"] = len(cache)
            for mode, name in MODES:
                batches = (fusion_device_batch(b, IMG)
                           for b in cache.loader(batch))
                res = evaluate_fusion(fusion, params, state, batches,
                                      mode=mode)
                m = round(summarize(res)[1], 4) if res else 0.0
                row[f"map50_{name}_{light}"] = m
        row["dark_gain"] = round(
            row["map50_millieye_L"] - row["map50_yolo_L"], 4)
        row["bright_parity_gap"] = round(
            row["map50_millieye_H"] - row["map50_yolo_H"], 4)
        row["fusion_beats_yolo_dark"] = (
            row["map50_millieye_L"] > row["map50_yolo_L"])
        folds.append(row)
        print("fold", json.dumps(row), flush=True)

    gains = [r["dark_gain"] for r in folds]
    gaps = [r["bright_parity_gap"] for r in folds]
    block = {
        "note": "eval-only 5-fold partition of the seed-777 test pool; "
                "stage-3 net trained once on seed 0 (epochs selected on "
                "seed 555) — scene folds are disjoint and unseen",
        "ckpt": os.path.basename(resolve_checkpoint(ckpt)),
        "n_test_pool": n_test,
        "folds": folds,
        "dark_gain_min": min(gains), "dark_gain_max": max(gains),
        "bright_gap_min": min(gaps), "bright_gap_max": max(gaps),
        "folds_fusion_beats_yolo_dark": sum(
            r["fusion_beats_yolo_dark"] for r in folds),
    }
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["fold_sweep"] = block
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"fold_sweep": {k: v for k, v in block.items()
                                     if k != "folds"}}), flush=True)
    return block


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/synthetic/stage3_final.npz")
    ap.add_argument("--out", default="SYNTH_RESULTS.json")
    ap.add_argument("--n", type=int, default=400,
                    help="test pool size (split across 5 folds per light)")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    main(ckpt=args.ckpt, out_path=args.out, n_test=args.n,
         batch=args.batch)
