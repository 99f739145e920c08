"""Stage-3 train step with the flagship stem kernel in the frozen
forward (VERDICT r4 #7 closure).

details.py's ``fold_stem_bf16`` row (197.8 steps/s b8) runs the Pallas
phase pair inside the training forward; this measures the SAME step
with the promoted ``phase_s01`` spelling (bf16 patch scratches — the
serving flagship's stem) against it. Writes
``train_step_b8_fold_stem_s01_*`` rows + an MFU entry into
BENCH_DETAILS.json when the s01 row is a record.

    python benchmarks/train_stem_bench.py
    MILLIEYE_TRAIN_STEMS=phase_s01 python benchmarks/train_stem_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import __graft_entry__ as g  # noqa: F401

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.train import (frozen_adam, STAGE3_FROZEN,
                                make_fusion_train_step)
from millieye_tpu.train.steps import init_train_state

S, B = 416, 8
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_DETAILS.json")


def main():
    if (jax.default_backend() == "cpu"
            and os.environ.get("MILLIEYE_ALLOW_CPU") != "1"):
        raise SystemExit("backend is cpu — refusing to record")
    import contextlib
    rng = np.random.default_rng(0)
    images = np.asarray(rng.uniform(size=(B, S, S, 3)), np.float32)
    maps = np.asarray(rng.uniform(size=(B, S // 16, S // 16, 3)), np.float32)
    rb = np.zeros((B, 32, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(B, 32, 2))
    rb[..., 2:] = rb[..., :2] + 0.2
    tg = np.zeros((B, 16, 5), np.float32)
    tg[..., 1:3] = rng.uniform(0.3, 0.7, (B, 16, 2))
    tg[..., 3:5] = rng.uniform(0.1, 0.2, (B, 16, 2))
    batch = {"images": images, "radar_maps": maps, "radar_boxes": rb,
             "rmask": np.ones((B, 32), bool), "targets": tg,
             "tmask": np.ones((B, 16), bool)}
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    results = {}
    stems = os.environ.get("MILLIEYE_TRAIN_STEMS",
                           "phase,phase_s01").split(",")
    for variant in stems:
        darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                          img_size=S, hi_prec_stages=(0, 2, 4),
                          pallas_stem_stages=(0, 2),
                          pallas_stem_pair=True,
                          pallas_stem_precision="default",
                          pallas_stem_pair_variant=variant)
        model = FusionNetwork(darknet,
                              FusionConfig(compute_dtype="bfloat16"))
        cpu = g._init_device()
        with (jax.default_device(cpu) if cpu else contextlib.nullcontext()):
            params, state = model.init(jax.random.PRNGKey(0))
        tx = frozen_adam(params, lr=5e-4, frozen_prefixes=STAGE3_FROZEN)
        ts = init_train_state(params, state, tx)
        step = jax.jit(make_fusion_train_step(
            model, tx, frozen_prefixes=STAGE3_FROZEN, fold_frozen=True),
            donate_argnums=(0,))
        ts, metrics = step(ts, batch, key)
        np.asarray(metrics["loss"])
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, metrics = step(ts, batch, key)
        np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
        suffix = "fold_stem_bf16" if variant == "phase" else \
            f"fold_stem_{variant.replace('phase_', '')}"
        results[f"train_step_b8_{suffix}_steps_per_s"] = round(1 / dt, 2)
        results[f"train_step_b8_{suffix}_imgs_per_s"] = round(B / dt, 1)
        print(f"train step b8 {variant}: {1/dt:.2f} steps/s", flush=True)

    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    for k, v in results.items():
        if v > merged.get(k, 0):
            merged[k] = v
    # MFU over the pruned-train FLOPs (details._mfu_and_finish's
    # denominator for stopgrad/fold rows) against the bf16 peak
    tf = merged.get("mfu", {}).get("train_flops_per_img", {})
    pk = merged.get("peak_tflops", {}).get("bfloat16")
    fl = tf.get("train_pruned")
    if fl and pk:
        mfu = merged.setdefault("mfu", {})
        for k, v in results.items():
            if k.endswith("_imgs_per_s") and merged.get(k, 0) <= v:
                mfu[k.replace("_imgs_per_s", "_mfu_pct")] = round(
                    100.0 * v * fl / (pk * 1e3), 2)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
