"""Accuracy of the serving optimizations on the TRAINED synthetic model.

Loads the stage-3 checkpoint produced by benchmarks/synthetic_e2e.py and
evaluates mode-0 fusion mAP@0.5 (dark + bright test splits) across the
serving variants:

    f32            plain folded-BN backbone (the parity config)
    s2d            space-to-depth stem (exact transform; mAP must match)
    s2d_int8       + int8 weights (per-out-channel PTQ; quantifies the
                   accuracy cost of the 4x weight-traffic saving)
    s2d_int8_acts  + int8 activations (calibrated per-conv scales,
                   int8 x int8 -> int32 MXU convs; head convs stay float)
    bf16_s2d       bf16 backbone + s2d (the throughput serving config)

Appends a ``serving_accuracy`` block to SYNTH_RESULTS.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import __graft_entry__  # noqa: F401  (persistent compile cache)

from millieye_tpu.data.loader import PaddedCollate
from millieye_tpu.data.device_cache import DeviceCache
from millieye_tpu.data.synthetic import SyntheticScenes
from millieye_tpu.eval.harness import evaluate_fusion, summarize
from millieye_tpu.io.checkpoint import load_checkpoint
from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.ops.quantize import (calibrate_act_scales,
                                       quantize_darknet)
from millieye_tpu.train.recipes import fusion_device_batch

IMG = 416


def _cache(ds):
    # device-resident test split: one H2D put per split, per-batch host
    # traffic is an index vector (the relay retains every H2D payload —
    # see data/device_cache.py)
    return DeviceCache.build(ds, PaddedCollate(img_size=IMG, max_targets=8,
                                               max_radar=16, max_points=128))



def _require_chip():
    """Refuse to record benchmark rows from a CPU backend — the relay
    guard in __graft_entry__ can flip a subprocess to CPU mid-campaign
    (MILLIEYE_ALLOW_CPU=1 for deliberate dev runs)."""
    import jax
    if (jax.default_backend() == "cpu"
            and os.environ.get("MILLIEYE_ALLOW_CPU") != "1"):
        raise SystemExit("backend is cpu — refusing to record chip "
                         "benchmark results")


def main(ckpt="runs/synthetic/stage3_final.npz",
         out_path="SYNTH_RESULTS.json", n_test=400):
    _require_chip()
    cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=512, max_det=64,
                       max_radar=16)  # reference eval default (see
                                      # synthetic_e2e.py)
    base_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                      img_size=IMG)
    base = FusionNetwork(base_dn, cfg)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = base.init(jax.random.PRNGKey(0))
        from millieye_tpu.io.artifacts import resolve_checkpoint
        restored = load_checkpoint(resolve_checkpoint(ckpt),
                                   {"params": params, "state": state})
        params, state = restored["params"], restored["state"]
        fp, fs = base_dn.fold_batchnorm(params["darknet"], state["darknet"])

    s2d_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                     img_size=IMG, s2d_stages=(0, 2))
    with jax.default_device(cpu):
        fp_s2d = s2d_dn.fold_s2d(fp)
        fp_int8 = quantize_darknet(fp_s2d)

    # activation calibration on 4 mixed H/L training batches (device
    # cache: no per-batch H2D)
    cal_cache = _cache(SyntheticScenes(64, seed=0))
    cal = [b["images"] for b in cal_cache.loader(16)]
    absmax = calibrate_act_scales(s2d_dn, fp_s2d,
                                  dict(state, darknet=fs)["darknet"], cal)
    with jax.default_device(cpu):
        fp_int8a = quantize_darknet(fp_s2d, act_absmax=absmax,
                                    act_skip=s2d_dn.act_int8_skip)
        # stem convs kept float: dark activations are ~30x smaller than
        # the mixed-calibration scales assume, and the divergence is
        # largest at the input side (measured: full act-quant costs
        # -0.13 dark mAP vs -0.003 bright); blocks 0/2/4 are the cheap
        # small-channel stages, so the MXU win stays on the wide convs
        fp_int8a_stem = quantize_darknet(
            fp_s2d, act_absmax=absmax,
            act_skip=tuple(s2d_dn.act_int8_skip) + (0, 2, 4))

    # mixed-precision stem: bf16 everywhere except convs 0/2/4 (f32) —
    # candidate dark-safe throughput config (all-bf16 costs -0.043 dark)
    mixed_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                       img_size=IMG, hi_prec_stages=(0, 2, 4))
    # f32 arithmetic + f16 STORAGE on the stem: the stem stages are
    # HBM-bound, so pure-f32 storage there costs the whole bf16 win
    # (details.py: 2469 vs 3281 fps b32); f16's 11-bit mantissa should
    # keep the dark contrast the bf16 store loses
    import jax.numpy as jnp
    f16s_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                      img_size=IMG, hi_prec_stages=(0, 2, 4),
                      hi_prec_store=jnp.float16)

    # Pallas fused stem (stages 0/2): f32 VMEM arithmetic like hi_prec,
    # f16 pooled stores; heads bf16 — the round-3 throughput config
    pallas_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                        img_size=IMG, hi_prec_stages=(0, 2, 4),
                        hi_prec_store=jnp.float16,
                        pallas_stem_stages=(0, 2))
    # double-fused pair with one-pass bf16 conv dots (f32 accumulate):
    # the accuracy gate for the "default"-precision kernel — the r2
    # diagnosis says bf16 hurt via STORES, not dots, so this should hold
    pallas2_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                         img_size=IMG, hi_prec_stages=(0, 2, 4),
                         hi_prec_store=jnp.float16,
                         pallas_stem_stages=(0, 2),
                         pallas_stem_pair=True,
                         pallas_stem_precision="default")
    heads_cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=512,
                             max_det=64, max_radar=16,
                             compute_dtype="bfloat16",
                             heads_dtype="bfloat16")
    # phase-grouped pair spelling (pool as lane-block maxes)
    phase_dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                       img_size=IMG, hi_prec_stages=(0, 2, 4),
                       hi_prec_store=jnp.float16,
                       pallas_stem_stages=(0, 2),
                       pallas_stem_pair=True,
                       pallas_stem_precision="default",
                       pallas_stem_pair_variant="phase")
    # + VMEM-resident Pallas RoI crops at DEFAULT dots — the accuracy
    # gate for the full serving config (roi rounding class == bf16 heads)
    roi_cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=512,
                           max_det=64, max_radar=16,
                           compute_dtype="bfloat16",
                           heads_dtype="bfloat16",
                           roi_impl="pallas", roi_precision="default")
    # the serving-candidate tails: top-256 NMS (sufficiency-proved
    # lossless at conf 0.2) and the full latency preset (top-256 +
    # blocked NMS kernel + VPU RoI reduce) — accuracy gates for the
    # pallas_max_k256 / pallas_lat presets
    k256_cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=256,
                            max_det=64, max_radar=16,
                            compute_dtype="bfloat16",
                            heads_dtype="bfloat16",
                            roi_impl="pallas", roi_precision="default")
    lat_cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=256,
                           max_det=64, max_radar=16,
                           compute_dtype="bfloat16",
                           heads_dtype="bfloat16",
                           roi_impl="pallas", roi_precision="default",
                           roi_reduce="vpu", nms_use_blocked=True)
    # the r4 flagship: top-128 candidates (sufficient_k128_d64 = 100%
    # on both splits — the measured row should equal k256's exactly)
    k128_cfg = FusionConfig(conf_thresh=0.2, pre_nms_top_k=128,
                            max_det=64, max_radar=16,
                            compute_dtype="bfloat16",
                            heads_dtype="bfloat16",
                            roi_impl="pallas", roi_precision="default")

    variants = {
        "f32": (base, dict(params, darknet=fp), "float32"),
        # + bf16 heads over the f16-stem config (score maps, RoI einsums,
        # refinement/ensemble in bf16; decode/NMS/regression stay f32)
        "bf16_heads": (FusionNetwork(f16s_dn, heads_cfg),
                       dict(params, darknet=fp), "bfloat16"),
        "pallas_stem": (FusionNetwork(pallas_dn, heads_cfg),
                        dict(params, darknet=fp), "bfloat16"),
        "pallas_stem2": (FusionNetwork(pallas2_dn, heads_cfg),
                         dict(params, darknet=fp), "bfloat16"),
        "pallas_phase": (FusionNetwork(phase_dn, heads_cfg),
                         dict(params, darknet=fp), "bfloat16"),
        "pallas_max": (FusionNetwork(phase_dn, roi_cfg),
                       dict(params, darknet=fp), "bfloat16"),
        "pallas_max_k256": (FusionNetwork(phase_dn, k256_cfg),
                            dict(params, darknet=fp), "bfloat16"),
        "pallas_max_k128": (FusionNetwork(phase_dn, k128_cfg),
                            dict(params, darknet=fp), "bfloat16"),
        "pallas_lat": (FusionNetwork(phase_dn, lat_cfg),
                       dict(params, darknet=fp), "bfloat16"),
        # + bf16 s0/s1 patch scratches in the stem pair (phase_s01 —
        # the measured-fastest r5 candidate, 5315.8 fps b32): DIRECT
        # accuracy row at the k128/d64 operating point (the alias from
        # the k128 row rests on the gate's bit-identity; this measures
        # the preset itself)
        "pallas_max_s01": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="phase_s01"), k128_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # + VMEM-block input over the s01 scratches (phase_vmem_s01):
        # accuracy gate for the pallas_max_vm_s01 preset
        "pallas_max_vm_s01": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="phase_vmem_s01"), k128_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # VMEM-block input, f32 scratches (pallas_max_vm preset)
        "pallas_max_vm": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="phase_vmem"), k128_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # VMEM-block BF16 input (halved HBM read — a REAL rounding
        # change on the input, unlike the scratch-only rows above, so
        # this row is a required gate, not an alias)
        "pallas_max_vm_bf16s": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="phase_vmem_bf16s"),
            k128_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # + stage-0 K-packed stem (numerics == phase at the same
        # precision; this row is the trained-net no-regression gate)
        "pallas_packed": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="packed"), roi_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # s2d stage-1 spellings (same dots as packed, s2d-regrouped;
        # trained-net no-regression gates for the pallas_s2d/_s2d8
        # presets)
        "pallas_s2d": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="s2d"), roi_cfg),
            dict(params, darknet=fp), "bfloat16"),
        "pallas_s2d8": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="s2d8"), roi_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # + deep stem (stages 4/6 via the planar kernel): trained-net
        # no-regression gate for the pallas_deep preset
        "pallas_deep": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2, 4, 6),
                    pallas_stem_pair=True,
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="s2d"), roi_cfg),
            dict(params, darknet=fp), "bfloat16"),
        # + the deep PAIR (stages 4+6 as one s2d kernel, g0=2):
        # trained-net no-regression gate for the pallas_pair2 preset
        "pallas_pair2": (FusionNetwork(
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=IMG),
                    img_size=IMG, hi_prec_stages=(0, 2, 4),
                    hi_prec_store=jnp.float16,
                    pallas_stem_stages=(0, 2, 4, 6),
                    pallas_stem_pair=True, pallas_stem_pairs="all",
                    pallas_stem_precision="default",
                    pallas_stem_pair_variant="s2d"), roi_cfg),
            dict(params, darknet=fp), "bfloat16"),
        "bf16_f32stem": (FusionNetwork(
            mixed_dn, FusionConfig(conf_thresh=0.2, pre_nms_top_k=512,
                                   max_det=64, max_radar=16,
                                   compute_dtype="bfloat16")),
            dict(params, darknet=fp), "bfloat16"),
        "bf16_f16stem": (FusionNetwork(
            f16s_dn, FusionConfig(conf_thresh=0.2, pre_nms_top_k=512,
                                  max_det=64, max_radar=16,
                                  compute_dtype="bfloat16")),
            dict(params, darknet=fp), "bfloat16"),
        "s2d": (FusionNetwork(s2d_dn, cfg),
                dict(params, darknet=fp_s2d), "float32"),
        "s2d_int8": (FusionNetwork(s2d_dn, cfg),
                     dict(params, darknet=fp_int8), "float32"),
        "s2d_int8_acts": (FusionNetwork(s2d_dn, cfg),
                          dict(params, darknet=fp_int8a), "float32"),
        "s2d_int8_acts_fstem": (FusionNetwork(s2d_dn, cfg),
                                dict(params, darknet=fp_int8a_stem),
                                "float32"),
        "bf16_s2d": (FusionNetwork(
            s2d_dn, FusionConfig(conf_thresh=0.05, pre_nms_top_k=512,
                                 max_det=64, max_radar=16,
                                 compute_dtype="bfloat16")),
            dict(params, darknet=fp_s2d), "bfloat16"),
    }
    folded_state = dict(state, darknet=fs)

    def _merge(results):
        # incremental, additive flush: a late-variant compile failure
        # must not lose earlier rows, and a MILLIEYE_ONLY rerun keeps
        # every other variant's numbers
        merged = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                merged = json.load(f)
        merged.setdefault("serving_accuracy", {}).update(results)
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1)
        return merged

    # comma-separated EXACT variant names (substring matching would pull
    # pallas_s2d8 into a pallas_s2d-only rerun — see details.py)
    only = [t for t in os.environ.get("MILLIEYE_ONLY", "").split(",") if t]
    results = {}
    for light in ("L", "H"):
        cache = _cache(SyntheticScenes(n_test, seed=777,
                                       illumination=(light,)))
        for name, (model, p, _dt) in variants.items():
            if only and name not in only:
                continue
            batches = (fusion_device_batch(b, IMG)
                       for b in cache.loader(16))
            res = evaluate_fusion(model, p, folded_state, batches, mode=0)
            m = round(summarize(res)[1], 4) if res else 0.0
            results[f"map50_{name}_{light}"] = m
            if name == "pallas_max_k256":
                # the eval runs at max_det=64 already (k256_cfg), so
                # this row IS the pallas_max_d64 preset's accuracy —
                # record it under both names
                results[f"map50_pallas_max_d64_{light}"] = m
            # (pallas_max_s01 was once aliased from the k128 row via the
            # r5b bit-identity gate; it is now a DIRECT variant above —
            # the measured row supersedes the alias)
            print(f"{name} {light}: mAP@0.5 = {m}", flush=True)
            _merge(results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
