"""Extended TPU measurements beyond bench.py's single headline line.

Writes BENCH_DETAILS.json: batch-throughput sweep over backbone variants
(plain / space-to-depth stem / s2d+int8 weights) x dtype, stage-3
train-step rate. Run manually on the TPU host:

    python benchmarks/details.py

Timing methodology (this box): every window ends in a device->host fetch
of a small output — through the axon relay, ``block_until_ready`` can
return early while a remote compile is pending, so fetches are the only
reliable barrier.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _measure(f, args, iters=50, windows=3, fetch=lambda out: out[1]):
    import jax
    np.asarray(fetch(f(*args)))              # compile + completion barrier
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(fetch(out))               # fetch barrier
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


_OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_DETAILS.json")
_DROPPED_STALE = False


def _flush(results):
    """Merge ``results`` into BENCH_DETAILS.json. The first flush of a
    run drops every fusion_fwd_* key so a variant removed from VARIANTS
    can't linger with numbers from older code."""
    global _DROPPED_STALE
    merged = {}
    if os.path.exists(_OUT_PATH):
        with open(_OUT_PATH) as f:
            merged = json.load(f)
    if not _DROPPED_STALE:
        merged = {k: v for k, v in merged.items()
                  if not k.startswith("fusion_fwd_")}
        _DROPPED_STALE = True
    merged.update(results)
    merged["methodology"] = ("windows end in a D2H fetch; "
                             "block_until_ready alone can return early "
                             "through the relay during pending compiles")
    with open(_OUT_PATH, "w") as f:
        json.dump(merged, f, indent=1)
    return merged



def _require_chip():
    """Refuse to record benchmark rows from a CPU backend — the relay
    guard in __graft_entry__ can flip a subprocess to CPU mid-campaign
    (MILLIEYE_ALLOW_CPU=1 for deliberate dev runs)."""
    import jax
    if (jax.default_backend() == "cpu"
            and os.environ.get("MILLIEYE_ALLOW_CPU") != "1"):
        raise SystemExit("backend is cpu — refusing to record chip "
                         "benchmark results")


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g        # enables the compile cache
    _require_chip()
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.ops.quantize import quantize_darknet

    s = 416
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0])}

    def build(dtype, s2d=(), int8=False, int8_acts=False, hi_prec=(),
              hi_store=None, im2col=(), heads_dtype="float32",
              pallas_stem=(), pallas_pair=False, pallas_prec="highest",
              pair_variant="select", roi_impl="einsum",
              pallas_pairs="first", roi_reduce="dot", cfg_extra=None):
        darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=s),
                          img_size=s, s2d_stages=s2d, hi_prec_stages=hi_prec,
                          hi_prec_store=hi_store, im2col_stages=im2col,
                          pallas_stem_stages=pallas_stem,
                          pallas_stem_pair=pallas_pair,
                          pallas_stem_precision=pallas_prec,
                          pallas_stem_pair_variant=pair_variant,
                          pallas_stem_pairs=pallas_pairs)
        cfg = FusionConfig(compute_dtype=dtype, heads_dtype=heads_dtype,
                          roi_impl=roi_impl, roi_reduce=roi_reduce,
                          **(cfg_extra or {}))
        model = FusionNetwork(darknet, cfg)
        cpu = g._init_device()
        import contextlib
        with (jax.default_device(cpu) if cpu else contextlib.nullcontext()):
            params, state = model.init(jax.random.PRNGKey(0))
            cast = jnp.bfloat16 if dtype == "bfloat16" else None
            fp, fs = darknet.fold_batchnorm(params["darknet"],
                                            state["darknet"], dtype=cast)
            if s2d:
                fp = darknet.fold_s2d(fp)
            if im2col:
                fp = darknet.fold_im2col(fp)
            if int8:
                kw = {}
                if int8_acts:
                    # random-weight throughput run: any positive scales
                    # exercise the int8 MXU path (accuracy is measured
                    # separately on the trained net, quantized_eval.py).
                    # Float stem matches the accuracy-safe serving recipe
                    # (quantized_eval: full act-quant costs -0.13 dark
                    # mAP; float stem matches/beats f32 on both splits)
                    kw = dict(act_absmax=np.full(len(fp), 4.0, np.float32),
                              act_skip=tuple(darknet.act_int8_skip)
                              + (0, 2, 4))
                fp = quantize_darknet(fp, **kw)
        return model, dict(params, darknet=fp), dict(state, darknet=fs)

    def inputs(b):
        images = jnp.asarray(rng.uniform(size=(b, s, s, 3)), jnp.float32)
        maps = jnp.asarray(rng.uniform(size=(b, s // 16, s // 16, 3)),
                           jnp.float32)
        rb = np.zeros((b, 32, 4), np.float32)
        rb[..., :2] = rng.uniform(0.1, 0.5, size=(b, 32, 2))
        rb[..., 2:] = rb[..., :2] + 0.2
        return images, maps, jnp.asarray(rb), jnp.ones((b, 32), bool)

    # each cold compile costs ~10 min through the tunnel: spend them on
    # the parity config (f32 plain), the reference throughput config
    # (bf16 plain), the transform check (f32 s2d), and the serving ladder
    # (bf16 s2d -> +int8 weights -> +int8 activations)
    VARIANTS = (("float32", "plain", (), False, False, ()),
                ("bfloat16", "plain", (), False, False, ()),
                ("float32", "s2d", (0, 2), False, False, ()),
                ("bfloat16", "s2d", (0, 2), False, False, ()),
                ("bfloat16", "s2d_int8", (0, 2), True, False, ()),
                ("bfloat16", "s2d_int8_acts", (0, 2), True, True, ()),
                # dark-safe configs: bf16 with f32 stem conv arithmetic;
                # f32stem stores stem activations f32 (accurate but
                # HBM-bound), f16stem stores them f16 (same arithmetic,
                # bf16-like bandwidth)
                ("bfloat16", "f32stem", (), False, False, (0, 2, 4), None),
                ("bfloat16", "f16stem", (), False, False, (0, 2, 4),
                 "float16"),
                # im2col stem: patch matmul with full MXU lanes, no
                # lane-dim shuffle (stage-0 plain runs at ~2% lane use)
                ("bfloat16", "im2col", (), False, False, (), None, (0, 2)),
                ("bfloat16", "im2col_f16stem", (), False, False, (0, 2, 4),
                 "float16", (0, 2)),
                # + bf16 heads: the 2.2 ms f32 tail (score maps, RoI
                # einsums, refinement/ensemble) in bf16 too
                ("bfloat16", "bf16_heads", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16"),
                # + Pallas fused conv+pool stem on stages 0/2 (full-res
                # intermediates stay in VMEM; f32 stem arithmetic free)
                ("bfloat16", "pallas_stem", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2)),
                # stage 4 too (104px, auto band=8) — standalone stem
                # bench won 1.9x at stages 0/1; s4 is the next largest
                ("bfloat16", "pallas_stem_s4", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2, 4)),
                # double-fused pair (ONE kernel for stages 0+2, VMEM-
                # resident intermediate) with one-pass bf16 conv dots —
                # on-chip standalone: 3493 us vs 8499 us XLA for the pair
                ("bfloat16", "pallas_stem2", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default"),
                # precision ablation: same pair at true-f32 dots
                ("bfloat16", "pallas_stem2_hp", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "highest"),
                # phase-grouped pair spelling: pool as lane-block maxes,
                # no select matmuls (standalone: 2787 vs 3072 us b32)
                ("bfloat16", "pallas_phase", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default",
                 "phase"),
                # + VMEM-resident Pallas RoI crops (ops/roi_pallas.py)
                ("bfloat16", "pallas_max", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default",
                 "phase", "pallas"),
                # + stage 4 via the single-stage planar kernel (r3 gate:
                # 867 vs 1515 us xla_default standalone; stage 6 stays
                # XLA — 83 us, 11x faster than the kernel at that shape)
                ("bfloat16", "pallas_max4", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2, 4), True, "default",
                 "phase", "pallas"),
                # + stage-0 K-packed stem (fused_stem2_packed)
                ("bfloat16", "pallas_packed", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default",
                 "packed", "pallas"),
                # + s2d stage 1 (fused_stem2_s2d)
                ("bfloat16", "pallas_s2d", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default",
                 "s2d", "pallas"),
                # + full-M 128-row stage-0 superbands
                ("bfloat16", "pallas_s2d8", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default",
                 "s2d8", "pallas"),
                # + deep stem: stages 4/6 through the generic planar
                # kernel on top of the s2d pair (gated by
                # stem_pallas_check.py deep before e2e measurement)
                ("bfloat16", "pallas_deep", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2, 4, 6), True, "default",
                 "s2d", "pallas"),
                # + the deep PAIR: stages 4+6 as ONE s2d kernel (g0=2)
                ("bfloat16", "pallas_pair2", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2, 4, 6), True, "default",
                 "s2d", "pallas", "all"),
                # pallas_max + the VPU segmented reduce in the RoI
                # kernels (the S-matrix matmul was half the img crop's
                # MXU passes) — round-4 RoI-slice candidate
                ("bfloat16", "pallas_maxv", (), False, False, (0, 2, 4),
                 "float16", (), "bfloat16", (0, 2), True, "default",
                 "phase", "pallas", "first", "vpu"),
                # pallas_max with the NMS candidate set halved to 256 —
                # provably lossless at the serving conf 0.2 on 100% of
                # both test splits (PRE_TOPK_SUFFICIENCY.json); the
                # measured NMS block shrinks 734 -> 475 us b32
                ("bfloat16", "pallas_max_k256", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase", "pallas", "first", "dot",
                 {"pre_nms_top_k": 256}),
                # + detections_per_img 64 (the accuracy tables' own
                # operating point — quantized_eval scores at max_det=64;
                # post-NMS survivors peak at 14 at conf 0.2): the RoI
                # slice shrinks 232 -> 96 proposal rows
                ("bfloat16", "pallas_max_d64", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase", "pallas", "first", "dot",
                 {"pre_nms_top_k": 256, "max_det": 64}),
                # + top-128 NMS candidates (sufficient_k128_d64 = 100%
                # both splits): the blocked keepmask is ONE block
                ("bfloat16", "pallas_max_k128", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                # k128/d64 with the K-packed pair kernel, f32 scratches
                # (identical numerics to phase at DEFAULT dots; the f32
                # form is chip-proven at HIGHEST — r4 gate 5061 us)
                ("bfloat16", "pallas_max_pk", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "packed", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                # k128/d64 with the s2d pair kernel, f32 scratches
                ("bfloat16", "pallas_max_s2d", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "s2d", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                # bf16-scratch twins (half the patch-fill traffic; need
                # the r5 DMA tile-alignment fix to compile on-chip) —
                # only run when named EXACTLY in MILLIEYE_ONLY
                ("bfloat16", "pallas_max_bf16s", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase_bf16s", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                ("bfloat16", "pallas_max_pk_bf16s", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "packed_bf16s", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                ("bfloat16", "pallas_max_s2d_bf16s", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "s2d_bf16s", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                # bf16 patch scratches over the f32 DMA (the two chip-
                # proven bf16 buffers from the r5 bisect)
                ("bfloat16", "pallas_max_s01", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase_s01", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                # stem input as a pipelined VMEM block (no user DMA);
                # the _bf16s twin also halves the input HBM read
                ("bfloat16", "pallas_max_vm", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase_vmem", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                ("bfloat16", "pallas_max_vm_s01", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase_vmem_s01", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}),
                ("bfloat16", "pallas_max_vm_bf16s", (), False, False,
                 (0, 2, 4), "float16", (), "bfloat16", (0, 2), True,
                 "default", "phase_vmem_bf16s", "pallas", "first", "dot",
                 {"pre_nms_top_k": 128, "max_det": 64}))
    global _DROPPED_STALE
    # comma-separated EXACT variant names: substring matching would pull
    # pallas_s2d8 into a MILLIEYE_ONLY=pallas_s2d rerun — an extra ~10 min
    # cold compile per run, or a gate-REJECTED kernel compiled on-chip
    only = [t for t in os.environ.get("MILLIEYE_ONLY", "").split(",") if t]
    if only:
        # partial rerun (e.g. MILLIEYE_ONLY=pallas_max after a late-
        # variant compile failure): keep every measured fusion_fwd_* row
        _DROPPED_STALE = True
    for dtype, vname, s2d, int8, acts, *rest in VARIANTS:
        if only and vname not in only:
            continue
        if vname.endswith("_bf16s") and vname not in only:
            # bf16-scratch twins crashed the remote compile helper
            # pre-fix (r4 gate) — a pathological Mosaic compile can
            # wedge the terminal, so they never ride a full sweep;
            # name them EXACTLY in MILLIEYE_ONLY after the
            # stem_pallas_check gate passes them
            continue
        if vname.startswith("pallas_stem") and not os.environ.get(
                "MILLIEYE_PALLAS_STEM"):
            # opt-in: a pathological Mosaic compile of this kernel can
            # wedge the remote compile terminal for hours (round-3
            # incident); probe benchmarks/stem_pallas_check.py in a
            # timeout-guarded subprocess first, then set
            # MILLIEYE_PALLAS_STEM=1
            print("skipping pallas_stem (set MILLIEYE_PALLAS_STEM=1)",
                  flush=True)
            continue
        hi = rest[0] if rest else ()
        hi_store = (jnp.float16 if len(rest) > 1 and rest[1] else None)
        im2col = rest[2] if len(rest) > 2 else ()
        heads_dtype = rest[3] if len(rest) > 3 else "float32"
        pallas_stem = rest[4] if len(rest) > 4 else ()
        pallas_pair = rest[5] if len(rest) > 5 else False
        pallas_prec = rest[6] if len(rest) > 6 else "highest"
        pair_variant = rest[7] if len(rest) > 7 else "select"
        roi_impl = rest[8] if len(rest) > 8 else "einsum"
        pallas_pairs = rest[9] if len(rest) > 9 else "first"
        roi_reduce = rest[10] if len(rest) > 10 else "dot"
        cfg_extra = rest[11] if len(rest) > 11 else None
        model, params, state = build(dtype, s2d, int8, acts, hi, hi_store,
                                     im2col, heads_dtype, pallas_stem,
                                     pallas_pair, pallas_prec,
                                     pair_variant, roi_impl, pallas_pairs,
                                     roi_reduce, cfg_extra)

        def fwd(i, m, r, v):
            out = model.apply(params, state, i, m, r, v, mode=0)
            return out["boxes"], out["valid"]

        step = jax.jit(fwd)
        for b in (1, 32):
            dt = _measure(step, inputs(b),
                          iters=(100 if b == 1 else 30))
            key = f"fusion_fwd_{dtype}_{vname}_b{b}_fps"
            results[key] = round(b / dt, 1)
            print(f"{key}: {results[key]}", flush=True)
        _flush(results)  # partial write: a wedged late compile (the
        # pallas variants run last) must not lose earlier measurements

    # device latency (scan-amortized): the tunnel's ~1 ms per-program
    # dispatch floor hides b1 gains in wall-clock fps; K chained
    # executions inside one program measure what the chip itself does
    from benchmarks.backbone_profile import bench_scanned
    for vname, s2d, int8, acts in (() if only else
                                   (("plain", (), False, False),
                                    ("s2d", (0, 2), False, False),
                                    ("s2d_int8_acts", (0, 2), True, True))):
        model, params, state = build("float32", s2d, int8, acts)
        i1, m1, r1, v1 = inputs(1)

        def fused(img, _m=model, _p=params, _s=state, _mm=m1, _r=r1, _v=v1):
            out = _m.apply(_p, _s, img, _mm, _r, _v, mode=0)
            # scalar-ish carry dependency comes from boxes
            return out["boxes"]

        td = bench_scanned(fused, i1, k=20)
        results[f"fusion_device_latency_{vname}_b1_us"] = round(td * 1e6, 1)
        print(f"device latency {vname} b1: {td*1e6:.0f}us", flush=True)

    # stage-3 train step (frozen subtrees, grad accumulation off for a
    # clean per-step number)
    if only and "train" not in only:
        # filtered rerun: the non-variant sections' numbers are already
        # in the file; just regenerate the MFU table over the merge
        # (MILLIEYE_ONLY=train runs ONLY the train-step section below)
        _mfu_and_finish(results)
        return
    from millieye_tpu.train import (frozen_adam, STAGE3_FROZEN,
                                    make_fusion_train_step)
    from millieye_tpu.train.steps import init_train_state
    from millieye_tpu.models import Darknet, tiny_yolov3_defs

    b = 8
    images, maps, rb, rv = inputs(b)
    tg = np.zeros((b, 16, 5), np.float32)
    tg[..., 1:3] = rng.uniform(0.3, 0.7, (b, 16, 2))
    tg[..., 3:5] = rng.uniform(0.1, 0.2, (b, 16, 2))
    batch = {"images": images, "radar_maps": maps, "radar_boxes": rb,
             "rmask": rv, "targets": jnp.asarray(tg),
             "tmask": jnp.ones((b, 16), bool)}
    key = jax.random.PRNGKey(0)

    def build_train(dtype, pallas=False):
        """RAW (unfolded) params — the production Trainer's starting
        point. ``pallas`` arms the fused-stem pair for the fold_frozen
        step variant."""
        import contextlib
        dn_kw = {}
        if pallas:
            dn_kw = dict(hi_prec_stages=(0, 2, 4),
                         pallas_stem_stages=(0, 2), pallas_stem_pair=True,
                         pallas_stem_precision="default",
                         pallas_stem_pair_variant="phase")
        darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=s),
                          img_size=s, **dn_kw)
        model = FusionNetwork(darknet, FusionConfig(compute_dtype=dtype))
        cpu = g._init_device()
        with (jax.default_device(cpu) if cpu else contextlib.nullcontext()):
            params, state = model.init(jax.random.PRNGKey(0))
        return model, params, state

    # train-step variants (VERDICT r4 #6): the round-3 step computed the
    # FROZEN darknet's backward and threw it away; "stopgrad" prunes it,
    # "bf16" runs the conv compute in bfloat16 (decode/loss f32),
    # "fold_stem" BN-folds the frozen darknet in-step so the Pallas
    # fused stem runs inside the training forward
    TRAIN_VARIANTS = (
        ("plain", dict(dtype="float32", frozen=(), fold=False,
                       pallas=False)),
        ("stopgrad", dict(dtype="float32", frozen=STAGE3_FROZEN,
                          fold=False, pallas=False)),
        ("stopgrad_bf16", dict(dtype="bfloat16", frozen=STAGE3_FROZEN,
                               fold=False, pallas=False)),
        ("fold_stem_bf16", dict(dtype="bfloat16", frozen=STAGE3_FROZEN,
                                fold=True, pallas=True)),
    )
    for tname, kw in TRAIN_VARIANTS:
        if (tname != "plain"
                and not os.environ.get("MILLIEYE_TRAIN_VARIANTS")):
            continue            # each is a ~10 min cold compile; the
                                # campaign opts in (MILLIEYE_TRAIN_VARIANTS=1)
        model, params, state = build_train(kw["dtype"], kw["pallas"])
        tx = frozen_adam(params, lr=5e-4, frozen_prefixes=STAGE3_FROZEN)
        ts = init_train_state(params, state, tx)
        step = jax.jit(make_fusion_train_step(
            model, tx, frozen_prefixes=kw["frozen"],
            fold_frozen=kw["fold"]), donate_argnums=(0,))
        ts, metrics = step(ts, batch, key)       # compile
        np.asarray(metrics["loss"])              # completion barrier
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            ts, metrics = step(ts, batch, key)
        np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
        suffix = "" if tname == "plain" else f"_{tname}"
        results[f"train_step_b8{suffix}_steps_per_s"] = round(1 / dt, 2)
        results[f"train_step_b8{suffix}_imgs_per_s"] = round(b / dt, 1)
        print(f"train step b8 {tname}: {1/dt:.2f} steps/s", flush=True)

    _mfu_and_finish(results)


def _mfu_and_finish(results, s=416):
    """MFU ledger (VERDICT r2 #7): analytic FLOPs/frame + per-variant
    model FLOPs utilization against the dtype's matmul peak — computed
    over the MERGED file so a filtered rerun keeps every variant's row."""
    from benchmarks.flops import fusion_flops, mfu, PEAK_FLOPS
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionNetwork
    fl = fusion_flops(FusionNetwork(
        Darknet(tiny_yolov3_defs(num_classes=12, img_size=s), img_size=s)))
    results["flops_per_frame"] = {k: round(v / 1e9, 3) for k, v in
                                  fl.items()}
    results["peak_tflops"] = {k: v / 1e12 for k, v in PEAK_FLOPS.items()}
    merged = _flush(results)
    mfu_tbl = {}
    for key, val in merged.items():
        if not (key.startswith("fusion_fwd_") and key.endswith("_fps")):
            continue
        dt = "bfloat16" if "bfloat16" in key else "float32"
        mfu_tbl[key.replace("_fps", "_mfu_pct")] = round(
            100 * mfu(val, fl["total"], dt), 2)
    # train-step ledger (VERDICT r4 #6): imgs/s x train FLOPs/img
    # against the variant dtype's matmul peak, both denominators
    from benchmarks.flops import fusion_train_flops
    tf = fusion_train_flops(FusionNetwork(
        Darknet(tiny_yolov3_defs(num_classes=12, img_size=s),
                img_size=s)))
    mfu_tbl["train_flops_per_img"] = {k: round(v / 1e9, 3)
                                      for k, v in tf.items()}
    for key, val in merged.items():
        if not (key.startswith("train_step_b8")
                and key.endswith("_imgs_per_s")):
            continue
        dt = "bfloat16" if "bf16" in key else "float32"
        den = ("train_full_bwd" if key == "train_step_b8_imgs_per_s"
               else "train_pruned")
        mfu_tbl[key.replace("_imgs_per_s", "_mfu_pct")] = round(
            100 * mfu(val, tf[den], dt), 2)
    merged = _flush({"mfu": mfu_tbl})
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
