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


def _bench_scanned_eps(op, x, k=10, windows=3):
    """``bench_scanned`` with a NON-foldable chain: the stock variant's
    ``carry + 0*max(y)`` dependency is algebraically 0*x and XLA's
    simplifier may fold it, hoisting the op out of the scan (the r4
    fusion_tail score_maps row measured 0.0 µs that way). A tiny nonzero
    epsilon keeps the dependency real while leaving the computed values
    (and therefore the measured kernels) unchanged after rounding."""
    import jax
    from jax import lax
    from benchmarks.backbone_profile import bench

    def body(carry, _):
        y = op(carry)
        eps = jnp.asarray(1e-30, carry.dtype)
        return carry + eps * jnp.max(y).astype(carry.dtype), jnp.max(y)

    @jax.jit
    def many(x0):
        _, ys = lax.scan(body, x0, None, length=k)
        return ys

    @jax.jit
    def once(x0):
        _, ys = lax.scan(body, x0, None, length=1)
        return ys

    t_many = bench(many, (x,), iters=5, windows=windows)
    t_once = bench(once, (x,), iters=5, windows=windows)
    return max((t_many - t_once) / (k - 1), 0.0)


def _tail_profile(model, params, state, x, maps, rb, rmask, cd, results,
                  b, dtype):
    """Decompose the RoI+heads tail (``full - backbone_nms``) into
    score-map convs / RoI crops / head matmuls via CUMULATIVE graph
    prefixes (score -> +crops -> +heads), all from the same device-
    resident feature map: each stage row is the delta between successive
    prefixes, so the rows PLUS the assembly/decode remainder sum to the
    in-graph tail by construction (the r3 standalone-program rows had
    their own fusion/DCE and overstated the in-graph cost by ~0.8 ms).
    Run with ``tail`` argv.

    bf16_heads barely moves the e2e number (BENCH_DETAILS: 3200 -> 3223
    fps b32), so the tail is overhead-bound, not FLOP-bound — this
    pinpoints which stage to attack.
    """
    from millieye_tpu.models import heads
    from millieye_tpu.ops.nms import batched_nms
    from millieye_tpu.ops.roi_align import (ps_roi_align_batched,
                                            roi_align_batched)

    cfg = model.cfg
    b_sz, img_size = x.shape[0], x.shape[1]
    k_img, r_rad = cfg.max_det, cfg.max_radar

    # device-resident intermediates, computed once
    d_out = jax.jit(lambda img: model.darknet.apply(
        params["darknet"], state["darknet"], img, compute_dtype=cd))(x)
    feature_map = d_out["feature_map"]
    det, det_valid = jax.jit(lambda d: batched_nms(
        d, cfg.conf_thresh, cfg.nms_thresh, max_det=k_img,
        pre_top_k=cfg.pre_nms_top_k))(d_out["detections"])
    all_xyxy = jnp.concatenate([det[:, :, 0:4], rb * img_size], axis=1)
    flat_valid = jnp.concatenate(
        [det_valid, rmask], axis=1).reshape(-1)

    # mirror fusion.py — the feature map AND the head params are cast to
    # the heads dtype before the score-map convs (the round-3 tail rows
    # measured f32 params under a bf16 label, one source of the −749 µs
    # "residual"; the other is that each row is a SEPARATE program whose
    # fusion/DCE differs from the full graph — the rows are directional,
    # not additive, and the reconciliation line below makes the gap
    # explicit instead of leaving a negative residual in the record)
    hd = jnp.dtype(cfg.heads_dtype)
    if hd != jnp.float32:
        from millieye_tpu.models.fusion import _cast_floats
        params = dict(params)
        state = dict(state)
        for k2 in ("img_cnn", "radar_enc", "refine"):
            params[k2] = _cast_floats(params[k2], hd)
            if k2 in state:
                state[k2] = _cast_floats(state[k2], hd)
        params["ensemble"] = _cast_floats(params["ensemble"], hd)

    def _dep(a, b2):
        """a + eps*max(b2): couples b2's computation into the output
        without changing a's values after rounding — NOT 0*x, which the
        simplifier folds (DCE'ing b2's stage entirely)."""
        return a + jnp.asarray(1e-30, a.dtype) * jnp.max(b2).astype(a.dtype)

    n_all = k_img + r_rad

    def p_score(fm):
        roi_sm, _ = heads.conv_bn_stack_apply(
            params["img_cnn"], state["img_cnn"], fm.astype(hd), False)
        rad_sm, _ = heads.radar_encoder_apply(
            params["radar_enc"], state["radar_enc"], maps.astype(hd), False)
        return roi_sm, rad_sm

    def p_crops(fm):
        roi_sm, rad_sm = p_score(fm)
        ic = ps_roi_align_batched(roi_sm, all_xyxy, (7, 7), 1.0 / 16,
                                  sampling_max=cfg.sampling_max)
        rc = roi_align_batched(rad_sm, all_xyxy, (7, 7), 1.0 / 16,
                               sampling_max=cfg.sampling_max)
        return (ic.astype(hd).reshape(b_sz * n_all, 7, 7, -1),
                rc.astype(hd).reshape(b_sz * n_all, 7, 7, -1))

    def p_heads(fm):
        ic, rc = p_crops(fm)
        regress, refine, _ = heads.refinement_head_apply(
            params["refine"], state["refine"], rc, ic,
            valid=flat_valid.astype(ic.dtype), train=False,
            class_num=cfg.class_num)
        return regress, refine

    prefixes = (("score_maps", lambda fm: _dep(*p_score(fm))),
                ("roi_crops", lambda fm: _dep(*p_crops(fm))),
                ("heads", lambda fm: _dep(*p_heads(fm))))
    prev = 0.0
    for name, fn in prefixes:
        t = _bench_scanned_eps(fn, feature_map, k=10)
        key = f"fusion_tail_{dtype}_b{b}_{name}_us"
        results[key] = round(max(t - prev, 0.0) * 1e6, 1)
        prev = t
        print(f"{key}: {results[key]} (prefix total {t*1e6:.1f})",
              flush=True)
    return results



def _require_chip():
    """Refuse to record benchmark rows from a CPU backend — the relay
    guard in __graft_entry__ can flip a subprocess to CPU mid-campaign
    (MILLIEYE_ALLOW_CPU=1 for deliberate dev runs)."""
    import jax
    if (jax.default_backend() == "cpu"
            and os.environ.get("MILLIEYE_ALLOW_CPU") != "1"):
        raise SystemExit("backend is cpu — refusing to record chip "
                         "benchmark results")


def main(b=32, dtype="bfloat16"):
    _require_chip()
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.ops.nms import batched_nms

    s = 416
    # MILLIEYE_SERVING=<preset>: decompose a serving-ladder config (the
    # campaign profiles the measured-fastest one) instead of the plain
    # build; the preset then owns compute/heads dtype and the kernels
    serving = os.environ.get("MILLIEYE_SERVING") or None
    model, params, state = g._build_fusion(s, max_det=200, max_radar=32,
                                           pre_top_k=512, serving=serving)
    if serving:
        dtype = serving
        cd = (jnp.bfloat16
              if str(model.cfg.compute_dtype) == "bfloat16"
              else jnp.float32)
    else:
        cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    cpu = g._init_device()
    import contextlib
    with (jax.default_device(cpu) if cpu else contextlib.nullcontext()):
        fp, fs = model.darknet.fold_batchnorm(
            params["darknet"], state["darknet"],
            dtype=cd if cd == jnp.bfloat16 else None)
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    if not serving:
        cfg = FusionConfig(compute_dtype=dtype)
        model = FusionNetwork(model.darknet, cfg)
    else:
        cfg = model.cfg

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
        # the config's own NMS operating point (k256/d64 presets shrink
        # pre_top_k / max_det — the prefix must match the full graph)
        out, valid = batched_nms(det, cfg.conf_thresh, cfg.nms_thresh,
                                 max_det=cfg.max_det,
                                 pre_top_k=cfg.pre_nms_top_k)
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

    if "tail" in sys.argv and serving:
        print("tail mode spells the RoI stage as the einsum kernels — "
              "skipping under a serving preset (roi_impl may differ)",
              flush=True)
    elif "tail" in sys.argv:
        _tail_profile(model, params, state, x, maps, rb, rmask, cd,
                      results, b, dtype)
        known = sum(results[f"fusion_tail_{dtype}_b{b}_{n}_us"]
                    for n in ("score_maps", "roi_crops", "heads"))
        # the rows are cumulative-prefix deltas, so they sum to the last
        # prefix's total by construction; the remainder vs the in-graph
        # tail is the decode/box-regression/assembly/sort cost the
        # prefixes don't include — a stage of its own, and the four rows
        # together equal full - backbone_nms
        results[f"fusion_tail_{dtype}_b{b}_assembly_remainder_us"] = round(
            tail - known, 1)
        results["fusion_tail_note"] = (
            "rows are cumulative-prefix deltas (score -> +crops -> "
            "+heads) and sum with the remainder to full - backbone_nms; "
            "score_maps/heads are <=60 us at b32 — below the relay "
            "window noise, so their deltas can clamp to 0 and the "
            "remainder absorbs the difference (crops own the tail)")
        results.pop(f"fusion_tail_{dtype}_b{b}_residual_us", None)
        results.pop(f"fusion_tail_{dtype}_b{b}_reconciliation_us", None)
        print(f"tail = score+crops+heads {known:.1f} us + "
              f"assembly remainder {tail - known:.1f} us", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    # retired keys (the standalone-row decompositions that didn't add up)
    merged.pop(f"fusion_tail_{dtype}_b{b}_residual_us", None)
    if "tail" in sys.argv and not serving:
        merged.pop(f"fusion_tail_{dtype}_b{b}_reconciliation_us", None)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
