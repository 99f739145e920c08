"""Evaluation CLI: the three reference eval scripts in one entry point.

  python -m millieye_tpu.cli.evaluate --what yolo   --train_list t.txt ...
      (module2_mixed/test_mixed.py — raw Darknet + NMS mAP)
  python -m millieye_tpu.cli.evaluate --what refine ...
      (module2_mixed/test_module2.py — YOLO + refinement mAP)
  python -m millieye_tpu.cli.evaluate --what fusion --data_root root \
      --model_mode 0 --illumination L --test_list 0
      (module3_our_dataset/test_fusion.py — per-mode/illumination fusion
      mAP with 5-fold scene cross-validation)
"""
from __future__ import annotations

import argparse

from millieye_tpu.cli._common import (build_darknet, build_fusion,
                                      build_refine, load_weights_any)
from millieye_tpu.data.datasets import (ImageListDataset, ExDarkDataset,
                                        RadarFusionDataset)
from millieye_tpu.data.loader import DataLoader, PaddedCollate
from millieye_tpu.eval import harness
from millieye_tpu.train.recipes import fusion_device_batch


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--what", choices=("yolo", "refine", "fusion"),
                   required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--model_def", default=None)
    p.add_argument("--img_size", type=int, default=416)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iou_thresh", type=float, default=0.5)
    p.add_argument("--conf_thresh", type=float, default=0.5)
    p.add_argument("--nms_thresh", type=float, default=0.5)
    p.add_argument("--class_names", default=None)
    p.add_argument("--train_list", default=None)
    p.add_argument("--exdark_root", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--test_list", type=int, default=0)
    p.add_argument("--illumination", nargs="+", default=["L"])
    p.add_argument("--model_mode", type=int, default=0,
                   help="0 millieye / 1 yolo / 2 radar / 3 auto")
    p.add_argument("--plot", default=None,
                   help="write the global PR curve to this path "
                        "(test_fusion.py plot/pr_*.jpg equivalent)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="evaluate on N synthetic scenes (seed 777) "
                        "instead of a dataset root")
    from millieye_tpu.cli._common import SERVING_PRESETS
    p.add_argument("--serving", default="f32",
                   choices=sorted(SERVING_PRESETS),
                   help="fusion only: serving preset to evaluate the "
                        "accuracy of (cli._common.SERVING_PRESETS; "
                        "int8_acts calibrates on the first eval batches)")
    p.add_argument("--device_cache", action="store_true",
                   help="stage the whole eval set on device once "
                        "(data/device_cache.py) — one H2D put instead "
                        "of per-batch transfers")
    p.add_argument("--data_parallel", type=int, default=0, metavar="N",
                   help="fusion only: shard eval batches over N devices "
                        "(params replicated); batch_size must be "
                        "divisible by N")
    return p.parse_args(argv)


def _make_loader(dataset, args, radar=False):
    kw = dict(max_targets=64)
    if radar:
        kw.update(max_radar=32, max_points=256)
    if args.device_cache:
        # tail batches are padded to the fixed shape and trimmed by the
        # harness via batch["_n"] — no divisibility requirement
        from millieye_tpu.data.device_cache import DeviceCache
        cache = DeviceCache.build(dataset,
                                  PaddedCollate(args.img_size, **kw))
        return cache.loader(args.batch_size)
    return DataLoader(dataset, args.batch_size,
                      PaddedCollate(args.img_size, **kw))


def _batches(loader, img_size):
    for b in loader:
        yield fusion_device_batch(b, img_size)


def main(argv=None):
    args = parse_args(argv)
    names = None
    if args.class_names:
        from millieye_tpu.io.config import load_classes
        names = load_classes(args.class_names)

    if args.what == "fusion":
        from millieye_tpu.cli._common import serving_overrides
        s2d, hi_prec, hi_store, pallas_kw, over = serving_overrides(
            args.serving)
        model, params, state = build_fusion(
            args, s2d_stages=s2d, hi_prec_stages=hi_prec,
            hi_prec_store=hi_store, **pallas_kw,
            conf_thresh=args.conf_thresh,
            nms_thresh=args.nms_thresh, **over)
        params, state = _load_fusion(model, params, state, args.weights)
        if args.synthetic:
            from millieye_tpu.data.synthetic import SyntheticScenes
            dataset = SyntheticScenes(args.synthetic, seed=777,
                                      illumination=tuple(args.illumination))
        else:
            dataset = RadarFusionDataset(args.data_root, "test",
                                         tuple(args.illumination),
                                         args.test_list)
        loader = _make_loader(dataset, args, radar=True)
        if args.serving != "f32":
            from millieye_tpu.runtime.engine import fold_for_serving
            act_absmax = None
            if model.cfg.acts_int8:
                act_absmax = _calibrate_on_eval_set(model, params, state,
                                                    loader, args.img_size)
            params, state = fold_for_serving(model, params, state,
                                             act_absmax)
        mesh = None
        if args.data_parallel:
            import jax
            from millieye_tpu import parallel
            if len(jax.devices()) < args.data_parallel:
                raise SystemExit(
                    f"--data_parallel {args.data_parallel} needs that many "
                    f"devices; {len(jax.devices())} visible")
            if args.batch_size % args.data_parallel:
                raise SystemExit("batch_size must be divisible by "
                                 "--data_parallel")
            mesh = parallel.make_mesh(args.data_parallel, model_axis=1)
        result = harness.evaluate_fusion(
            model, params, state, _batches(loader, args.img_size),
            mode=args.model_mode, iou_thresh=args.iou_thresh, mesh=mesh)
    else:
        if args.synthetic:
            from millieye_tpu.data.synthetic import SyntheticScenes
            dataset = SyntheticScenes(args.synthetic, seed=777,
                                      illumination=tuple(args.illumination),
                                      radar=False)
        elif args.exdark_root:
            dataset = ExDarkDataset(args.exdark_root, "test")
        else:
            dataset = ImageListDataset(args.train_list)
        loader = _make_loader(dataset, args)
        if args.what == "yolo":
            darknet = build_darknet(args.model_def, img_size=args.img_size)
            import jax
            params, state = darknet.init(jax.random.PRNGKey(0))
            params, state = load_weights_any(darknet, params, state,
                                             args.weights)
            result = harness.evaluate_yolo(
                darknet, params, state, _batches(loader, args.img_size),
                conf_thresh=args.conf_thresh, nms_thresh=args.nms_thresh,
                iou_thresh=args.iou_thresh)
        else:
            model, params, state = build_refine(
                args, conf_thresh=args.conf_thresh,
                nms_thresh=args.nms_thresh)
            params, state = _load_fusion(model, params, state, args.weights)
            result = harness.evaluate_refine(
                model, params, state, _batches(loader, args.img_size),
                iou_thresh=args.iou_thresh)

    table, m_ap = harness.summarize(result, names)
    print(table)
    if args.plot:
        out = harness.save_pr_curve(result, args.plot,
                                    title=f"{args.what} iou={args.iou_thresh}")
        if out:
            print("pr-curve:", out)
    return m_ap


def _calibrate_on_eval_set(model, params, state, loader, img_size,
                           n_batches=4):
    """Int8-activation calibration over the first eval batches (folded
    graph, same transforms as serving)."""
    import jax.numpy as jnp
    from millieye_tpu.ops.quantize import calibrate_act_scales

    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    if model.darknet.s2d_stages:
        fp = model.darknet.fold_s2d(fp)
    images = []
    for i, b in enumerate(loader):
        images.append(jnp.asarray(b["images"]))
        if i + 1 >= n_batches:
            break
    return calibrate_act_scales(model.darknet, fp, fs, images)


def _load_fusion(model, params, state, path):
    from millieye_tpu.cli._common import load_weights_any as lwa
    import os
    if os.path.splitext(path)[1] in (".pt", ".pth", ".npz"):
        return lwa(model, params, state, path)
    # darknet .weights only covers the backbone
    params["darknet"], state["darknet"] = lwa(
        model.darknet, params["darknet"], state["darknet"], path)
    return params, state


if __name__ == "__main__":
    main()
