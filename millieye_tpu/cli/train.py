"""Training CLI for all three stages.

Mirrors the reference's two train scripts (module2_mixed/train.py flags at
:26-96 for stages 1-2, module3_our_dataset/train.py:26-96 for stage 3) in
one entry point:

  python -m millieye_tpu.cli.train --stage yolo   --train_list paths.txt
  python -m millieye_tpu.cli.train --stage refine --train_list paths.txt \
      --pretrained yolo.weights
  python -m millieye_tpu.cli.train --stage fusion --data_root our_dataset \
      --pretrained_module2 module2.npz --test_list 0 --illumination H L
"""
from __future__ import annotations

import argparse

import jax

from millieye_tpu.cli._common import (build_darknet, build_fusion,
                                      build_refine, load_weights_any)
from millieye_tpu.data.datasets import (ImageListDataset, ExDarkDataset,
                                        RadarFusionDataset)
from millieye_tpu.data.loader import DataLoader, PaddedCollate
from millieye_tpu.train import recipes


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", choices=("yolo", "refine", "fusion"),
                   required=True)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--img_size", type=int, default=416)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--grad_accum", type=int, default=2)
    p.add_argument("--model_def", default=None,
                   help="darknet .cfg (defaults to built-in tiny-yolov3-12)")
    p.add_argument("--pretrained", default=None,
                   help=".weights/.pt/.pth/.npz to initialize from")
    p.add_argument("--pretrained_module2", default=None,
                   help="stage-3: module2 checkpoint to load+freeze")
    p.add_argument("--checkpoint", default=None, help="resume .npz")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--train_list", default=None,
                   help="stage 1/2: image path list file")
    p.add_argument("--exdark_root", default=None,
                   help="stage 1/2: ExDark dataset root (alternative)")
    p.add_argument("--data_root", default=None,
                   help="stage 3: our_dataset root")
    p.add_argument("--test_list", type=int, default=0,
                   help="stage 3: held-out scene fold (0-4)")
    p.add_argument("--illumination", nargs="+", default=["H", "L"])
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="train on N procedurally-labeled synthetic scenes "
                        "instead of a dataset root (data.synthetic)")
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--fold_frozen", action="store_true",
                   help="stage 3: BN-fold the frozen darknet in-step and "
                        "run the bf16 Pallas fused stem in the training "
                        "forward (measured +26%% step rate vs the stopgrad "
                        "step, BENCH_DETAILS train_step_b8_fold_stem_bf16; "
                        "exact for the eval-mode frozen base detector)")
    p.add_argument("--device_cache", action="store_true",
                   help="put the whole padded dataset on device once and "
                        "feed the step by on-device index gather "
                        "(data/device_cache.py) — kills input-pipeline "
                        "H2D from the step loop; incompatible with "
                        "--multiscale (fixed shapes)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=0, metavar="N",
                   help="shard the batch over N devices (jax.sharding "
                        "mesh; gradients all-reduced by GSPMD over ICI); "
                        "batch_size must be divisible by N")
    p.add_argument("--model_parallel", type=int, default=1, metavar="M",
                   help="additionally shard the wide 490/256-channel "
                        "layers over M devices (uses N*M devices total)")
    return p.parse_args(argv)


def _make_mesh(args):
    if not args.data_parallel and args.model_parallel <= 1:
        return None
    from millieye_tpu import parallel
    n = max(args.data_parallel, 1) * args.model_parallel
    if len(jax.devices()) < n:
        raise SystemExit(f"--data_parallel x --model_parallel needs {n} "
                         f"devices; {len(jax.devices())} visible")
    if args.batch_size % max(args.data_parallel, 1):
        raise SystemExit("batch_size must be divisible by --data_parallel")
    if args.device_cache:
        raise SystemExit("--device_cache caches on ONE device; drop it "
                         "when training over a mesh")
    return parallel.make_mesh(n, model_axis=args.model_parallel)


def _make_loader(dataset, args, max_targets=64, radar=False):
    kw = dict(max_targets=max_targets)
    if radar:
        kw.update(max_radar=32, max_points=256)
    if args.device_cache:
        if args.multiscale:
            raise SystemExit("--device_cache needs fixed shapes; "
                             "drop --multiscale")
        from millieye_tpu.data.device_cache import DeviceCache
        cache = DeviceCache.build(
            dataset, PaddedCollate(args.img_size, **kw))
        return cache.loader(args.batch_size, shuffle=True, seed=args.seed)
    collate = PaddedCollate(args.img_size, multiscale=args.multiscale, **kw)
    return DataLoader(dataset, args.batch_size, collate, shuffle=True,
                      seed=args.seed)


def main(argv=None):
    args = parse_args(argv)
    rng = jax.random.PRNGKey(args.seed)
    mesh = _make_mesh(args)

    if args.stage == "fusion":
        fkw = {}
        if args.fold_frozen:
            # the fold_stem train-step config (benchmarks/
            # train_stem_bench.py): folded frozen darknet + Pallas stem
            # pair in the training forward, conv compute bf16, loss/
            # decode f32. phase_s01 (bf16 patch scratches) measured
            # +13.2% over the phase spelling in a healthy relay window
            # (286.6 vs 253.1 steps/s b8), bit-identical numerics at
            # DEFAULT dots
            fkw = dict(hi_prec_stages=(0, 2, 4), pallas_stem=(0, 2),
                       pallas_pair=True, pallas_precision="default",
                       pallas_variant="phase_s01",
                       compute_dtype="bfloat16")
        model, params, state = build_fusion(args, **fkw)
        if args.pretrained:
            params["darknet"], state["darknet"] = load_weights_any(
                model.darknet, params["darknet"], state["darknet"],
                args.pretrained)
        if args.pretrained_module2:
            from millieye_tpu.io.torch_ckpt import (read_state_dict,
                                                    load_module2_pretrain)
            sd = read_state_dict(args.pretrained_module2)
            params, state, _frozen = load_module2_pretrain(params, state, sd)
        trainer = recipes.fusion_trainer(
            model, params, state, args.checkpoint_dir, lr=args.lr,
            every_k=args.grad_accum, mesh=mesh,
            fold_frozen=args.fold_frozen)
        if args.synthetic:
            from millieye_tpu.data.synthetic import SyntheticScenes
            dataset = SyntheticScenes(args.synthetic, seed=args.seed,
                                      illumination=tuple(args.illumination))
        else:
            dataset = RadarFusionDataset(args.data_root, "train",
                                         tuple(args.illumination),
                                         args.test_list)
        loader = _make_loader(dataset, args, radar=True)
        batch_fn = lambda b: recipes.fusion_device_batch(b, args.img_size)
    else:
        if args.synthetic:
            from millieye_tpu.data.synthetic import SyntheticScenes
            dataset = SyntheticScenes(args.synthetic, seed=args.seed,
                                      radar=False)
        elif args.exdark_root:
            dataset = ExDarkDataset(args.exdark_root, "train")
        else:
            dataset = ImageListDataset(args.train_list, augment=True)
        loader = _make_loader(dataset, args)
        batch_fn = lambda b: recipes.fusion_device_batch(b, args.img_size)
        if args.stage == "yolo":
            darknet = build_darknet(args.model_def, img_size=args.img_size)
            params, state = darknet.init(rng)
            if args.pretrained:
                params, state = load_weights_any(darknet, params, state,
                                                 args.pretrained)
            trainer = recipes.yolo_trainer(darknet, params, state,
                                           args.checkpoint_dir, lr=args.lr,
                                           every_k=args.grad_accum,
                                           mesh=mesh)
        else:
            model, params, state = build_refine(args)
            if args.pretrained:
                params["darknet"], state["darknet"] = load_weights_any(
                    model.darknet, params["darknet"], state["darknet"],
                    args.pretrained)
            trainer = recipes.refine_trainer(model, params, state,
                                             args.checkpoint_dir,
                                             lr=args.lr,
                                             every_k=args.grad_accum,
                                             mesh=mesh)

    if args.checkpoint:
        trainer.resume(args.checkpoint)
    trainer.fit(loader, args.epochs, rng, batch_fn)
    print("done:", trainer.save("final"))


if __name__ == "__main__":
    main()
