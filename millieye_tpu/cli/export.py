"""AOT serving-artifact export CLI.

  python -m millieye_tpu.cli.export --out fusion_serving.mlir \
      --weights fusion.npz --serving bf16_f16stem --batch 1 [--tpu]

Builds the fusion model at the chosen serving preset, loads weights,
folds BN, bakes everything into one self-contained StableHLO blob
(``io/export.py``) and optionally round-trip-verifies it against the
live graph on random inputs. The deployment side needs only jax + the
blob (``millieye_tpu.io.export.load_serving``) — the TPU-native
replacement for the reference's ship-the-python-code deployment
(``run_mp.py`` + ``.pth``).
"""
from __future__ import annotations

import argparse

import numpy as np

from millieye_tpu.cli._common import (SERVING_PRESETS, build_fusion,
                                      serving_overrides)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="output blob path")
    p.add_argument("--weights", default=None,
                   help=".npz / .pt / .pth / darknet .weights")
    p.add_argument("--serving", default="f32",
                   choices=sorted(SERVING_PRESETS))
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--mode", type=int, default=0)
    p.add_argument("--img_size", type=int, default=416)
    p.add_argument("--tpu", action="store_true",
                   help="cross-lower for TPU (XLA presets only; the "
                        "pallas presets must be exported on a TPU "
                        "backend)")
    p.add_argument("--verify", action="store_true",
                   help="deserialize and compare against the live "
                        "graph on random inputs before writing")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from millieye_tpu.io.export import export_serving, load_serving

    args = parse_args(argv)
    s2d, hi, store, pallas_kw, over = serving_overrides(args.serving)
    model, params, state = build_fusion(
        args, s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, **over)
    if args.weights:
        from millieye_tpu.cli.evaluate import _load_fusion
        params, state = _load_fusion(model, params, state, args.weights)
    cast = (jnp.bfloat16 if model.cfg.compute_dtype == "bfloat16"
            else None)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"], dtype=cast)
    if s2d:
        fp = model.darknet.fold_s2d(fp)
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    # numpy checkpoint leaves -> jax arrays: the eager --verify apply
    # (and constant-baking export) needs jax weak-type promotion — see
    # io/export.py:export_serving
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    platforms = ("tpu",) if args.tpu else None
    blob = export_serving(model, params, state, batch_size=args.batch,
                          mode=args.mode, platforms=platforms)

    if args.verify and not args.tpu:
        rng = np.random.default_rng(0)
        s, r = model.darknet.img_size, model.cfg.max_radar
        b = args.batch
        imgs = jnp.asarray(rng.uniform(size=(b, s, s, 3)), jnp.float32)
        maps = jnp.asarray(rng.uniform(size=(b, s // 16, s // 16, 3)),
                           jnp.float32)
        rb = np.zeros((b, r, 4), np.float32)
        rb[..., :2] = rng.uniform(0.1, 0.5, size=(b, r, 2))
        rb[..., 2:] = rb[..., :2] + 0.3
        rb = jnp.asarray(rb)
        rm = jnp.ones((b, r), bool)
        live = model.apply(params, state, imgs, maps, rb, rm,
                           mode=args.mode)
        art = load_serving(blob)(imgs, maps, rb, rm)
        # bf16 presets: eager vs compiled bf16 reductions round
        # differently (measured ~0.04 px on boxes); f32 stays tight
        bf16 = model.cfg.compute_dtype != "float32"
        np.testing.assert_allclose(np.asarray(art["boxes"]),
                                   np.asarray(live["boxes"]),
                                   rtol=5e-2 if bf16 else 1e-5,
                                   atol=0.1 if bf16 else 1e-5)
        print("verify: artifact == live graph"
              + (" (bf16 rounding tolerance)" if bf16 else ""))

    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"serving={args.serving}, batch={args.batch}, "
          f"platforms={'tpu' if args.tpu else 'default'})")


if __name__ == "__main__":
    main()
