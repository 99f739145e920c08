"""AOT serving-artifact export (io/export.py, cli/export.py).

The exported StableHLO blob must reproduce the live graph's detections
exactly and be loadable without touching the model-building code path.
"""
import numpy as np

import jax
import jax.numpy as jnp

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork


def _tiny_model():
    S = 128
    dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    m = FusionNetwork(dn, FusionConfig(conf_thresh=0.05, max_det=8,
                                       max_radar=4, pre_nms_top_k=64,
                                       nms_use_pallas=False))
    params, state = m.init(jax.random.PRNGKey(0))
    fp, fs = dn.fold_batchnorm(params["darknet"], state["darknet"])
    return m, dict(params, darknet=fp), dict(state, darknet=fs)


def _inputs(rng, b, s, r):
    imgs = jnp.asarray(rng.uniform(size=(b, s, s, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(b, s // 16, s // 16, 3)),
                       jnp.float32)
    rb = np.zeros((b, r, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(b, r, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    return imgs, maps, jnp.asarray(rb), jnp.ones((b, r), bool)


def test_export_roundtrip_matches_live_graph():
    from millieye_tpu.io.export import export_serving, load_serving

    m, params, state = _tiny_model()
    blob = export_serving(m, params, state, batch_size=2)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    rng = np.random.default_rng(3)
    imgs, maps, rb, rm = _inputs(rng, 2, 128, 4)
    live = m.apply(params, state, imgs, maps, rb, rm, mode=0)
    art = load_serving(bytes(blob))(imgs, maps, rb, rm)
    assert set(art.keys()) == {"boxes", "valid"}
    np.testing.assert_array_equal(np.asarray(art["valid"]),
                                  np.asarray(live["valid"]))
    np.testing.assert_allclose(np.asarray(art["boxes"]),
                               np.asarray(live["boxes"]),
                               rtol=1e-6, atol=1e-6)


def test_export_cli(tmp_path):
    from millieye_tpu.cli.export import main

    out = tmp_path / "serving.mlir"
    main(["--out", str(out), "--serving", "f32", "--batch", "1",
          "--img_size", "128", "--verify"])
    blob = out.read_bytes()
    from millieye_tpu.io.export import load_serving
    step = load_serving(blob)
    rng = np.random.default_rng(0)
    imgs, maps, rb, rm = _inputs(rng, 1, 128, 32)
    o = step(imgs, maps, rb, rm)
    assert np.isfinite(np.asarray(o["boxes"])).all()


def test_export_numpy_leaves_bf16_heads():
    """Regression: checkpoints load as NUMPY leaves, and numpy promotes
    `bf16_array + python_float` to float32 (no weak types) — a bf16-cast
    head upcast mid-stack during constant-baking export and the next
    conv saw mixed dtypes (caught on the pallas_max_s01 export with the
    trained checkpoint). export_serving must convert leaves to jax
    arrays before tracing."""
    from millieye_tpu.io.export import export_serving, load_serving

    S = 128
    dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    m = FusionNetwork(dn, FusionConfig(conf_thresh=0.05, max_det=8,
                                       max_radar=4, pre_nms_top_k=64,
                                       nms_use_pallas=False,
                                       compute_dtype="bfloat16",
                                       heads_dtype="bfloat16"))
    params, state = m.init(jax.random.PRNGKey(0))
    fp, fs = dn.fold_batchnorm(params["darknet"], state["darknet"],
                               dtype=jnp.bfloat16)
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    # the shape a checkpoint restore produces: every leaf numpy
    params = jax.tree.map(lambda a: np.asarray(a), params)
    state = jax.tree.map(lambda a: np.asarray(a), state)

    blob = export_serving(m, params, state, batch_size=1)
    rng = np.random.default_rng(5)
    imgs, maps, rb, rm = _inputs(rng, 1, S, 4)
    art = load_serving(bytes(blob))(imgs, maps, rb, rm)
    assert np.isfinite(np.asarray(art["boxes"])).all()
