"""Int8 quantization tests (XLA path exact properties; Pallas kernel in
interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from millieye_tpu.ops.quantize import (quantize_int8, dequantize,
                                       quantize_int8_stochastic,
                                       quantize_darknet, dequantize_darknet)


def test_quantize_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((4, 4, 16, 32)), jnp.float32)
    q, scale = quantize_int8(w, axis=-1)
    assert q.dtype == jnp.int8
    back = dequantize(q, scale)
    # round-to-nearest error <= scale/2 per element
    err = np.abs(np.asarray(back - w))
    bound = np.broadcast_to(np.asarray(scale) / 2 + 1e-7, err.shape)
    assert (err <= bound).all()
    # absmax element is exactly representable
    np.testing.assert_allclose(
        np.abs(np.asarray(back)).max(axis=(0, 1, 2)),
        np.abs(np.asarray(w)).max(axis=(0, 1, 2)), rtol=1e-6)


def test_stochastic_kernel_plumbing(rng):
    """The TPU interpreter's PRNG returns zeros on CPU, so this test can
    only validate scale/shape/floor plumbing; the rounding DISTRIBUTION is
    verified on the real chip by benchmarks/quantize_tpu_check.py."""
    from jax.experimental.pallas import tpu as pltpu
    w = np.full((8, 128), 0.3, np.float32)
    w[0, 0] = 1.0
    with pltpu.force_tpu_interpret_mode():
        q, scale = quantize_int8_stochastic(jnp.asarray(w), seed=0)
    q = np.asarray(q)
    assert q.dtype == np.int8
    assert float(scale) == pytest.approx(1.0 / 127)
    # with zero random bits, stochastic rounding degrades to floor
    assert (q[1:] == 38).all() and q[0, 0] == 127


def test_quantized_darknet_forward_close(rng):
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    S = 64
    model = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                    img_size=S)
    params, state = model.init(jax.random.PRNGKey(0))
    fp, fs = model.fold_batchnorm(params, state)
    qp = quantize_darknet(fp)
    # int8 payload is a quarter of f32
    w_bytes = sum(np.asarray(p["w"]).nbytes for p in fp if "w" in p)
    q_bytes = sum(np.asarray(p["q"]).nbytes for p in qp if "q" in p)
    assert q_bytes * 4 == w_bytes
    dq = dequantize_darknet(qp)
    img = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    a = np.asarray(model.apply(fp, fs, img)["detections"])
    b = np.asarray(model.apply(dq, fs, img)["detections"])
    # boxes in pixels: small relative error after 13 quantized convs
    assert np.abs(a[..., :4] - b[..., :4]).max() < 0.05 * S
    assert np.abs(a[..., 4:] - b[..., 4:]).max() < 0.1


def test_stochastic_kernel_tiles_large_tensors(rng):
    """Row-tiled grid handles tensors larger than one VMEM block."""
    from jax.experimental.pallas import tpu as pltpu
    w = rng.standard_normal((1030, 128)).astype(np.float32)   # non-multiple
    with pltpu.force_tpu_interpret_mode():
        q, scale = quantize_int8_stochastic(jnp.asarray(w), seed=0,
                                            row_tile=256)
    q = np.asarray(q)
    assert q.shape == w.shape
    # zero random bits on CPU -> floor; check the bound |deq - w| <= scale
    back = q.astype(np.float64) * float(scale)
    assert (np.abs(back - w) <= float(scale) + 1e-7).all()


def test_direct_int8_apply_matches_dequantized(rng):
    """Darknet.apply consumes {"q", "scale"} slots directly (in-graph
    dequant) with results identical to pre-dequantized params."""
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    S = 64
    model = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    params, state = model.init(jax.random.PRNGKey(0))
    fp, fs = model.fold_batchnorm(params, state)
    qp = quantize_darknet(fp)
    img = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    a = np.asarray(model.apply(dequantize_darknet(qp), fs, img)["detections"])
    b = np.asarray(model.apply(qp, fs, img)["detections"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_int8_composes_with_s2d(rng):
    """fold_bn -> fold_s2d -> quantize: q2 slots run the fused stem and
    stay close to the float graph."""
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    S = 128
    defs = tiny_yolov3_defs(num_classes=12, img_size=S)
    plain = Darknet(defs, img_size=S)
    net = Darknet(defs, img_size=S, s2d_stages=(0, 2))
    params, state = plain.init(jax.random.PRNGKey(0))
    fp, fs = plain.fold_batchnorm(params, state)
    qp = quantize_darknet(net.fold_s2d(fp))
    assert "q2" in qp[0] and "q" in qp[4]
    img = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    a = np.asarray(plain.apply(fp, fs, img)["detections"])
    b = np.asarray(net.apply(qp, fs, img)["detections"])
    assert np.abs(a[..., :4] - b[..., :4]).max() < 0.05 * S
    assert np.abs(a[..., 4:] - b[..., 4:]).max() < 0.1


def test_engine_weights_int8(rng):
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.runtime.engine import FusionEngine
    S = 128
    dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S,
                 s2d_stages=(0, 2))
    cfg = FusionConfig(conf_thresh=0.05, max_det=8, max_radar=4,
                       pre_nms_top_k=32, nms_use_pallas=False,
                       weights_int8=True)
    model = FusionNetwork(dn, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    eng = FusionEngine(model, params, state, frame_size=(160, 120),
                       max_points=32)
    assert "q2" in eng.params["darknet"][0]
    assert "q" in eng.params["darknet"][4]
    frame = (rng.uniform(size=(120, 160, 3)) * 255).astype(np.uint8)
    boxes, valid = eng.infer(frame, np.zeros((0, 4)), np.zeros((0, 4)))
    assert np.isfinite(boxes).all()
