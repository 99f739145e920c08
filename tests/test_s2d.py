"""Space-to-depth stem transform: exactness against the plain graph and
transform bookkeeping (validation, fold order, engine integration)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.darknet import space_to_depth, s2d_conv_weight


def _nets(img=256):
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    return (Darknet(defs, img_size=img),
            Darknet(defs, img_size=img, s2d_stages=(0, 2, 4)))


def test_s2d_stage_matches_plain_stage(rng):
    """conv3x3+bias+leaky+maxpool == s2d conv + phase-max + bias + leaky."""
    from jax import lax
    x = jnp.asarray(rng.uniform(-1, 1, (2, 24, 24, 5)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(7), jnp.float32)
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    y = jnp.where(y > 0, y, 0.1 * y)
    ref = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                            (1, 2, 2, 1), [(0, 0)] * 4)

    z = space_to_depth(x)
    y2 = lax.conv_general_dilated(z, s2d_conv_weight(w), (1, 1),
                                  [(1, 1), (1, 1)],
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y2 = y2.reshape(2, 12, 12, 4, 7).max(3) + b
    y2 = jnp.where(y2 > 0, y2, 0.1 * y2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y2), atol=1e-5)


def test_s2d_darknet_matches_plain(rng):
    plain, s2d = _nets()
    params, state = plain.init(jax.random.PRNGKey(0))
    fp, fs = plain.fold_batchnorm(params, state)
    fp2 = s2d.fold_s2d(fp)
    x = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.float32)
    a = plain.apply(fp, fs, x)
    b = s2d.apply(fp2, fs, x)
    np.testing.assert_allclose(np.asarray(a["feature_map"]),
                               np.asarray(b["feature_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["detections"]),
                               np.asarray(b["detections"]),
                               rtol=1e-4, atol=2e-4)


def test_s2d_requires_folded_bn():
    plain, s2d = _nets()
    params, _ = plain.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        s2d.fold_s2d(params)


def test_s2d_validation_rejects_bad_stages():
    defs = tiny_yolov3_defs(num_classes=12, img_size=256)
    with pytest.raises(ValueError):
        Darknet(defs, img_size=256, s2d_stages=(8,))    # feature tap
    with pytest.raises(ValueError):
        Darknet(defs, img_size=256, s2d_stages=(12,))   # no following pool
    with pytest.raises(ValueError):
        Darknet(defs, img_size=256, s2d_stages=(1,))    # a maxpool block


def test_unfolded_params_run_plain_path(rng):
    """A Darknet constructed with s2d_stages but given unfolded params
    (training) must still run the plain graph."""
    _, s2d = _nets()
    params, state = s2d.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(size=(1, 256, 256, 3)), jnp.float32)
    out = s2d.apply(params, state, x, train=True)
    assert np.isfinite(np.asarray(out["detections"])).all()


def test_engine_folds_s2d(rng):
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.runtime.engine import FusionEngine
    img = 128
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    dn = Darknet(defs, img_size=img, s2d_stages=(0, 2))
    cfg = FusionConfig(conf_thresh=0.05, max_det=8, max_radar=4,
                       pre_nms_top_k=32, nms_use_pallas=False)
    model = FusionNetwork(dn, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    eng = FusionEngine(model, params, state, frame_size=(160, 120),
                       max_points=32)
    assert "w2" in eng.params["darknet"][0]
    frame = (rng.uniform(size=(120, 160, 3)) * 255).astype(np.uint8)
    boxes, valid = eng.infer(frame, np.zeros((0, 4)), np.zeros((0, 4)))
    assert np.isfinite(boxes).all()

    # numerics match the engine without s2d
    dn_p = Darknet(defs, img_size=img)
    model_p = FusionNetwork(dn_p, cfg)
    eng_p = FusionEngine(model_p, params, state, frame_size=(160, 120),
                         max_points=32)
    b2, v2 = eng_p.infer(frame, np.zeros((0, 4)), np.zeros((0, 4)))
    np.testing.assert_array_equal(valid, v2)
    np.testing.assert_allclose(boxes, b2, rtol=1e-3, atol=2e-3)
