"""Int8-activation serving path (ops/quantize.py calibrate_act_scales +
Darknet.apply int8 x int8 -> int32 convs).

Exactness contract: given the calibrated scales, the int8 conv must
compute exactly conv(round(clip(x/xs)), q) * xs * scale — verified
against a hand-built float emulation on a truncated stem where the
integer arithmetic is exactly representable in float32. Full-net checks
are tolerance-based (PTQ is approximate by construction) plus structural
assertions (head convs skipped, s2d composition works).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.ops.quantize import (calibrate_act_scales,
                                       quantize_darknet)


def _folded(darknet, rng_int=0):
    params, state = darknet.init(jax.random.PRNGKey(rng_int))
    return darknet.fold_batchnorm(params, state)


@pytest.fixture(scope="module")
def stem():
    """conv3x3(3->16)+maxpool truncated graph (no yolo blocks)."""
    defs = tiny_yolov3_defs(num_classes=12, img_size=64)
    cut = [defs[0]] + [b for b in defs[1:]][:2]
    return Darknet(cut, img_size=64)


def test_int8_act_conv_exactness(stem):
    fp, fs = _folded(stem)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)

    absmax = calibrate_act_scales(stem, fp, fs, [x])
    qp = quantize_darknet(fp, act_absmax=absmax)
    assert "xs" in qp[0] and "q" in qp[0]

    got = stem.apply(qp, fs, x)["detections"]

    # float emulation of the exact same integer computation: cin=3 taps
    # keep every partial sum below 2^24, so float32 conv of the int
    # values is exact
    xs = np.float32(qp[0]["xs"])
    zq = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(zq, jnp.float32), qp[0]["q"].astype(jnp.float32),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = np.asarray(y) * xs * np.asarray(qp[0]["scale"]).reshape(1, 1, 1, -1)
    y = y + np.asarray(fp[0]["b"])
    y = np.where(y > 0, y, 0.1 * y)
    # maxpool 2x2 stride 2
    n, h, w, c = y.shape
    expect = y.reshape(n, h // 2, 2, w // 2, 2, c).max((2, 4))

    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5,
                               atol=1e-5)


def test_calibration_covers_batches(stem):
    fp, fs = _folded(stem)
    rng = np.random.default_rng(1)
    b1 = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    b2 = jnp.asarray(2.0 * rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    m1 = calibrate_act_scales(stem, fp, fs, [b1])
    m12 = calibrate_act_scales(stem, fp, fs, [b1, b2])
    assert m12[0] >= m1[0]
    assert m12[0] == pytest.approx(float(jnp.max(jnp.abs(b2))))


def test_full_net_int8_acts_close_and_heads_skipped():
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=128),
                      img_size=128)
    fp, fs = _folded(darknet)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)

    absmax = calibrate_act_scales(darknet, fp, fs, [x])
    qp = quantize_darknet(fp, act_absmax=absmax,
                          act_skip=darknet.act_int8_skip)
    for i in darknet.act_int8_skip:
        assert "xs" not in qp[i]

    ref = darknet.apply(fp, fs, x)
    got = darknet.apply(qp, fs, x)
    # PTQ tolerance: random-init activations, per-tensor act scales
    fm_r, fm_g = np.asarray(ref["feature_map"]), np.asarray(
        got["feature_map"])
    denom = np.abs(fm_r).mean() + 1e-6
    assert np.abs(fm_g - fm_r).mean() / denom < 0.15
    assert np.isfinite(np.asarray(got["detections"])).all()


def test_s2d_int8_acts_compose():
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=128),
                      img_size=128, s2d_stages=(0, 2))
    fp, fs = _folded(darknet)
    fp = darknet.fold_s2d(fp)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)), jnp.float32)

    absmax = calibrate_act_scales(darknet, fp, fs, [x])
    qp = quantize_darknet(fp, act_absmax=absmax,
                          act_skip=darknet.act_int8_skip)
    assert "q2" in qp[0] and "xs" in qp[0]
    ref = darknet.apply(fp, fs, x)
    got = darknet.apply(qp, fs, x)
    fm_r = np.asarray(ref["feature_map"])
    fm_g = np.asarray(got["feature_map"])
    assert np.abs(fm_g - fm_r).mean() / (np.abs(fm_r).mean() + 1e-6) < 0.15
