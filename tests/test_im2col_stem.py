"""Im2col stem transform (models/darknet.py fold_im2col): exactness of
the patch-matmul + phase-max rewrite of conv3x3+maxpool2 stages, both at
op level and through the full folded network."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.darknet import im2col_stem_weight


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_im2col_stage_matches_plain_stage(rng):
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

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = jnp.concatenate([xp[:, dy:dy + 24:2, dx:dx + 24:2, :]
                         for dy in range(4) for dx in range(4)], -1)
    y2 = jnp.einsum("nhwk,kd->nhwd", z, im2col_stem_weight(w))
    y2 = y2.reshape(2, 12, 12, 4, 7).max(3) + b
    y2 = jnp.where(y2 > 0, y2, 0.1 * y2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y2), atol=1e-5)


def test_im2col_darknet_matches_plain(rng):
    img = 128
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    plain = Darknet(defs, img_size=img)
    im2 = Darknet(defs, img_size=img, im2col_stages=(0, 2))
    params, state = plain.init(jax.random.PRNGKey(3))
    fp, fs = plain.fold_batchnorm(params, state)
    fpi = im2.fold_im2col(fp)
    assert "wi" in fpi[0] and "wi" in fpi[2] and "w" in fpi[4]

    x = jnp.asarray(rng.uniform(size=(2, img, img, 3)), jnp.float32)
    ref = plain.apply(fp, fs, x)
    got = im2.apply(fpi, fs, x)
    np.testing.assert_allclose(np.asarray(ref["feature_map"]),
                               np.asarray(got["feature_map"]),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ref["detections"]),
                               np.asarray(got["detections"]),
                               atol=2e-3, rtol=2e-3)


def test_im2col_validation_and_exclusivity():
    img = 128
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    with pytest.raises(ValueError):
        Darknet(defs, img_size=img, im2col_stages=(1,))  # a maxpool block
    with pytest.raises(ValueError):
        Darknet(defs, img_size=img, s2d_stages=(0,), im2col_stages=(0,))
    with pytest.raises(ValueError):
        net = Darknet(defs, img_size=img, im2col_stages=(0,))
        params, state = net.init(jax.random.PRNGKey(0))
        net.fold_im2col(params)  # BN not folded yet
