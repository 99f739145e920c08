"""Golden tests for box math against independent numpy formulations."""
import numpy as np
import jax.numpy as jnp

from millieye_tpu.ops import (
    xywh_to_xyxy,
    xyxy_to_xywh,
    iou_matrix,
    iou_pairwise,
    wh_iou,
    rescale_boxes,
    box_regress,
    encode_boxes,
)


def np_iou(a, b, plus_one):
    one = 1.0 if plus_one else 0.0
    ix1 = max(a[0], b[0])
    iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2])
    iy2 = min(a[3], b[3])
    inter = max(ix2 - ix1 + one, 0) * max(iy2 - iy1 + one, 0)
    ua = (a[2] - a[0] + one) * (a[3] - a[1] + one)
    ub = (b[2] - b[0] + one) * (b[3] - b[1] + one)
    return inter / (ua + ub - inter + 1e-16)


def test_xywh_roundtrip(rng):
    b = rng.uniform(0, 416, size=(50, 4)).astype(np.float32)
    b[:, 2:] = np.abs(b[:, 2:]) + 1
    out = np.asarray(xyxy_to_xywh(xywh_to_xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-3)


def test_xywh_to_xyxy_values():
    b = jnp.array([[10.0, 20.0, 4.0, 8.0]])
    np.testing.assert_allclose(
        np.asarray(xywh_to_xyxy(b)), [[8.0, 16.0, 12.0, 24.0]]
    )


def test_iou_plus_one_convention(rng):
    a = rng.uniform(0, 400, size=(7, 4)).astype(np.float64)
    b = rng.uniform(0, 400, size=(9, 4)).astype(np.float64)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) / 10 + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) / 10 + 1
    for plus_one in (True, False):
        got = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b), plus_one))
        want = np.array(
            [[np_iou(ai, bj, plus_one) for bj in b] for ai in a]
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_identical_boxes_iou_one():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert np.asarray(iou_pairwise(a, a))[0] > 0.999


def test_wh_iou():
    wh1 = jnp.array([[4.0, 4.0]])
    wh2 = jnp.array([[4.0, 4.0], [2.0, 2.0], [8.0, 2.0]])
    got = np.asarray(wh_iou(wh1, wh2))[0]
    # co-centered shape IoU: 16/16, 4/16, 8/(16+16-8)
    np.testing.assert_allclose(got, [1.0, 4 / 16, 8 / 24], rtol=1e-5)


def test_rescale_boxes_landscape():
    # 640x480 image letterboxed to 416: pad_y = 160*(416/640) = 104
    boxes = jnp.array([[52.0, 52.0, 364.0, 364.0]])
    out = np.asarray(rescale_boxes(boxes, 416, (480, 640)))
    pad_y = 104.0
    unpad_h = 416 - pad_y
    np.testing.assert_allclose(out[0, 0], 52.0 / 416 * 640, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], (52.0 - pad_y // 2) / unpad_h * 480, rtol=1e-6)


def test_box_regress_identity():
    rois = jnp.array([[10.0, 10.0, 30.0, 50.0]])
    out = np.asarray(box_regress(jnp.zeros((1, 4)), rois))
    np.testing.assert_allclose(out, np.asarray(rois), rtol=1e-6)


def test_encode_regress_roundtrip(rng):
    rois = rng.uniform(10, 200, size=(20, 4))
    rois[:, 2:] = rois[:, :2] + rng.uniform(5, 100, size=(20, 2))
    tgt = rois + rng.uniform(-3, 3, size=(20, 4))
    tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 1)
    params = encode_boxes(jnp.asarray(rois), jnp.asarray(tgt))
    rec = np.asarray(box_regress(params, jnp.asarray(rois)))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)
