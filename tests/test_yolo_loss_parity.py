"""Value parity of the stage-1 YOLO loss vs torch's loss primitives.

build_targets is golden-tested against the reference formulas
(test_targets); this closes the remaining gap — the 6-term loss
composition (masked MSE / BCE with obj_scale=1, noobj_scale=100,
yolov3/models.py:193-201) — by recomputing every term with
torch.nn.functional on the same assignment tensors.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

from millieye_tpu.models.yolo_head import yolo_scale_loss
from millieye_tpu.ops.targets import build_targets


def test_yolo_scale_loss_matches_torch(rng):
    b, a, g, c = 2, 3, 8, 5
    stride = 16.0
    anchors_px = np.array([[16., 24.], [40., 32.], [64., 80.]], np.float32)

    raw = rng.standard_normal((b, a, g, g, 5 + c)).astype(np.float32)
    pred = np.concatenate([
        1 / (1 + np.exp(-raw[..., :2])),           # sigmoid x, y
        raw[..., 2:4],                             # tw, th
        1 / (1 + np.exp(-raw[..., 4:5])),          # sigmoid conf
        1 / (1 + np.exp(-raw[..., 5:])),           # sigmoid cls
    ], -1).astype(np.float32)

    t_n = 6
    targets = np.zeros((b, t_n, 5), np.float32)
    targets[..., 0] = rng.integers(0, c, (b, t_n))
    targets[..., 1:3] = rng.uniform(0.1, 0.9, (b, t_n, 2))
    targets[..., 3:5] = rng.uniform(0.1, 0.4, (b, t_n, 2))
    tmask = np.ones((b, t_n), bool)
    tmask[:, -1] = False

    total, metrics = yolo_scale_loss(
        jnp.asarray(pred), anchors_px, stride, jnp.asarray(targets),
        jnp.asarray(tmask))

    # rebuild the assignment (golden-tested vs the reference elsewhere)
    gy, gx = np.mgrid[0:g, 0:g].astype(np.float32)
    anchors_grid = anchors_px / stride
    bx = pred[..., 0] + gx[None, None]
    by = pred[..., 1] + gy[None, None]
    bw = np.exp(pred[..., 2]) * anchors_grid[None, :, 0, None, None]
    bh = np.exp(pred[..., 3]) * anchors_grid[None, :, 1, None, None]
    boxes = np.stack([bx, by, bw, bh], -1)
    t = build_targets(jnp.asarray(boxes), jnp.asarray(pred[..., 5:]),
                      jnp.asarray(targets), jnp.asarray(tmask),
                      jnp.asarray(anchors_grid), 0.5)
    t = {k: np.asarray(v) for k, v in t.items()}
    obj = t["obj_mask"].astype(bool)
    noobj = t["noobj_mask"].astype(bool)
    assert obj.any() and noobj.any()

    P = torch.tensor(pred)
    loss_x = tF.mse_loss(P[..., 0][torch.tensor(obj)],
                         torch.tensor(t["tx"])[torch.tensor(obj)])
    loss_y = tF.mse_loss(P[..., 1][torch.tensor(obj)],
                         torch.tensor(t["ty"])[torch.tensor(obj)])
    loss_w = tF.mse_loss(P[..., 2][torch.tensor(obj)],
                         torch.tensor(t["tw"])[torch.tensor(obj)])
    loss_h = tF.mse_loss(P[..., 3][torch.tensor(obj)],
                         torch.tensor(t["th"])[torch.tensor(obj)])
    conf = P[..., 4]
    bce = tF.binary_cross_entropy
    loss_conf = (bce(conf[torch.tensor(obj)],
                     torch.tensor(t["tconf"])[torch.tensor(obj)])
                 + 100.0 * bce(conf[torch.tensor(noobj)],
                               torch.tensor(t["tconf"])[torch.tensor(noobj)]))
    loss_cls = bce(P[..., 5:][torch.tensor(obj)],
                   torch.tensor(t["tcls"])[torch.tensor(obj)])
    want = float(loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls)

    np.testing.assert_allclose(float(total), want, rtol=1e-4)
    np.testing.assert_allclose(float(metrics["conf"]), float(loss_conf),
                               rtol=1e-4)
    np.testing.assert_allclose(float(metrics["cls"]), float(loss_cls),
                               rtol=1e-4)
