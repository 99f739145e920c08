"""Darknet graph + decode golden tests vs. an independent torch build.

The torch model here is assembled in-test from the same block-dict spec and
battle-tested torch primitives; weights are copied from the JAX pytree, so
any mismatch pinpoints graph/layout/decode bugs in the JAX side.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.zoo import _conv, _maxpool, _yolo
from millieye_tpu.io.darknet_weights import load_darknet_weights, save_darknet_weights


def mini_defs(classes=1):
    anchors = ((10, 14), (23, 27), (37, 58))
    f = 2 * (classes + 5)
    return [
        {"type": "net", "channels": "3", "height": "32", "width": "32"},
        _conv(8, 3),                       # 0
        _maxpool(2, 2),                    # 1
        _conv(16, 3),                      # 2
        _maxpool(2, 1),                    # 3
        _conv(f, 1, bn=False, act="linear"),  # 4
        _yolo((0, 1), anchors, classes),   # 5
        {"type": "route", "layers": "-4"},  # 6 -> conv2 out
        {"type": "upsample", "stride": "2"},  # 7
        {"type": "route", "layers": "-1, 0"},  # 8 concat with conv0
        _conv(12, 3),                      # 9
        _conv(12, 3),                      # 10
        {"type": "shortcut", "from": "-2"},  # 11
        _conv(f, 1, bn=False, act="linear"),  # 12
        _yolo((1, 2), anchors, classes),   # 13
    ]


def torch_forward(model, params, state, x_nchw):
    """Independent torch evaluation of the same plan + weights."""
    outputs = []
    dets = []
    x = x_nchw
    for i, info in enumerate(model._plan):
        t = info["type"]
        if t == "convolutional":
            p = params[i]
            w = torch.tensor(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
            conv = nn.Conv2d(info["in_ch"], info["filters"], info["size"],
                             info["stride"], (info["size"] - 1) // 2,
                             bias=not info["bn"])
            conv.weight.data = w
            inp = outputs[-1] if outputs else x
            y = conv(inp)
            if info["bn"]:
                bn = nn.BatchNorm2d(info["filters"], eps=1e-5)
                bn.weight.data = torch.tensor(np.asarray(p["gamma"]))
                bn.bias.data = torch.tensor(np.asarray(p["beta"]))
                bn.running_mean.data = torch.tensor(np.asarray(state[i]["mean"]))
                bn.running_var.data = torch.tensor(np.asarray(state[i]["var"]))
                bn.eval()
                y = bn(y)
            else:
                conv.bias.data = torch.tensor(np.asarray(p["b"]))
                y = conv(inp)
            if info["act"] == "leaky":
                y = nn.functional.leaky_relu(y, 0.1)
        elif t == "maxpool":
            if info["size"] == 2 and info["stride"] == 1:
                y = nn.functional.pad(outputs[-1], (0, 1, 0, 1))
                y = nn.functional.max_pool2d(y, 2, 1)
            else:
                y = nn.functional.max_pool2d(outputs[-1], info["size"], info["stride"])
        elif t == "upsample":
            y = nn.functional.interpolate(outputs[-1], scale_factor=info["factor"],
                                          mode="nearest")
        elif t == "route":
            y = torch.cat([outputs[l] for l in info["layers"]], 1)
        elif t == "shortcut":
            y = outputs[-1] + outputs[info["frm"]]
        elif t == "yolo":
            y = outputs[-1]
            dets.append(torch_decode(y, info["anchors"], info["classes"],
                                     x_nchw.shape[2]))
        outputs.append(y)
    return outputs, torch.cat(dets, 1)


def torch_decode(raw, anchors, classes, img_dim):
    """Reference decode formula (yolov3/models.py:144-176), re-derived."""
    n, _, g, _ = raw.shape
    a, f = len(anchors), classes + 5
    p = raw.view(n, a, f, g, g).permute(0, 1, 3, 4, 2)
    stride = img_dim / g
    gx = torch.arange(g).repeat(g, 1).view(1, 1, g, g).float()
    gy = gx.transpose(2, 3).reshape(1, 1, g, g)
    anc = torch.tensor(anchors, dtype=torch.float32) / stride
    bx = (torch.sigmoid(p[..., 0]) + gx) * stride
    by = (torch.sigmoid(p[..., 1]) + gy) * stride
    bw = torch.exp(p[..., 2]) * anc[:, 0].view(1, a, 1, 1) * stride
    bh = torch.exp(p[..., 3]) * anc[:, 1].view(1, a, 1, 1) * stride
    conf = torch.sigmoid(p[..., 4])
    cls = torch.sigmoid(p[..., 5:])
    out = torch.cat(
        [torch.stack([bx, by, bw, bh, conf], -1), cls], -1
    ).view(n, -1, f)
    return out


@pytest.fixture(scope="module")
def mini():
    model = Darknet(mini_defs(), img_size=32, feature_tap=2)
    params, state = model.init(jax.random.PRNGKey(0))
    # non-trivial running stats
    state = [
        {k: v + 0.1 * (j + 1) for k, v in s.items()} for j, s in enumerate(state)
    ]
    return model, params, state


def test_forward_matches_torch(mini, rng):
    model, params, state = mini
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    out = model.apply(params, state, jnp.asarray(x))
    t_outputs, t_dets = torch_forward(model, params, state,
                                      torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    # feature tap (block 2 output)
    feat_t = t_outputs[2].detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out["feature_map"]), feat_t,
                               rtol=1e-4, atol=1e-4)
    # decoded detections, both scales, same ordering (exp(wh) amplifies
    # conv accumulation-order noise -> slightly looser tolerance)
    np.testing.assert_allclose(np.asarray(out["detections"]),
                               t_dets.detach().numpy(), rtol=1e-2, atol=1e-2)


def test_fold_batchnorm_equivalence(mini, rng):
    model, params, state = mini
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    ref = model.apply(params, state, x)
    fp, fs = model.fold_batchnorm(params, state)
    got = model.apply(fp, fs, x)
    np.testing.assert_allclose(np.asarray(got["detections"]),
                               np.asarray(ref["detections"]), rtol=1e-4, atol=1e-3)


def test_weights_roundtrip(tmp_path, mini):
    model, params, state = mini
    path = str(tmp_path / "w.weights")
    save_darknet_weights(model, params, state, path,
                         header=np.array([0, 2, 0, 32013, 0], np.int32))
    p2, s2 = model.init(jax.random.PRNGKey(1))
    p2, s2, header = load_darknet_weights(model, p2, s2, path)
    assert header[3] == 32013
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiny_yolov3_shapes():
    model = Darknet(tiny_yolov3_defs(num_classes=12), img_size=416)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 416, 416, 3))
    out = model.apply(params, state, x)
    # stride-16 tap: 26x26x256; 13x13 + 26x26 grids, 3 anchors each -> 2535
    assert out["feature_map"].shape == (1, 26, 26, 256)
    assert out["detections"].shape == (1, 3 * 13 * 13 + 3 * 26 * 26, 17)
    assert out["preds"][0].shape == (1, 3, 13, 13, 17)
    assert out["preds"][1].shape == (1, 3, 26, 26, 17)


def test_multiscale_input():
    model = Darknet(tiny_yolov3_defs(num_classes=12), img_size=416)
    params, state = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, state, jnp.zeros((1, 320, 320, 3)))
    assert out["detections"].shape[1] == 3 * 10 * 10 + 3 * 20 * 20


def test_full_yolov3_topology_and_shapes():
    """Full YOLOv3 (Darknet-53, 3 scales) from the zoo: block indexing
    must match pjreddie's yolov3.cfg (routes -1,61 / -1,36 hit the
    256/512-ch stage outputs) so official .weights load positionally."""
    import jax
    import jax.numpy as jnp
    from millieye_tpu.models.zoo import yolov3_defs

    s = 256
    model = Darknet(yolov3_defs(num_classes=80, img_size=s), img_size=s,
                    feature_tap=36)
    # official cfg has 107 layers (0..106); yolo at 82/94/106
    assert len(model.block_defs) == 107
    yolo_idx = [i for i, b in enumerate(model.block_defs)
                if b["type"] == "yolo"]
    assert yolo_idx == [82, 94, 106]
    # route targets resolve to the residual-stage outputs
    r61 = model._plan[86]
    assert r61["type"] == "route" and r61["layers"] == [85, 61]
    r36 = model._plan[98]
    assert r36["type"] == "route" and r36["layers"] == [97, 36]

    params, state = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, state, jnp.zeros((1, s, s, 3), jnp.float32))
    # 3 scales: s/32, s/16, s/8 -> 8, 16, 32 grids; 3 anchors each; 85 ch
    expect = 3 * (8 * 8 + 16 * 16 + 32 * 32)
    assert out["detections"].shape == (1, expect, 85)
    # feature tap at layer 36: stride 8, 256 channels
    assert out["feature_map"].shape == (1, s // 8, s // 8, 256)


def test_bn_running_stats_match_torch_train(mini, rng):
    """Three train-mode forwards: running mean/var must track torch's
    (biased var normalizes, UNBIASED var feeds the running EMA)."""
    model, params, state = mini
    mods = {}
    for i, info in enumerate(model._plan):
        if info["type"] == "convolutional" and info["bn"]:
            bn = nn.BatchNorm2d(info["filters"], eps=1e-5, momentum=0.9)
            bn.weight.data = torch.tensor(np.asarray(params[i]["gamma"]))
            bn.bias.data = torch.tensor(np.asarray(params[i]["beta"]))
            bn.running_mean.data = torch.tensor(np.asarray(state[i]["mean"]))
            bn.running_var.data = torch.tensor(np.asarray(state[i]["var"]))
            bn.train()
            mods[i] = bn

    st = state
    with torch.no_grad():
        for step in range(3):
            x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
            st = model.apply(params, st, jnp.asarray(x), train=True)["state"]

            outputs = []
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            for i, info in enumerate(model._plan):
                t = info["type"]
                if t == "convolutional":
                    p = params[i]
                    w = torch.tensor(
                        np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
                    inp = outputs[-1] if outputs else xt
                    y = nn.functional.conv2d(
                        inp, w, None if info["bn"] else torch.tensor(
                            np.asarray(p["b"])),
                        info["stride"], (info["size"] - 1) // 2)
                    if info["bn"]:
                        y = mods[i](y)
                    if info["act"] == "leaky":
                        y = nn.functional.leaky_relu(y, 0.1)
                elif t == "maxpool":
                    if info["size"] == 2 and info["stride"] == 1:
                        y = nn.functional.pad(outputs[-1], (0, 1, 0, 1))
                        y = nn.functional.max_pool2d(y, 2, 1)
                    else:
                        y = nn.functional.max_pool2d(
                            outputs[-1], info["size"], info["stride"])
                elif t == "upsample":
                    y = nn.functional.interpolate(
                        outputs[-1], scale_factor=info["factor"],
                        mode="nearest")
                elif t == "route":
                    y = torch.cat([outputs[l] for l in info["layers"]], 1)
                elif t == "shortcut":
                    y = outputs[-1] + outputs[info["frm"]]
                else:  # yolo
                    y = outputs[-1]
                outputs.append(y)

    for i, bn in mods.items():
        np.testing.assert_allclose(
            np.asarray(st[i]["mean"]), bn.running_mean.numpy(),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st[i]["var"]), bn.running_var.numpy(),
            rtol=1e-4, atol=1e-5)
