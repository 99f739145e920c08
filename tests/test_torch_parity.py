"""Numeric parity of the fusion heads vs independent torch mirrors at
identical weights — validates both the torch-checkpoint fills and the JAX
head math (the backbone has its own parity test in test_darknet)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from millieye_tpu.models import heads

RTOL = 2e-5


def rnd(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_conv_bn_stack_parity(rng):
    # torch mirror: Conv2d(256, 490, 1) + BN(eval) + LeakyReLU(0.1)
    conv = tnn.Conv2d(256, 490, 1)
    bn = tnn.BatchNorm2d(490).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rnd(rng, 490)))
        bn.running_var.copy_(torch.from_numpy(np.abs(rnd(rng, 490)) + 0.5))
    x = rnd(rng, 2, 256, 8, 8)
    with torch.no_grad():
        want = tF.leaky_relu(bn(conv(torch.from_numpy(x))), 0.1).numpy()

    p = [{"w": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
          "b": conv.bias.detach().numpy(),
          "bn": {"gamma": bn.weight.detach().numpy(),
                 "beta": bn.bias.detach().numpy()}}]
    s = [{"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()}]
    got, _ = heads.conv_bn_stack_apply(p, s, jnp.asarray(
        x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=RTOL, atol=1e-5)


def test_refinement_head_parity(rng):
    n = 6
    net0 = tnn.Linear(490, 256)
    net1 = tnn.Linear(256, 4)
    net2 = tnn.Linear(256, 13)
    conv7 = tnn.Conv2d(10, 10, 7)
    bn = tnn.BatchNorm2d(10).eval()
    conv1 = tnn.Conv2d(10, 1, 1)
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rnd(rng, 10)))
        bn.running_var.copy_(torch.from_numpy(np.abs(rnd(rng, 10)) + 0.5))

    img_crop = rnd(rng, n, 10, 7, 7)    # PS-pooled NCHW
    radar_crop = rnd(rng, n, 10, 7, 7)
    with torch.no_grad():
        t = tF.leaky_relu(net0(torch.from_numpy(
            img_crop.reshape(n, -1))), 0.1)
        box = net1(t).numpy()
        vec = torch.sigmoid(net2(t))
        r = tF.leaky_relu(bn(conv7(torch.from_numpy(radar_crop))), 0.1)
        rconf = torch.sigmoid(conv1(r).reshape(n, 1))
        conf = torch.sigmoid(rconf + vec[:, :1])
        want_vec = torch.cat([conf, vec[:, 1:2]], 1).numpy()

    params = {
        "net0": {"w": net0.weight.detach().numpy().T,
                 "b": net0.bias.detach().numpy()},
        "net1": {"w": net1.weight.detach().numpy().T,
                 "b": net1.bias.detach().numpy()},
        "net2": {"w": net2.weight.detach().numpy().T,
                 "b": net2.bias.detach().numpy()},
        "radar_net": {
            "conv7": {"w": conv7.weight.detach().numpy().transpose(2, 3, 1, 0),
                      "b": conv7.bias.detach().numpy()},
            "bn": {"gamma": bn.weight.detach().numpy(),
                   "beta": bn.bias.detach().numpy()},
            "conv1": {"w": conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
                      "b": conv1.bias.detach().numpy()},
        },
    }
    state = {"radar_net": {"mean": bn.running_mean.numpy(),
                           "var": bn.running_var.numpy()}}
    got_box, got_vec, _ = heads.refinement_head_apply(
        params, state,
        jnp.asarray(radar_crop.transpose(0, 2, 3, 1)),
        jnp.asarray(img_crop.transpose(0, 2, 3, 1)),
        class_num=1)
    np.testing.assert_allclose(np.asarray(got_box), box, rtol=RTOL,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_vec), want_vec, rtol=RTOL,
                               atol=1e-5)


def test_ensemble_head_parity(rng):
    n, c1 = 5, 2
    fc1 = tnn.Linear(2, 32)
    fc2 = tnn.Linear(32 * c1, 2)
    refinement = rnd(rng, n, c1)
    yolo = rnd(rng, n, c1)
    with torch.no_grad():
        x = torch.stack([torch.from_numpy(refinement),
                         torch.from_numpy(yolo)], -1)   # [n, c1, 2]
        x = tF.leaky_relu(fc1(x), 0.1).reshape(n, -1)
        want = torch.softmax(fc2(x), -1).numpy()

    params = {"fc1": {"w": fc1.weight.detach().numpy().T,
                      "b": fc1.bias.detach().numpy()},
              "fc2": {"w": fc2.weight.detach().numpy().T,
                      "b": fc2.bias.detach().numpy()}}
    got = heads.ensemble_head_apply(params, jnp.asarray(refinement),
                                    jnp.asarray(yolo))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=1e-5)


def test_radar_encoder_parity(rng):
    convs = [tnn.Conv2d(3, 32, 3, padding=1), tnn.Conv2d(32, 64, 3, padding=1),
             tnn.Conv2d(64, 128, 3, padding=1)]
    bns = [tnn.BatchNorm2d(c).eval() for c in (32, 64, 128)]
    final = tnn.Conv2d(128, 10, 1)
    for bn in bns:
        with torch.no_grad():
            bn.running_mean.copy_(torch.from_numpy(
                rnd(rng, bn.num_features)))
            bn.running_var.copy_(torch.from_numpy(
                np.abs(rnd(rng, bn.num_features)) + 0.5))
    x = rnd(rng, 2, 3, 16, 16)
    with torch.no_grad():
        h = torch.from_numpy(x)
        for conv, bn in zip(convs, bns):
            h = tF.leaky_relu(bn(conv(h)), 0.1)
        want = torch.sigmoid(final(h)).numpy()

    p = []
    s = []
    for conv, bn in zip(convs, bns):
        p.append({"w": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
                  "b": conv.bias.detach().numpy(),
                  "bn": {"gamma": bn.weight.detach().numpy(),
                         "beta": bn.bias.detach().numpy()}})
        s.append({"mean": bn.running_mean.numpy(),
                  "var": bn.running_var.numpy()})
    p.append({"w": final.weight.detach().numpy().transpose(2, 3, 1, 0),
              "b": final.bias.detach().numpy()})
    got, _ = heads.radar_encoder_apply(p, s, jnp.asarray(
        x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=RTOL, atol=1e-5)


def test_batch_norm_running_stats_torch(rng):
    """heads.batch_norm running stats after N train steps == torch
    BatchNorm1d (unbiased running-var update)."""
    c = 6
    p = {"gamma": jnp.asarray(rnd(rng, c) * 0.1 + 1.0),
         "beta": jnp.asarray(rnd(rng, c) * 0.1)}
    s = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
    bn = tnn.BatchNorm1d(c, eps=1e-5, momentum=0.1)
    bn.weight.data = torch.tensor(np.asarray(p["gamma"]))
    bn.bias.data = torch.tensor(np.asarray(p["beta"]))
    bn.train()
    with torch.no_grad():
        for _ in range(4):
            x = rnd(rng, 9, c)
            y, s = heads.batch_norm(jnp.asarray(x), p, s, train=True)
            yt = bn(torch.tensor(x))
            np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4,
                                       atol=1e-5)
    np.testing.assert_allclose(np.asarray(s["mean"]), bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["var"]), bn.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_batch_norm_weighted_running_stats_torch(rng):
    """Masked batch_norm == torch BN run on only the real rows (Bessel
    correction over the real-row count)."""
    c, n_real, n_pad = 5, 7, 4
    p = {"gamma": jnp.ones(c), "beta": jnp.zeros(c)}
    s = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
    bn = tnn.BatchNorm1d(c, eps=1e-5, momentum=0.1)
    bn.train()
    x = rnd(rng, n_real + n_pad, c)
    x[n_real:] = 777.0  # garbage in the padded rows
    w = np.zeros(n_real + n_pad, np.float32)
    w[:n_real] = 1.0
    with torch.no_grad():
        y, s = heads.batch_norm(jnp.asarray(x), p, s, train=True,
                                weight=jnp.asarray(w))
        bn(torch.tensor(x[:n_real]))
    np.testing.assert_allclose(np.asarray(s["mean"]), bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s["var"]), bn.running_var.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[:n_real]),
                               np.asarray(y)[:n_real], rtol=1e-5)


def test_masked_batch_norm_4d_matches_explicit():
    """Masked BN with a [N] weight over a 4-d [N,1,1,C] input (the
    radar_net BN's actual call shape) must equal BN computed over only
    the valid rows — the old [..., None] broadcast right-aligned the
    weight and turned the 'mean' into an unmasked sum."""
    import jax.numpy as jnp
    from millieye_tpu.models.heads import batch_norm

    rng = np.random.default_rng(0)
    n, c = 6, 10
    x = jnp.asarray(rng.standard_normal((n, 1, 1, c)), jnp.float32)
    w = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)   # 2 padded rows
    p = {"gamma": jnp.ones(c), "beta": jnp.zeros(c)}
    s = {"mean": jnp.zeros(c), "var": jnp.ones(c)}
    y, new_s = batch_norm(x, p, s, train=True, weight=w)

    xv = np.asarray(x)[:4, 0, 0]                        # valid rows only
    mean = xv.mean(0)
    var = xv.var(0)
    np.testing.assert_allclose(
        np.asarray(y)[:4, 0, 0],
        (xv - mean) / np.sqrt(var + 1e-5), rtol=1e-4, atol=1e-5)
    # running stats track the masked batch stats (unbiased var)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               0.1 * mean, rtol=1e-4, atol=1e-6)
