"""Fusion-stage heads: score-map encoders, refinement, ensemble, losses.

Functional re-designs of the reference's nn.Modules
(``module3_our_dataset/my_models.py``, ``module2_mixed/my_models.py``):
each head is (init, apply) over explicit pytrees; BN running statistics
live in a separate ``state`` tree; everything runs on [B, N, ...] padded
tensors with validity masks so the whole fusion network jits.

Components and their reference counterparts:
* ``conv_bn_stack``    cnn_layers_1 / fcn_layers (1x1 conv 256->490 + BN
                       momentum .1 + LeakyReLU, my_models.py:47-77)
* ``radar_encoder``    cnn_layers_3 (3->32->64->128 3x3 convs + 1x1 -> 10,
                       sigmoid, module3 my_models.py:130-157)
* ``refinement_head``  module3 variant incl. radar_net 7x7 conv fusion
                       (my_models.py:213-284); module2 variant with dropout
                       (module2 my_models.py:96-125)
* ``ensemble_head``    stack(refine, yolo) -> Linear(2->32) -> flatten ->
                       Linear -> softmax (module3:176-210, module2:128-163)
* ``focal_loss``       binary focal loss, alpha .75 gamma 2, sum reduction
                       (module3:287-314)

Masked-BN note: torch BatchNorm over RoI crops normalizes over the actual
(ragged) RoI count; under padding this framework computes batch statistics
with the validity mask as weights, which matches the reference's statistics
exactly when the mask marks the same set of real RoIs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BN_EPS = 1e-5
_HEAD_BN_MOMENTUM = 0.1  # torch default, used by every head BN


# ---------------------------------------------------------------- primitives
def _linear_init(rng, fan_in, fan_out):
    # kaiming_normal (weights_init_normal, utils/utils.py:36-37)
    w = jax.random.normal(rng, (fan_in, fan_out), jnp.float32)
    return w * jnp.sqrt(2.0 / fan_in)


def _conv_init(rng, k, cin, cout):
    return 0.02 * jax.random.normal(rng, (k, k, cin, cout), jnp.float32)


def _bn_init(rng, c):
    return (
        {"gamma": 1.0 + 0.02 * jax.random.normal(rng, (c,), jnp.float32),
         "beta": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32),
         "var": jnp.ones((c,), jnp.float32)},
    )


def batch_norm(x, p, s, train, weight=None, momentum=_HEAD_BN_MOMENTUM):
    """BN over all leading axes. ``weight`` (broadcastable to x[..., 0])
    masks padded rows out of the batch statistics."""
    if train:
        if weight is None:
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            var = jnp.var(x, axis=tuple(range(x.ndim - 1)))
            cnt = 1
            for d in x.shape[:-1]:
                cnt *= d
            var_u = var * (cnt / max(cnt - 1, 1))
        else:
            wsum = jnp.maximum(weight.sum(), 1.0)
            # pad weight with TRAILING singletons up to x.ndim: a bare
            # [..., None] right-aligns [N] against x [N,1,1,C] as
            # (1,1,N,1) and the "mean" silently becomes an unmasked sum
            # over a broadcast product (caught by review round 3)
            wx = weight.reshape(weight.shape
                                + (1,) * (x.ndim - weight.ndim))
            mean = (x * wx).sum(axis=tuple(range(x.ndim - 1))) / wsum
            var = (((x - mean) ** 2) * wx).sum(
                axis=tuple(range(x.ndim - 1))) / wsum
            var_u = var * (wsum / jnp.maximum(wsum - 1.0, 1.0))
        # running_var tracks the UNBIASED batch variance (torch semantics);
        # normalization below uses the biased one
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * var_u,
        }
    else:
        mean, var, new_s = s["mean"], s["var"], s
    y = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * p["gamma"] + p["beta"]
    return y, new_s


def leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _conv2d(x, w, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


# ------------------------------------------------------------- conv_bn_stack
def conv_bn_stack_init(rng, channels):
    """1x1 conv + BN + leaky per stage; channels e.g. (256, 490)."""
    params, state = [], []
    for cin, cout in zip(channels[:-1], channels[1:]):
        rng, k1, k2 = jax.random.split(rng, 3)
        bn_p, bn_s = _bn_init(k2, cout)
        params.append({"w": _conv_init(k1, 1, cin, cout),
                       "b": jnp.zeros((cout,)), "bn": bn_p})
        state.append(bn_s)
    return params, state


def conv_bn_stack_apply(params, state, x, train=False):
    new_state = []
    for p, s in zip(params, state):
        x = _conv2d(x, p["w"]) + p["b"]
        x, ns = batch_norm(x, p["bn"], s, train)
        x = leaky(x)
        new_state.append(ns)
    return x, new_state


# ------------------------------------------------------------- radar_encoder
_RADAR_ENC_CHANNELS = (3, 32, 64, 128)


def radar_encoder_init(rng):
    params, state = [], []
    chans = _RADAR_ENC_CHANNELS
    for cin, cout in zip(chans[:-1], chans[1:]):
        rng, k1, k2 = jax.random.split(rng, 3)
        bn_p, bn_s = _bn_init(k2, cout)
        params.append({"w": _conv_init(k1, 3, cin, cout),
                       "b": jnp.zeros((cout,)), "bn": bn_p})
        state.append(bn_s)
    rng, k = jax.random.split(rng)
    params.append({"w": _conv_init(k, 1, chans[-1], 10),
                   "b": jnp.zeros((10,))})
    return params, state


def radar_encoder_apply(params, state, x, train=False):
    """[B, H, W, 3] -> sigmoid score map [B, H, W, 10]."""
    new_state = []
    for p, s in zip(params[:-1], state):
        x = _conv2d(x, p["w"]) + p["b"]
        x, ns = batch_norm(x, p["bn"], s, train)
        x = leaky(x)
        new_state.append(ns)
    x = _conv2d(x, params[-1]["w"]) + params[-1]["b"]
    return jax.nn.sigmoid(x), new_state


# ----------------------------------------------------------- refinement head
def refinement_head_init(rng, in_dim=490, hidden=256, net2_out=13,
                         with_radar=True):
    """module3 keeps net2 at 13 outputs even with class_num=1 and slices the
    first two (my_models.py:241-242,269-282) — replicated for weight compat.
    """
    ks = jax.random.split(rng, 8)
    params = {
        "net0": {"w": _linear_init(ks[0], in_dim, hidden),
                 "b": jnp.zeros((hidden,))},
        "net1": {"w": _linear_init(ks[1], hidden, 4), "b": jnp.zeros((4,))},
        "net2": {"w": _linear_init(ks[2], hidden, net2_out),
                 "b": jnp.zeros((net2_out,))},
    }
    state = {}
    if with_radar:
        bn_p, bn_s = _bn_init(ks[5], 10)
        params["radar_net"] = {
            "conv7": {"w": _conv_init(ks[3], 7, 10, 10), "b": jnp.zeros((10,))},
            "bn": bn_p,
            "conv1": {"w": _conv_init(ks[4], 1, 10, 1), "b": jnp.zeros((1,))},
        }
        state["radar_net"] = bn_s
    return params, state


def _flatten_chw(crop):
    """[N, 7, 7, C] -> [N, C*49] in torch (C, H, W) flatten order, so Linear
    weights are interchangeable with torch checkpoints."""
    return crop.transpose(0, 3, 1, 2).reshape(crop.shape[0], -1)


def refinement_head_apply(params, state, radar_crop, img_crop, valid=None,
                          train=False, dropout_rng=None, class_num=1):
    """module3 forward (my_models.py:260-284).

    radar_crop [N, 7, 7, 10], img_crop [N, 7, 7, 10] (PS-pooled, C_out=10).
    Returns (regress_param [N,4], refinement_vector [N, 1+class_num], state).
    """
    new_state = dict(state)
    x = _flatten_chw(img_crop)
    t = leaky(x @ params["net0"]["w"] + params["net0"]["b"])
    if dropout_rng is not None:  # module2 variant has Dropout(0.5)
        keep = jax.random.bernoulli(dropout_rng, 0.5, t.shape)
        t = jnp.where(keep, t / 0.5, 0.0)
    box_regression = t @ params["net1"]["w"] + params["net1"]["b"]
    class_vector = jax.nn.sigmoid(t @ params["net2"]["w"] + params["net2"]["b"])

    if "radar_net" not in params:
        return box_regression, class_vector, new_state

    rn = params["radar_net"]
    r = _conv2d(radar_crop, rn["conv7"]["w"], pad="VALID") + rn["conv7"]["b"]
    r, ns = batch_norm(r, rn["bn"], state["radar_net"], train, weight=valid)
    new_state["radar_net"] = ns
    r = leaky(r)
    r = _conv2d(r, rn["conv1"]["w"]) + rn["conv1"]["b"]
    radar_conf = jax.nn.sigmoid(r.reshape(r.shape[0], 1))
    confidence = jax.nn.sigmoid(radar_conf + class_vector[:, :1])
    refinement_vector = jnp.concatenate(
        [confidence, class_vector[:, 1:1 + class_num]], axis=-1)
    return box_regression, refinement_vector, new_state


# -------------------------------------------------------------- ensemble head
def ensemble_head_init(rng, class_num, hidden=32):
    ks = jax.random.split(rng, 2)
    return {
        "fc1": {"w": _linear_init(ks[0], 2, hidden), "b": jnp.zeros((hidden,))},
        "fc2": {"w": _linear_init(ks[1], hidden * (class_num + 1), 2),
                "b": jnp.zeros((2,))},
    }


def ensemble_head_apply(params, refinement_vector, yolo_vector, softmax=True,
                        fc2_leaky=False):
    """[N, c+1] x2 -> [N, 2]. Stacks the two vectors feature-wise
    (my_models.py:202-210); module2's fc2 has a LeakyReLU (module2:148-152),
    selected by ``fc2_leaky``.
    """
    x = jnp.stack([refinement_vector, yolo_vector], axis=-1)   # [N, c+1, 2]
    x = leaky(x @ params["fc1"]["w"] + params["fc1"]["b"])     # [N, c+1, H]
    x = x.reshape(x.shape[0], -1)
    x = x @ params["fc2"]["w"] + params["fc2"]["b"]
    if fc2_leaky:
        x = leaky(x)
    return jax.nn.softmax(x, axis=-1) if softmax else x


# --------------------------------------------------------------------- losses
def _weighted_sum(per, weight):
    return jnp.where(weight > 0, per * weight, 0.0).sum()


def _select_rows(weight, value, neutral):
    """Replace unsampled rows with a neutral constant BEFORE the
    differentiable ops. The weights are binary sample masks; per-row
    NaN/inf OUTSIDE the sample set (e.g. encode_boxes of a padded
    zero-size roi -> log(0/0)) must not poison the loss — and masking
    only the OUTPUT is not enough, because backprop multiplies the
    upstream zero by a NaN local derivative (0 * NaN = NaN)."""
    sel = weight > 0
    while sel.ndim < value.ndim:
        sel = sel[..., None]
    return jnp.where(sel, value, neutral)


def focal_loss(inputs, labels, weight, alpha=0.75, gamma=2.0):
    """Binary focal loss, sum reduction (my_models.py:287-314).

    inputs [N, 2] softmaxed; labels [N, 2] one-hot; weight [N] selects the
    balanced sample set (replaces the reference's boolean indexing).
    """
    a = jnp.where(labels[:, 1] == 1, alpha, 1.0 - alpha)
    inputs = _select_rows(weight, inputs, 0.5)
    probs = jnp.clip((inputs * labels).sum(-1), 1e-12, 1.0)
    per = -a * (1.0 - probs) ** gamma * jnp.log(probs)
    return _weighted_sum(per, weight)


def bce_sum(p, t, weight):
    p = _select_rows(weight, p, 0.5)
    t = _select_rows(weight, t, 0.5)
    p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    per = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    if per.ndim > weight.ndim:
        per = per.sum(-1)
    return _weighted_sum(per, weight)


def smooth_l1_sum(pred, target, weight):
    target = _select_rows(weight, target, 0.0)
    pred = _select_rows(weight, pred, 0.0)
    d = jnp.abs(pred - target)
    per = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5).sum(-1)
    return _weighted_sum(per, weight)
