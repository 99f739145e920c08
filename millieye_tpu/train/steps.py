"""Jit-compiled train steps for the three training stages.

Each ``make_*_train_step`` returns a pure function
``step(train_state, batch, rng) -> (train_state, metrics)`` suitable for
``jax.jit`` (donate the train state) or for sharded execution via
``millieye_tpu.parallel``. This replaces the reference's imperative epoch
loops (``module2_mixed/train.py:126-166``, ``module3_our_dataset/
train.py:167-240``) where forward, backward and the optimizer ran as
separate CUDA launches — here one XLA program does forward + backward +
(accumulated) update per step.

BatchNorm discipline (train.py:169-170): the base detector's BN always
uses running statistics (``Darknet.apply(train=False)`` semantics inside
the fusion graphs), while head BNs update — the fusion models already
implement this; stage-1 YOLO training updates backbone BN normally.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from millieye_tpu.models.yolo_head import yolo_loss


class TrainState(NamedTuple):
    params: Any
    state: Any          # BN running statistics
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, state, tx):
    return TrainState(params, state, tx.init(params), jnp.zeros((), jnp.int32))


def _keep_finite(new, old):
    if not jnp.issubdtype(jnp.result_type(new), jnp.inexact):
        return new          # counters / step indices can't be non-finite
    return jnp.where(jnp.isfinite(new), new, old)


def _apply(tx, ts, grads, new_bn_state):
    """Optimizer apply with a finite-guard at the state boundary.

    A single poisoned batch must never be able to corrupt the run
    permanently: any non-finite parameter, BN-statistic, or optimizer-
    state element reverts to its previous value (BN running stats are
    EMAs updated OUTSIDE the optimizer — one inf batch mean would
    otherwise poison them forever; likewise one NaN gradient would NaN
    Adam's moments and freeze every later update while the run appears
    to progress). The number of reverted param/BN elements is reported
    as the ``nonfinite_reverted`` metric so silent recovery is
    observable.
    """
    updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
    params = optax.apply_updates(ts.params, updates)
    reverted = sum(
        jnp.size(x) - jnp.isfinite(x).sum()
        for x in jax.tree.leaves(params) + jax.tree.leaves(new_bn_state))
    params = jax.tree.map(_keep_finite, params, ts.params)
    new_bn_state = jax.tree.map(_keep_finite, new_bn_state, ts.state)
    opt_state = jax.tree.map(_keep_finite, opt_state, ts.opt_state)
    ts = TrainState(params, new_bn_state, opt_state, ts.step + 1)
    return ts, reverted


def _stop_frozen(params, frozen_prefixes):
    """stop_gradient every leaf under the frozen path prefixes.

    ``frozen_adam`` already MASKS the frozen subtrees' updates, but the
    backward pass still computes their gradients and throws them away —
    for stage 3 that is the whole darknet backward (most of the step's
    FLOPs). Stopping the gradient at the parameter leaves lets XLA prune
    that backward entirely; the resulting update is bit-identical (the
    masked optimizer never read those gradients).
    """
    if not frozen_prefixes:
        return params
    from millieye_tpu.train.optim import _path_tuple
    pres = tuple(tuple(p) for p in frozen_prefixes)

    def f(path, leaf):
        pt = _path_tuple(path)
        if any(pt[:len(pre)] == pre for pre in pres):
            return jax.lax.stop_gradient(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(f, params)


def make_yolo_train_step(model, tx):
    """Stage 1: full YOLO training (module2_mixed/train.py 'yolo' phase)."""

    def step(ts: TrainState, batch, rng=None):
        images, targets, tmask = (batch["images"], batch["targets"],
                                  batch["tmask"])

        def loss_fn(params):
            out = model.apply(params, ts.state, images, train=True)
            loss, per_scale = yolo_loss(
                out["preds"], model.anchors_per_scale, images.shape[1],
                targets, tmask)
            return loss, (out["state"], per_scale)

        (loss, (bn_state, per_scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        metrics = {"loss": loss}
        for i, m in enumerate(per_scale):
            metrics.update({f"scale{i}/{k}": v for k, v in m.items()})
        ts, reverted = _apply(tx, ts, grads, bn_state)
        metrics["nonfinite_reverted"] = reverted
        return ts, metrics

    return step


def make_refine_train_step(model, tx, frozen_prefixes=()):
    """Stage 2: frozen YOLO + refinement/ensemble heads
    (module2_mixed/train.py:126-166).

    ``frozen_prefixes``: stop-gradient these param subtrees (pass the
    optimizer's freeze set) so the pruned backward matches what the
    masked optimizer actually consumes."""

    def step(ts: TrainState, batch, rng):
        images, targets, tmask = (batch["images"], batch["targets"],
                                  batch["tmask"])

        def loss_fn(params):
            params = _stop_frozen(params, frozen_prefixes)
            out = model.apply(params, ts.state, images, train=True,
                              targets=targets, tmask=tmask, rng=rng)
            return out["loss"], (out["state"], out["metrics"])

        (loss, (bn_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        # stage 2 keeps the base detector's BN stats frozen: reuse them
        bn_state = dict(bn_state)
        bn_state["darknet"] = ts.state["darknet"]
        metrics = dict(metrics, loss=loss)
        ts, reverted = _apply(tx, ts, grads, bn_state)
        metrics["nonfinite_reverted"] = reverted
        return ts, metrics

    return step


def make_fusion_train_step(model, tx, mode=0, frozen_prefixes=(),
                           fold_frozen=False):
    """Stage 3: frozen YOLO + frozen module2 branch, radar/ensemble train
    (module3_our_dataset/train.py:167-240).

    ``frozen_prefixes``: stop-gradient these param subtrees (pass the
    optimizer's freeze set) — prunes the frozen darknet's backward pass,
    which the masked optimizer discarded anyway.

    ``fold_frozen`` (requires a frozen darknet): BN-fold the darknet
    params INSIDE the step. The frozen base detector already runs
    eval-mode BN (train.py:169-170), so folding is numerically the same
    composition — and folded weights are what lets the Pallas fused
    stem engage in the training forward (darknet._pallas_fused needs
    folded stages)."""
    fold = bool(fold_frozen)
    if fold and ("darknet",) not in tuple(tuple(p) for p in frozen_prefixes):
        raise ValueError("fold_frozen requires the darknet to be frozen")

    def step(ts: TrainState, batch, rng):
        def loss_fn(params):
            params = _stop_frozen(params, frozen_prefixes)
            state = ts.state
            if fold:
                fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                                      state["darknet"])
                params = dict(params, darknet=fp)
                state = dict(state, darknet=fs)
            out = model.apply(
                params, state, batch["images"], batch["radar_maps"],
                batch["radar_boxes"], batch["rmask"], mode=mode,
                train=True, targets=batch["targets"],
                tmask=batch["tmask"], rng=rng)
            return out["loss"], (out["state"], out["metrics"])

        (loss, (bn_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        bn_state = dict(bn_state)
        bn_state["darknet"] = ts.state["darknet"]
        metrics = dict(metrics, loss=loss)
        ts, reverted = _apply(tx, ts, grads, bn_state)
        metrics["nonfinite_reverted"] = reverted
        return ts, metrics

    return step
