"""Explicit-collective data-parallel training via shard_map + psum.

The default scaling path (parallel/mesh.py) is GSPMD: jit sees sharded
inputs and inserts the gradient all-reduce itself. This module is the
explicit twin — per-shard forward/backward inside ``shard_map`` with a
hand-placed ``lax.psum`` over the "data" axis — for when collective
placement must be controlled (e.g. overlapping the grad reduce with the
tail of the backward pass, or fusing custom Pallas collectives later).

Semantics vs the GSPMD step:
* gradients: psum of per-shard sums == global-batch gradients (the losses
  are sum-reductions, module3 my_models.py:613-635), identical math;
* balanced negative sampling runs per shard with a per-shard rng fold —
  the k = min(5*pos, neg) budget is local, which matches DDP-style
  training rather than the single-process reference loop;
* BatchNorm batch statistics are pmean'd across shards (sync-BN style);
  the base detector's BN stays frozen either way.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from millieye_tpu.train.steps import TrainState


def make_shardmap_fusion_step(model, tx, mesh, mode=0):
    """Returns step(ts, batch, rng) -> (ts, metrics); batch leaves must
    have a leading batch dim divisible by mesh.shape["data"]."""
    ndata = mesh.shape["data"]

    def per_shard(params, bn_state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(p):
            out = model.apply(
                p, bn_state, batch["images"], batch["radar_maps"],
                batch["radar_boxes"], batch["rmask"], mode=mode,
                train=True, targets=batch["targets"],
                tmask=batch["tmask"], rng=rng)
            return out["loss"], (out["state"], out["metrics"])

        (loss, (new_bn, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # hand-placed collectives: sum-reduced losses -> psum grads
        grads = jax.lax.psum(grads, "data")
        metrics = jax.tree.map(lambda m: jax.lax.psum(m, "data"), metrics)
        metrics = dict(metrics, loss=jax.lax.psum(loss, "data"))
        new_bn = jax.tree.map(lambda s: jax.lax.pmean(s, "data"), new_bn)
        return grads, new_bn, metrics

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def step(ts: TrainState, batch, rng):
        grads, new_bn, metrics = sharded(ts.params, ts.state, batch, rng)
        new_bn = dict(new_bn)
        new_bn["darknet"] = ts.state["darknet"]     # frozen-BN discipline
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        # finite-guard at the state boundary (see train.steps._apply) —
        # opt_state included, or one NaN batch would poison Adam's
        # moments for the rest of the run
        from millieye_tpu.train.steps import _keep_finite
        params = jax.tree.map(_keep_finite, params, ts.params)
        new_bn = jax.tree.map(_keep_finite, new_bn, ts.state)
        opt_state = jax.tree.map(_keep_finite, opt_state, ts.opt_state)
        return TrainState(params, new_bn, opt_state, ts.step + 1), metrics

    return step
