"""Device-mesh sharding for multi-chip training/eval.

The reference has no distributed execution at all (SURVEY.md §2.5) — its
only parallelism is host-side ``multiprocessing``. The TPU-native framework
scales the ~8M-parameter detector the SPMD way:

* a 2-axis ``jax.sharding.Mesh`` ("data", "model");
* **data parallelism** over "data": the batch dimension of every input is
  sharded, gradients are combined by the ``psum`` XLA inserts when the
  jitted step reads sharded batches against replicated (or
  model-sharded) parameters — no hand-written collectives;
* **tensor parallelism** over "model" for the widest layers — the
  490-channel score-map conv (``cnn_layers_1``, my_models.py:47-77) and
  the refinement head's 490→256 matmul — sharded on the 490/256
  channel axes.  For this model size TP is optional (mesh shape
  ``(n, 1)`` disables it); the machinery exists so the same step scales
  batch *and* width without code changes.

Collectives ride ICI: the mesh is built over ``jax.devices()`` in order,
so neighboring mesh coordinates are physically adjacent chips.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_axis=1, devices=None):
    """Mesh of shape (n_devices // model_axis, model_axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


# conv HWIO weights with 490/256-wide output channels and linear weights on
# those axes are worth sharding over "model"; everything else replicates.
_TP_WIDTHS = (490, 256)


def _leaf_spec(leaf, tp_enabled):
    if not tp_enabled or not hasattr(leaf, "ndim"):
        return P()
    if leaf.ndim == 4 and leaf.shape[-1] in _TP_WIDTHS:      # HWIO conv
        return P(None, None, None, "model")
    if leaf.ndim == 2 and leaf.shape[0] in _TP_WIDTHS:       # Linear in-dim
        return P("model", None)
    return P()


def param_sharding(mesh, params):
    """NamedSharding tree for a parameter pytree (TP on wide channel axes
    when the mesh has a nontrivial "model" axis)."""
    tp = mesh.shape["model"] > 1
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, tp)), params)


def shard_batch(mesh, batch):
    """Put a host batch dict onto the mesh, batch-dim sharded over "data".
    Host-side scalars (``_n``, ``brightness``) pass through unsharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh)
        if getattr(x, "ndim", 0) >= 1 else x, batch)


def shard_train_state(mesh, ts):
    """Place a TrainState on the mesh: params TP-or-replicated, BN state and
    optimizer moments following the parameters they track."""
    p_sh = param_sharding(mesh, ts.params)

    def opt_spec(leaf):
        # optimizer slots that mirror a parameter shape adopt its sharding
        return NamedSharding(mesh, _leaf_spec(leaf, mesh.shape["model"] > 1))

    params = jax.tree.map(jax.device_put, ts.params, p_sh)
    state = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh)), ts.state)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, opt_spec(x)) if hasattr(x, "ndim")
        else x, ts.opt_state)
    step = jax.device_put(ts.step, replicated(mesh))
    return type(ts)(params, state, opt_state, step)


def sharded_step(step_fn, mesh):
    """jit a train step for the mesh. Shardings are carried by the inputs
    (see shard_train_state / shard_batch); XLA inserts the gradient
    all-reduce over "data" and the activation collectives over "model"."""
    return jax.jit(step_fn, donate_argnums=(0,))
