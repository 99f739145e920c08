"""Frozen-subtree optimizers (optax) for the three training stages.

The reference trains in three stages with hand-rolled freezing:

* stage 1: plain YOLO training (``module2_mixed/train.py``) — everything
  trainable;
* stage 2: YOLO frozen, refinement parts trained — enforced by
  ``requires_grad=False`` walks and ``model.base_detector.eval()``
  (module2 train.py:106-121);
* stage 3: YOLO *and* the module2-pretrained image branch frozen
  (``img_cnn_layers`` + refinement ``net0/net1/net2``), radar branch and
  ensemble trainable (module3 train.py:117-149).

Here freezing is expressed the JAX way: ``stop_gradient`` already severs
the backbone inside the fusion graph (models/darknet.py feature tap), and
``optax.multi_transform`` zeroes updates for frozen labels so frozen
leaves stay bit-identical across steps regardless of incidental gradients.
Gradient accumulation (optimizer step every 2 batches,
module3 train.py:188-191) is ``optax.MultiSteps``.
"""
from __future__ import annotations

import jax
import optax

# stage-3 freeze set (module3 train.py:117-149): module2-pretrained image
# branch.  radar_net (new in module3) and the ensemble head stay trainable.
STAGE3_FROZEN = (
    ("darknet",),
    ("img_cnn",),
    ("refine", "net0"),
    ("refine", "net1"),
    ("refine", "net2"),
)

# stage-2 freeze set (module2 train.py:106-121): only the base detector.
STAGE2_FROZEN = (("darknet",),)


def _path_tuple(path):
    out = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            out.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            out.append(p.idx)
        else:
            out.append(str(p))
    return tuple(out)


def label_tree(params, frozen_prefixes):
    """Pytree of {"train", "freeze"} labels matching ``params``."""

    def label(path, _leaf):
        pt = _path_tuple(path)
        for prefix in frozen_prefixes:
            if pt[: len(prefix)] == tuple(prefix):
                return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def frozen_adam(params, lr=5e-4, frozen_prefixes=(), every_k=1,
                weight_decay=0.0, grad_clip=None):
    """Adam over the trainable subtree; frozen leaves get zero updates.

    lr defaults to the reference stage-3 setting (module3 train.py:163);
    ``every_k=2`` reproduces the gradient-accumulation cadence
    (train.py:188-191).

    ``grad_clip`` (global-norm bound) chains zero_nans -> clip: one
    exploding/NaN batch skews a step instead of poisoning the parameters
    for the rest of the run. The reference has no such guard (and no
    long unattended runs); default off for exact-parity training.
    """
    inner = (optax.adamw(lr, weight_decay=weight_decay)
             if weight_decay else optax.adam(lr))
    if grad_clip:
        # zero_nans both sides of the clip: NaN grads zero first; inf
        # grads become NaN inside the norm scaling (inf * 0), the second
        # pass zeroes those
        inner = optax.chain(optax.zero_nans(),
                            optax.clip_by_global_norm(grad_clip),
                            optax.zero_nans(), inner)
    if frozen_prefixes:
        labels = label_tree(params, frozen_prefixes)
        tx = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, labels)
    else:
        tx = inner
    if every_k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=every_k)
    return tx
