"""Epoch-level training recipes for the three stages.

Library equivalents of the reference's ``train.py`` scripts:

* stage 1  YOLO on image datasets           (module2_mixed/train.py, yolo)
* stage 2  frozen YOLO + refinement heads   (module2_mixed/train.py)
* stage 3  frozen image branch + radar/ensemble heads on the radar/camera
           dataset                          (module3_our_dataset/train.py)

Differences by design: one jit'd step per batch (forward+backward+update
fused), padded fixed-shape batches (compile once; multiscale hits a small
cache), checkpoint every epoch via io.checkpoint, metrics to JSONL (+TB
when available), optional mesh for data-parallel scaling.

Radar heatmaps are rasterized ON DEVICE from the padded point clouds
inside a tiny jit'd ingest fn — the reference rasterizes per-item in
DataLoader workers with np.histogram2d (datasets.py:56-106).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from millieye_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from millieye_tpu.ops import letterbox as lb
from millieye_tpu.ops.rasterize import radar_heatmap
from millieye_tpu.train.logging import MetricsLogger
from millieye_tpu.train.optim import (frozen_adam, STAGE2_FROZEN,
                                      STAGE3_FROZEN)
from millieye_tpu.train.steps import (init_train_state, make_yolo_train_step,
                                      make_refine_train_step,
                                      make_fusion_train_step)


@functools.lru_cache(maxsize=8)
def _map_ingest(frame_size, img_size):
    @jax.jit
    def ingest(points, pmask):
        def one(p, m):
            heat = radar_heatmap(p, m, frame_size)
            heat, _ = lb.pad_to_square(heat, 0.0)
            return lb.resize_bilinear_align_corners(heat, img_size // 16)
        return jax.vmap(one)(points, pmask)
    return ingest


_HOST_BATCH_KEYS = ("paths", "frame_size", "radar_points", "pmask",
                    "_n", "brightness")


def fusion_device_batch(batch, img_size):
    """Collated host batch -> device batch with rasterized radar maps.
    Host-side metadata (``_n``, ``brightness``) passes through unconverted
    so eval consumers never fetch it from device."""
    out = {k: jnp.asarray(v) for k, v in batch.items()
           if k not in _HOST_BATCH_KEYS}
    for k in ("_n", "brightness"):
        if k in batch:
            out[k] = batch[k]
    if "radar_points" in batch:
        w, h = batch.get("frame_size", (640, 480))
        ingest = _map_ingest((int(w), int(h)), img_size)
        out["radar_maps"] = ingest(jnp.asarray(batch["radar_points"]),
                                   jnp.asarray(batch["pmask"]))
    return out


class Trainer:
    """Shared epoch loop: step fn + loader + logging + checkpoints.

    The jit'd step DONATES the train state (buffers are consumed by XLA
    each step). Consequence for multi-stage recipes: seed the next
    stage's params from the trainer's RETURNED state (``fit``'s result /
    ``self.ts``), never from a pre-fit pytree you passed in — those
    buffers are deleted after the first step."""

    def __init__(self, step_fn, train_state, ckpt_dir, logdir=None,
                 log_every=10, name="stage", viz_fn=None, viz_every=50,
                 mesh=None):
        self.step = jax.jit(step_fn, donate_argnums=(0,))
        self.mesh = mesh
        if mesh is not None:
            # multi-chip data(+tensor) parallel path: the train state is
            # placed on the mesh and every batch is batch-dim sharded;
            # GSPMD inserts the gradient psum over "data" (and the
            # activation collectives over "model") from the input
            # shardings — the step function itself is unchanged
            from millieye_tpu import parallel
            train_state = parallel.shard_train_state(mesh, train_state)
        self.ts = train_state
        self.ckpt_dir = ckpt_dir
        self.logger = MetricsLogger(logdir or os.path.join(ckpt_dir, "logs"))
        self.log_every = log_every
        self.name = name
        # image-summary hook (TB image-grid equivalent, train.py:196-239):
        # viz_fn(train_state, device_batch) -> {tag: [N, H, W, C] float}
        self.viz_fn = viz_fn
        self.viz_every = viz_every
        os.makedirs(ckpt_dir, exist_ok=True)

    def fit(self, loader, epochs, rng, batch_fn, on_epoch_end=None):
        step_no = int(self.ts.step)
        for epoch in range(epochs):
            for batch in loader:
                rng, sub = jax.random.split(rng)
                device_batch = batch_fn(batch)
                if self.mesh is not None:
                    from millieye_tpu import parallel
                    device_batch = parallel.shard_batch(self.mesh,
                                                        device_batch)
                self.ts, metrics = self.step(self.ts, device_batch, sub)
                step_no += 1
                if step_no % self.log_every == 0:
                    self.logger.scalars(
                        step_no,
                        {k: v for k, v in metrics.items()
                         if jnp.ndim(v) == 0})
                    # checked only at log points: one D2H fetch per
                    # log_every steps, not per step (relay switch cost)
                    nrev = int(metrics.get("nonfinite_reverted", 0))
                    if nrev:
                        import sys
                        print(f"WARNING [{self.name}] step {step_no}: "
                              f"{nrev} non-finite param/BN elements "
                              "reverted (NaN/inf batch) — loss may be "
                              "poisoned; consider grad_clip",
                              file=sys.stderr, flush=True)
                if self.viz_fn and step_no % self.viz_every == 0:
                    for tag, imgs in self.viz_fn(self.ts,
                                                 device_batch).items():
                        self.logger.image_grid(step_no, tag,
                                               np.asarray(imgs))
            self.save(epoch)
            if on_epoch_end:
                on_epoch_end(epoch, self.ts)
        return self.ts

    def save(self, epoch):
        path = os.path.join(self.ckpt_dir, f"{self.name}_ckpt_{epoch}.npz")
        save_checkpoint(path, {"params": self.ts.params,
                               "state": self.ts.state})
        return path

    def resume(self, path):
        restored = load_checkpoint(path, {"params": self.ts.params,
                                          "state": self.ts.state})
        self.ts = self.ts._replace(params=restored["params"],
                                   state=restored["state"])


def yolo_trainer(model, params, state, ckpt_dir, lr=1e-3, every_k=2,
                 log_every=10, grad_clip=None, mesh=None):
    tx = frozen_adam(params, lr=lr, every_k=every_k, grad_clip=grad_clip)
    ts = init_train_state(params, state, tx)
    return Trainer(make_yolo_train_step(model, tx), ts, ckpt_dir,
                   name="yolo", log_every=log_every, mesh=mesh)


def refine_trainer(model, params, state, ckpt_dir, lr=5e-4, every_k=2,
                   log_every=10, grad_clip=None, mesh=None):
    tx = frozen_adam(params, lr=lr, frozen_prefixes=STAGE2_FROZEN,
                     every_k=every_k, grad_clip=grad_clip)
    ts = init_train_state(params, state, tx)
    return Trainer(make_refine_train_step(model, tx,
                                          frozen_prefixes=STAGE2_FROZEN),
                   ts, ckpt_dir,
                   name="module2", log_every=log_every, mesh=mesh)


def fusion_viz(model, mode=0):
    """Image-summary hook: radar heatmaps + learned radar attention
    (the reference's TensorBoard grids, module3 train.py:196-220)."""

    @jax.jit
    def render(params, state, batch):
        out = model.apply(params, state, batch["images"],
                          batch["radar_maps"], batch["radar_boxes"],
                          batch["rmask"], mode=mode)
        return batch["radar_maps"], out["radar_attention"]

    def viz(ts, batch):
        maps, attention = render(ts.params, ts.state, batch)
        return {"radar/maps": maps, "radar/attention": attention}

    return viz


def fusion_trainer(model, params, state, ckpt_dir, lr=5e-4, every_k=2,
                   mode=0, freeze_module2=True, viz=False, log_every=10,
                   grad_clip=None, mesh=None, fold_frozen=False):
    """``fold_frozen``: BN-fold the frozen darknet inside the step so the
    Pallas fused stem engages in the training forward (exact for the
    eval-mode frozen base detector; measured +26% step rate over the
    stopgrad-bf16 step, BENCH_DETAILS train_step_b8_fold_stem_bf16 —
    opt-in because it requires the darknet frozen and only pays when the
    model was built with pallas_stem_* args)."""
    frozen = STAGE3_FROZEN if freeze_module2 else (("darknet",),)
    tx = frozen_adam(params, lr=lr, grad_clip=grad_clip,
                     frozen_prefixes=frozen, every_k=every_k)
    ts = init_train_state(params, state, tx)
    return Trainer(make_fusion_train_step(model, tx, mode,
                                          frozen_prefixes=frozen,
                                          fold_frozen=fold_frozen),
                   ts, ckpt_dir,
                   name="module3", log_every=log_every,
                   viz_fn=fusion_viz(model, mode) if viz else None,
                   mesh=mesh)


def transfer_module2_to_fusion(refine_params, refine_state, fusion_params,
                               fusion_state):
    """Native-pytree equivalent of the reference's module2 -> module3
    cross-load (module3 train.py:117-149): copy the stage-2 RefineNetwork's
    fcn stack into img_cnn and its refinement nets 0-2 into the fusion
    refinement head (radar_net stays freshly initialized). Pair with
    ``STAGE3_FROZEN`` so the transferred subtrees stay frozen.
    """
    fusion_params = dict(fusion_params)
    fusion_state = dict(fusion_state)
    fusion_params["img_cnn"] = jax.tree.map(lambda x: x,
                                            refine_params["fcn"])
    fusion_state["img_cnn"] = jax.tree.map(lambda x: x,
                                           refine_state["fcn"])
    refine = dict(fusion_params["refine"])
    for net in ("net0", "net1", "net2"):
        refine[net] = refine_params["refine"][net]
    fusion_params["refine"] = refine
    return fusion_params, fusion_state
