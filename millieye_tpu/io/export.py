"""AOT serving-artifact export: the full fusion inference step as a
self-contained, versioned StableHLO blob (``jax.export``).

The reference deploys by shipping Python model code + ``.pth`` weights
and rebuilding the torch graph on the target (``run_mp.py``). The
TPU-native deployment story is ahead-of-time: trace + lower the ONE
compiled serving step (letterboxed images + radar inputs -> padded
detections), bake the folded weights in as constants, and serialize.
The target process then needs only jax + the blob — no model
definitions, no checkpoint loading, no retracing drift between the
evaluated and the deployed graph.

    blob = export_serving(model, params, state, batch_size=1)
    open("fusion_serving.mlir", "wb").write(blob)
    # deployment side:
    step = load_serving(open("fusion_serving.mlir", "rb").read())
    out = step(images, radar_maps, radar_boxes, rmask)
    out["boxes"], out["valid"]   # padded [B, K+R, 8] rows + mask

Platform notes: the blob records the lowering platform(s). Exporting
from this box's CPU produces a CPU artifact; pass
``platforms=("tpu",)`` to cross-lower for TPU serving (the Pallas
serving presets embed Mosaic custom calls and must be exported ON a
TPU backend; the XLA presets — f32/bf16/bf16_f16stem/s2d/int8 —
cross-lower from anywhere).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def export_serving(model, params, state, batch_size=1, mode=0,
                   platforms=None):
    """Serialize the fusion inference step to a portable blob (bytes).

    model/params/state: a built ``FusionNetwork`` (BN folding the
    darknet first is the caller's choice — fold for serving). Weights
    are baked into the artifact as constants (self-contained; keep them
    host-resident when exporting through a relay). ``mode`` is baked
    static like the reference's per-run mode flag.

    Returns ``Exported.serialize()`` bytes (versioned; stable across
    jax releases per the jax.export compatibility contract).
    """
    from jax import export as jexport

    s = model.darknet.img_size
    r = model.cfg.max_radar

    # Weights are CLOSED OVER (baked as constants): numpy leaves (the
    # shape checkpoints load as) must become jax arrays first — numpy
    # promotes `bf16_array + python_float` to float32 (no weak types),
    # so a numpy-leaf bf16-cast head upcasts mid-stack during tracing
    # and the next conv sees mixed dtypes. Production eval paths are
    # immune (they jit with weights as ARGUMENTS, converted at the jit
    # boundary); only constant-baking paths need this.
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    def step(images, radar_maps, radar_boxes, rmask):
        out = model.apply(params, state, images, radar_maps,
                          radar_boxes, rmask, mode=mode)
        return {"boxes": out["boxes"], "valid": out["valid"]}

    args = (
        jax.ShapeDtypeStruct((batch_size, s, s, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, s // 16, s // 16, 3),
                             jnp.float32),
        jax.ShapeDtypeStruct((batch_size, r, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, r), jnp.bool_),
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exp = jexport.export(jax.jit(step), **kw)(*args)
    return exp.serialize()


def load_serving(blob):
    """Deserialize an ``export_serving`` blob into a callable.

    The callable runs under ``jax.jit`` on the current default backend
    (which must be one of the blob's recorded platforms) with the same
    signature the step was exported with:
    ``f(images, radar_maps, radar_boxes, rmask) -> {boxes, valid}``.
    """
    from jax import export as jexport

    exp = jexport.deserialize(blob)

    def step(images, radar_maps, radar_boxes, rmask):
        return exp.call(images, radar_maps, radar_boxes, rmask)

    return jax.jit(step)
