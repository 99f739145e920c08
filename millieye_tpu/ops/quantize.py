"""Int8 weight quantization (serving): XLA deterministic path + Pallas
stochastic-rounding kernel.

Weight-only int8 halves (vs bf16) or quarters (vs f32) the HBM bytes the
backbone's weights occupy; dequantization fuses into the consuming conv.
Two rounding modes:

* ``quantize_int8``: per-channel absmax scaling with round-to-nearest —
  plain XLA, used for post-training quantization of frozen weights;
* ``quantize_int8_stochastic``: Pallas TPU kernel using the on-chip PRNG
  (``pltpu.prng_random_bits`` + ``pltpu.stochastic_round``) — unbiased
  rounding for quantization-aware flows, one kernel launch per tensor,
  everything VMEM-resident. CPU/tests run it in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def quantize_int8(w, axis=-1):
    """w -> (int8 values, float32 scales broadcastable along ``axis``)."""
    absmax = jnp.max(jnp.abs(w), axis=tuple(
        i for i in range(w.ndim) if i != (axis % w.ndim)), keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize(q, scale, dtype=jnp.float32):
    return q.astype(dtype) * scale.astype(dtype)


def _stochastic_kernel(seed_ref, scale_ref, x_ref, vals_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # distinct stream per grid tile
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    scaled = x_ref[:] / scale_ref[0]
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # stochastic round via uniform offset in [0, 1): floor(x + u) is an
    # unbiased integer rounding of x. Mosaic has no uint32->float cast;
    # the top-24-bit value fits int32, so bitcast first.
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24))
    vals_ref[:] = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(
        jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "row_tile"))
def quantize_int8_stochastic(w2d, seed, interpret=False, row_tile=512):
    """w2d [M, N] float -> (int8 values [M, N], float32 scale []) with a
    per-tensor scale and unbiased stochastic rounding on the TPU PRNG.
    Gridded over row tiles so arbitrarily large tensors fit VMEM; the
    absmax scale is a cheap XLA reduction outside the kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w2d = w2d.astype(jnp.float32)
    m, n = w2d.shape
    scale = jnp.maximum(jnp.max(jnp.abs(w2d)), 1e-8) / 127.0
    tile = min(row_tile, m)
    pad = (-m) % tile
    if pad:
        w2d = jnp.pad(w2d, ((0, pad), (0, 0)))
    grid = (w2d.shape[0] // tile,)
    vals = pl.pallas_call(
        _stochastic_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(w2d.shape, jnp.float32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), scale.reshape(1), w2d)
    return vals[:m].astype(jnp.int8), scale


def quantize_darknet(folded_params, axis=-1, act_absmax=None, act_skip=()):
    """Post-training weight-only int8 for a BN-folded darknet: conv
    weights [k, k, cin, cout] quantized per output channel; biases stay
    float. Handles both plain ("w") and space-to-depth-fused ("w2")
    slots. Returns a pytree of {"q"/"q2", "scale", "b"} / passthrough
    dicts consumable by ``dequantize_darknet`` or directly by
    ``Darknet.apply`` (in-graph dequant: the conv's HBM weight read is
    int8, the cast fuses into the consumer).

    ``act_absmax`` (from ``calibrate_act_scales``) additionally stores a
    per-conv input scale ``xs`` = absmax/127: ``Darknet.apply`` then runs
    those convs as int8 x int8 -> int32 on the MXU (2x bf16 peak on
    v5e). ``act_skip`` lists block indices to keep in float activations
    (default choice: the YOLO head convs — linear-activation outputs
    feed the exp/sigmoid decode, where quantization error hurts most;
    see ``Darknet.act_int8_skip``)."""
    out = []
    for i, p in enumerate(folded_params):
        if "w" in p and p["w"].ndim == 4:
            q, scale = quantize_int8(p["w"], axis=axis)
            d = {"q": q, "scale": scale, "b": p.get("b")}
        elif "w2" in p and p["w2"].ndim == 4:
            q, scale = quantize_int8(p["w2"], axis=axis)
            d = {"q2": q, "scale": scale, "b": p.get("b")}
        else:
            out.append(p)
            continue
        if act_absmax is not None and i not in act_skip:
            d["xs"] = jnp.maximum(
                jnp.asarray(act_absmax[i], jnp.float32), 1e-8) / 127.0
        out.append(d)
    return out


def calibrate_act_scales(darknet, folded_params, folded_state, batches,
                         compute_dtype=jnp.float32):
    """Per-conv input absmax over calibration batches -> array aligned
    with the block plan (feed to ``quantize_darknet(act_absmax=...)``).

    Run on the SAME graph shape that will serve (fold_s2d first if the
    serving config uses s2d stages)."""
    import numpy as np

    # weights as jit ARGUMENTS, not closure constants: a captured device
    # array must embed as an HLO constant, so every checkpoint/preset
    # calibrated would pay a fresh remote compile through the tunnel
    # (CLAUDE.md round-2 finding d)
    @jax.jit
    def stats(params, state, images):
        out = darknet.apply(params, state, images,
                            compute_dtype=compute_dtype,
                            collect_act_stats=True)
        return out["act_absmax"]

    mx = None
    for images in batches:
        s = np.asarray(stats(folded_params, folded_state, images))
        mx = s if mx is None else np.maximum(mx, s)
    return mx


def dequantize_darknet(qparams, dtype=jnp.float32):
    out = []
    for p in qparams:
        if "q" in p or "q2" in p:
            key = "w" if "q" in p else "w2"
            d = {key: dequantize(p.get("q", p.get("q2")), p["scale"], dtype)}
            if p.get("b") is not None:
                d["b"] = p["b"]
            out.append(d)
        else:
            out.append(p)
    return out
