"""Pallas fused stem: conv3x3(s1) + bias + leaky + maxpool2(s2) in VMEM.

Why: the tiny-YOLO stem stages own 4.8 of the 6.75 ms b32-bf16 backbone
(stage 0 = a 3-input-channel conv at ~2% MXU lane utilization), and both
XLA-level rewrites fail end-to-end — s2d loses its per-stage win to
lane-dimension transposes, the im2col patch matmul is 7x slower
(strided-slice lowering). The only way to win is to keep the full-res
conv output OUT of HBM entirely: this kernel reads the padded input once,
builds the 27-lane tap patches in VMEM band by band, runs one
[rows*W, 9C] x [9C, D] MXU dot per band, applies bias+leaky and the 2x2
pool in registers, and writes only the pooled half-res result.

HBM traffic per image (416x416x3 f32 -> 208x208x16): read 2.1 MB + write
2.8 MB, vs the plain stage's ~13 MB full-res intermediate round trip.

``fused_stem(x, w, b)`` == ``maxpool2(leaky(conv3x3(x) + b))`` exactly
(tested vs the XLA composition; CPU/tests run interpret mode).

STATUS (round 2): interpret-mode exact; Mosaic (libtpu of 2026-08)
rejects both spellings of the in-VMEM patch build on real hardware —
lane-dim ``concatenate`` of 3-channel views ("result/input offset
mismatch on non-concat dimension") and ``stack`` + merged-minor
``reshape`` [2th, W, 9, C] -> [2th*W, 27] ("infer-vector-layout:
unsupported shape cast"). A working kernel needs the stencil layout
(W in lanes, weights stationary, per-tap sublane rotations) rather than
an im2col dot — round-3 work; the analysis and exactness harness here
are the groundwork.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, *, th, w_out, cin, cout,
                 n_bands):
    from jax.experimental import pallas as pl

    wm = w_ref[...]                       # [9*C, D], tap-major
    bias = b_ref[...]                     # [D]
    w_in = 2 * w_out                      # unpadded input width

    def band(i, _):
        # input rows for output band i: 2*i*th .. 2*i*th + 2*th+1 (+pad)
        x = x_ref[pl.dslice(2 * th * i, 2 * th + 2)]
        # 3x3 tap patches: 9 shifted views stacked into a new minor dim
        # (lane-dim CONCAT of 3-channel pieces hits Mosaic "offset
        # mismatch on non-concat dimension"; stack + merged-minor
        # reshape is the layout-friendly spelling)
        cols = [x[u:u + 2 * th, v:v + w_in, :]
                for u in range(3) for v in range(3)]
        z = jnp.stack(cols, axis=2)                   # [2th, W, 9, C]
        y = jax.lax.dot_general(
            z.reshape(2 * th * w_in, 9 * cin), wm,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [2th*W, D]
        y = y.reshape(2 * th, w_in, cout) + bias
        y = jnp.where(y > 0, y, 0.1 * y)
        # 2x2 pool: row pairs via a leading split, column pairs via a
        # minor-adjacent split (both Mosaic-friendly reshapes)
        y = y.reshape(th, 2, w_in, cout).max(1)       # [th, W, D]
        y = y.reshape(th, w_out, 2, cout).max(2)      # [th, W/2, D]
        o_ref[pl.dslice(th * i, th)] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_bands, band, 0)


@functools.partial(jax.jit,
                   static_argnames=("th", "interpret", "out_dtype"))
def fused_stem(x, w, b, th=26, interpret=False, out_dtype=None):
    """[N, H, W, C] -> [N, H/2, W/2, D] == maxpool2(leaky(conv3x3(x)+b)).

    ``th``: output rows per VMEM band (H/2 % th == 0). Compute is f32 on
    the MXU regardless of input dtype (the stem is where low-precision
    STORES lose dark-frame contrast — see Darknet.hi_prec_stages);
    ``out_dtype`` sets the store dtype (default: x.dtype).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w_in, cin = x.shape
    cout = w.shape[3]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert h % 2 == 0 and w_in % 2 == 0 and (h // 2) % th == 0
    out_dtype = out_dtype or x.dtype

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # tap-major weight matrix, matching the patch concat order (u, v, c)
    wm = w.astype(jnp.float32).reshape(9 * cin, cout)

    kernel = functools.partial(_stem_kernel, th=th, w_out=w_in // 2,
                               cin=cin, cout=cout, n_bands=h // 2 // th)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h + 2, w_in + 2, cin),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h // 2, w_in // 2, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w_in // 2, cout),
                                       out_dtype),
        interpret=interpret,
    )(xp, wm, b.astype(jnp.float32))
