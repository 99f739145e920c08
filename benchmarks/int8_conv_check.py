"""Microbenchmark: does XLA:TPU emit int8 MXU convs from int8 inputs?

Times a large conv (32x52x52x256 -> 512, 3x3, 204 GFLOP) three ways —
f32, bf16, int8 x int8 -> int32 — chained inside one lax.scan program so
the tunnel's ~1 ms dispatch floor amortizes away. The carry feeds the
conv output straight back as the next input (cheap elementwise renorm
only), so per-iteration time is conv-dominated. v5e peaks: ~98 f32 /
197 bf16 / 394 int8 TFLOP/s — if int8 lands near 2x bf16 the
int8-activation serving path pays; if XLA upcasts, it will read as f32.

    python benchmarks/int8_conv_check.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import __graft_entry__  # noqa: F401  (compile cache)

B, H, W, CIN, COUT = 32, 52, 52, 256, 256


def bench(x, w, out_dtype, renorm, k=20, iters=8):
    @jax.jit
    def scanned(x0):
        def body(c, _):
            y = lax.conv_general_dilated(
                c, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=out_dtype)
            return renorm(y), ()
        c, _ = lax.scan(body, x0, None, length=k)
        return c

    out = scanned(x)
    np.asarray(out[0, 0, 0, :1])                  # fetch barrier
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = scanned(x)
        np.asarray(out[0, 0, 0, :1])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    rng = np.random.default_rng(0)
    xf = rng.standard_normal((B, H, W, CIN)).astype(np.float32)
    wf = (rng.standard_normal((3, 3, CIN, COUT)) * 0.02).astype(np.float32)
    flops = 2 * B * H * W * CIN * COUT * 9

    cases = (
        ("f32", jnp.asarray(xf), jnp.asarray(wf), jnp.float32,
         lambda y: y * 0.02),
        ("bf16", jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16),
         jnp.bfloat16, lambda y: y * jnp.bfloat16(0.02)),
        ("int8", jnp.asarray(np.clip(xf * 16, -127, 127).astype(np.int8)),
         jnp.asarray(np.clip(wf * 1600, -127, 127).astype(np.int8)),
         jnp.int32,
         # renormalize int32 accum back to int8 range: shift keeps it
         # elementwise-cheap and fuses into the conv epilogue
         lambda y: jnp.clip(y >> 10, -127, 127).astype(jnp.int8)),
    )
    for name, xa, wa, od, rn in cases:
        dt = bench(xa, wa, od, rn)
        print(f"{name}: {dt*1e6:.0f} us/conv  "
              f"{flops/dt/1e12:.1f} TFLOP/s-equiv", flush=True)


if __name__ == "__main__":
    main()
