"""Microbenchmark: does XLA:TPU emit int8 MXU convs from int8 inputs?

Times a representative backbone conv (26x26x256 -> 512, 3x3) three ways —
f32, bf16, int8 x int8 -> int32 — scan-amortized past the tunnel's ~1 ms
program dispatch floor. If int8 lands near 2x bf16, an int8-activation
serving path is worth building; if XLA upcasts (no gain), it is not.

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


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def bench(x, w, out_dtype, k=30, iters=8):
    @jax.jit
    def scanned(x0):
        def body(c, _):
            y = conv(c, w, out_dtype)
            # keep a same-shape carry: renormalize to the input dtype
            c2 = y[..., : x0.shape[-1]].astype(x0.dtype)
            return c2, ()
        c, _ = lax.scan(body, x0, None, length=k)
        return c

    out = scanned(x)
    np.asarray(out[0, 0, 0])                      # fetch barrier
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = scanned(x)
        np.asarray(out[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    rng = np.random.default_rng(0)
    b, h, wd, cin, cout = 8, 26, 26, 256, 512
    xf = rng.standard_normal((b, h, wd, cin)).astype(np.float32)
    wf = (rng.standard_normal((3, 3, cin, cout)) * 0.05).astype(np.float32)

    flops = 2 * b * h * wd * cin * cout * 9
    for name, xa, wa, od in (
        ("f32", jnp.asarray(xf), jnp.asarray(wf), jnp.float32),
        ("bf16", jnp.asarray(xf, jnp.bfloat16),
         jnp.asarray(wf, jnp.bfloat16), jnp.bfloat16),
        ("int8", jnp.asarray(np.clip(xf * 32, -127, 127).astype(np.int8)),
         jnp.asarray(np.clip(wf * 640, -127, 127).astype(np.int8)),
         jnp.int32),
    ):
        dt = bench(xa, wa, od)
        print(f"{name}: {dt*1e6:.0f} us/conv  "
              f"{flops/dt/1e12:.1f} TFLOP/s-equiv", flush=True)


if __name__ == "__main__":
    main()
