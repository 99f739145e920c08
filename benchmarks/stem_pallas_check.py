"""On-chip check + bench of the Pallas fused stem (ops/stem_pallas.py).

Correctness vs the XLA composition at the real stage-0/1 shapes, then
scan-amortized timing against the plain stage. Expected win: the plain
b32 stage-0 costs ~2.9 ms (full-res intermediate round-trips HBM at ~2%
MXU lane use); the kernel's HBM traffic is read-once/write-once.

    python benchmarks/stem_pallas_check.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import __graft_entry__  # noqa: F401
from benchmarks.backbone_profile import bench_scanned
from millieye_tpu.ops.stem_pallas import fused_stem


def plain(x, w, b):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO",
                                                    "NHWC")) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), [(0, 0)] * 4)


def main():
    rng = np.random.default_rng(0)
    for (b_sz, h, cin, cout, th) in ((32, 416, 3, 16, 26),
                                     (32, 208, 16, 32, 26),
                                     (1, 416, 3, 16, 26)):
        x = jnp.asarray(rng.uniform(-1, 1, (b_sz, h, h, cin)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.float32)
        bias = jnp.asarray(0.05 * rng.standard_normal(cout), jnp.float32)

        ref = np.asarray(jax.jit(plain)(x, w, bias))
        got = np.asarray(fused_stem(x, w, bias, th=th))
        err = np.abs(got - ref).max()
        print(f"b{b_sz} {h}x{cin}->{cout}: maxerr {err:.2e}", flush=True)
        assert err < 1e-3, err

        t_plain = bench_scanned(lambda z, _w=w, _b=bias: plain(z, _w, _b),
                                x, k=10)
        t_pallas = bench_scanned(
            lambda z, _w=w, _b=bias, _t=th: fused_stem(z, _w, _b, th=_t),
            x, k=10)
        print(f"  plain {t_plain*1e6:.0f} us  pallas {t_pallas*1e6:.0f} us"
              f"  ({t_plain/max(t_pallas,1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
