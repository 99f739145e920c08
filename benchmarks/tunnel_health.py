"""Quick tunnel/chip health check: times a known MXU workload.

A [4096, 4096] bf16 matmul is ~137 GFLOP/execution; at the v5e's
197 TFLOP/s peak the scanned per-op time should be ~0.7-1.5 ms. A
healthy relay also keeps the dispatch floor ~1 ms. Prints one line so
campaign logs can assert the chip is in its normal performance state
before recording numbers (round-4 incident: every stem timing came out
~10-25x slow with consistent ratios — a degraded relay/chip session,
not a code change).

    python benchmarks/tunnel_health.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import __graft_entry__  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() != "cpu", "relay down (CPU fallback)"
    from benchmarks.backbone_profile import bench_scanned

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4096, 4096)), jnp.bfloat16)

    t = bench_scanned(lambda a: (a @ a).astype(jnp.bfloat16), x, k=20)
    flops = 2 * 4096 ** 3
    print(f"matmul4096_bf16: {t*1e6:.0f} us/op, "
          f"{flops/t/1e12:.1f} TFLOP/s "
          f"({100*flops/t/197e12:.0f}% of v5e peak)", flush=True)

    # dispatch floor: one tiny program round trip
    y = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(y))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(y)
    np.asarray(out)
    disp = (time.perf_counter() - t0) / 20
    print(f"dispatch_floor: {disp*1e6:.0f} us", flush=True)
    ok = flops / t > 5e13            # >= ~25% of peak
    print("HEALTH_OK" if ok else "HEALTH_DEGRADED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
