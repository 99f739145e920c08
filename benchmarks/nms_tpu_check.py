"""On-chip exactness check: the Pallas NMS kernel vs the XLA fixpoint on
the REAL TPU (the CPU test suite can only run the kernel in interpret
mode). Run on the TPU host:

    python benchmarks/nms_tpu_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__  # noqa: F401  (compile cache)
    from millieye_tpu.ops.nms import nms_keep_mask
    from millieye_tpu.ops.nms_pallas import (nms_keep_mask_pallas,
                                             nms_keep_mask_pallas_blocked)

    rng = np.random.default_rng(0)
    for trial in range(5):
        b, k = 2, 512
        xy = rng.uniform(0, 400, size=(b, k, 2))
        wh = rng.uniform(5, 120, size=(b, k, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
        valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.1)
        for t in (0.3, 0.5, 0.7):
            fast = np.asarray(nms_keep_mask_pallas(boxes, valid, t))
            ref = np.stack([np.asarray(nms_keep_mask(boxes[i], valid[i], t))
                            for i in range(b)])
            np.testing.assert_array_equal(fast, ref)
            blk = np.asarray(nms_keep_mask_pallas_blocked(boxes, valid, t))
            np.testing.assert_array_equal(blk, ref)
    print("pallas NMS == XLA fixpoint on", jax.devices()[0])

    f_x = jax.jit(lambda bx, v: jax.vmap(
        lambda bb, vv: nms_keep_mask(bb, vv, 0.5))(bx, v))
    f_p = jax.jit(lambda bx, v: nms_keep_mask_pallas(bx, v, 0.5))
    f_b = jax.jit(lambda bx, v: nms_keep_mask_pallas_blocked(bx, v, 0.5))
    for name, f in (("xla", f_x), ("pallas", f_p), ("blocked", f_b)):
        jax.block_until_ready(f(boxes, valid))
        t0 = time.perf_counter()
        for _ in range(100):
            o = f(boxes, valid)
        jax.block_until_ready(o)
        print(f"{name}: {(time.perf_counter()-t0)/100*1e6:.0f} us")

    from benchmarks.backbone_profile import bench_scanned
    b32 = jnp.broadcast_to(boxes[:1], (32, k, 4)) + jnp.arange(
        32, dtype=jnp.float32)[:, None, None]
    v32 = jnp.broadcast_to(valid[:1], (32, k))
    for name, f in (
        ("xla_b32", lambda z: f_x(z, v32)),
        ("pallas_b32", lambda z: f_p(z, v32)),
        ("blocked_b32", lambda z: f_b(z, v32)),
    ):
        try:
            t = bench_scanned(f, b32, k=20)
            print(f"{name}: {t*1e6:.0f} us/batch (scan-amortized)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
