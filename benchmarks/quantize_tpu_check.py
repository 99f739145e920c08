"""On-chip check of the Pallas stochastic-rounding quantizer (the CPU
interpreter's PRNG is all-zeros, so distribution properties can only be
verified on real hardware):

    python benchmarks/quantize_tpu_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__  # noqa: F401
    from millieye_tpu.ops.quantize import quantize_int8_stochastic

    w = np.full((8, 128), 0.3, np.float32)
    w[0, 0] = 1.0                       # absmax carrier -> scale 1/127
    q0, s0 = quantize_int8_stochastic(jnp.asarray(w), seed=0)
    q1, _ = quantize_int8_stochastic(jnp.asarray(w), seed=1)
    q0, q1 = np.asarray(q0), np.asarray(q1)
    body = q0[1:].astype(np.float64) * float(s0)
    steps = np.unique(q0[1:])
    assert set(steps) <= {38, 39}, steps
    assert len(steps) == 2, "no stochastic behavior on chip?"
    assert abs(body.mean() - 0.3) < 0.003, body.mean()
    assert (q0 != q1).any(), "seeds produced identical streams"
    print(f"stochastic rounding OK on {jax.devices()[0]}: "
          f"mean {body.mean():.5f} vs 0.3, "
          f"p(39) = {(q0[1:] == 39).mean():.3f} (expect ~0.10)")


if __name__ == "__main__":
    main()
