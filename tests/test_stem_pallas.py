"""Pallas fused stem (ops/stem_pallas.py, interpret mode): exactness vs
the XLA conv+bias+leaky+pool composition. The real-hardware compile is
blocked on two Mosaic limitations (module docstring); this pins the
kernel's semantics for the round-3 stencil rewrite."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from millieye_tpu.ops.stem_pallas import fused_stem


def _plain(x, w, b):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO",
                                                    "NHWC")) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), [(0, 0)] * 4)


@pytest.mark.parametrize("shape,th", [((2, 32, 32, 3, 16), 8),
                                      ((1, 64, 48, 5, 8), 16)])
def test_fused_stem_matches_plain(shape, th):
    n, h, wd, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cout)),
                    jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(x, w, b)
    got = fused_stem(x, w, b, th=th, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_fused_stem_out_dtype():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((3, 3, 3, 4)), jnp.float32)
    b = jnp.zeros(4, jnp.float32)
    out = fused_stem(x, w, b, th=8, interpret=True,
                     out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16 and out.shape == (1, 8, 8, 4)
