"""Split the pallas-RoI cost: XLA-side prep vs the kernel itself.

    python benchmarks/roi_prep_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import __graft_entry__  # noqa: F401
from benchmarks.backbone_profile import bench_scanned
from benchmarks.roi_variants import B, N, H, W, CU, PH, PW, make_inputs
from millieye_tpu.ops.roi_align import _batched_prep
from millieye_tpu.ops.roi_pallas import _launch, _round_up, _sum_matrix


def prep(features, boxes):
    b, h, w, c_in = features.shape
    ph, pw = PH, PW
    c_out = c_in // (ph * pw)
    n = boxes.shape[1]
    by, bx = _batched_prep(boxes, h, w, (ph, pw), 1.0 / 16, -0.5, 0.1,
                           -1, 4)
    k = w * c_out * pw
    k_pad = _round_up(k, 128)
    hs = _round_up(h, 8)
    fv = (features.astype(jnp.float32).reshape(b, h, w, c_out, ph, pw)
          .transpose(0, 4, 1, 2, 3, 5).reshape(b, ph, h, k))
    fv = jnp.pad(fv, ((0, 0), (0, 0), (0, hs - h), (0, k_pad - k)))
    byp = jnp.pad(by.astype(jnp.float32).transpose(0, 2, 1, 3),
                  ((0, 0), (0, 0), (0, 0), (0, hs - h)))
    bxe = jnp.broadcast_to(
        bx.astype(jnp.float32).transpose(0, 1, 3, 2)[:, :, :, None, :],
        (b, n, w, c_out, pw)).reshape(b, n, k)
    bxe = jnp.pad(bxe, ((0, 0), (0, 0), (0, k_pad - k)))
    s_mat = _sum_matrix(w, c_out * pw, k_pad)
    return byp, fv, bxe, s_mat


def main():
    feats, boxes = make_inputs()
    byp, fv, bxe, s_mat = jax.jit(prep)(feats, boxes)
    t_kern = bench_scanned(
        lambda _by, _fv=fv, _bxe=bxe, _s=s_mat: _launch(
            _by, _fv, _bxe, _s, PH, CU * PW, True, "default", False),
        byp, k=10)
    print(f"psroi kernel only (default): {t_kern*1e6:7.1f} us/batch",
          flush=True)
    t_prep = bench_scanned(lambda f, _b=boxes: prep(f, _b)[1], feats, k=10)
    print(f"psroi prep fv only: {t_prep*1e6:7.1f} us/batch", flush=True)
    t_bxe = bench_scanned(lambda f, _b=boxes: prep(f, _b)[2] + 0.0 * f[0, 0, 0, 0], feats, k=10)
    print(f"psroi prep bxe only: {t_bxe*1e6:7.1f} us/batch", flush=True)


if __name__ == "__main__":
    main()
