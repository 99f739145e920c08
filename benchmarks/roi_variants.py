"""On-chip bench of PS-RoIAlign einsum formulations.

The tail decomposition (fusion_profile.py tail) puts ~2.2 ms of the b32
graph in the RoI crops; the separable einsum's intermediate
t [B, N, P, Q, W, U] is 453 MB f32 at the operating point (B=32, N=232,
26x26 map, 7x7 bins, C_out=12), so the op should be HBM-traffic-bound:
t write + relayout for the second contraction + read ~= 1.8 GB. This
bench measures the current spelling against reorderings that shrink or
re-lay the intermediate, in f32 and bf16, to pick the serving spelling.

    python benchmarks/roi_variants.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import __graft_entry__  # noqa: F401  (compile cache)
from benchmarks.backbone_profile import bench_scanned
from millieye_tpu.ops.roi_align import (_batched_prep, ps_roi_align_batched,
                                        roi_align_batched)

B, N, H, W, CU, PH, PW = 32, 232, 26, 26, 12, 7, 7


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, H, W, CU * PH * PW)),
                        jnp.float32)
    boxes = np.zeros((B, N, 4), np.float32)
    boxes[..., :2] = rng.uniform(0, 300, (B, N, 2))
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 120, (B, N, 2))
    return feats, jnp.asarray(boxes)


def current(feats, boxes, cd):
    return ps_roi_align_batched(feats, boxes, (PH, PW), 1.0 / 16,
                                sampling_max=4, compute_dtype=cd)


def single_einsum(feats, boxes, cd):
    """One 3-operand einsum: let XLA pick the contraction order."""
    by, bx = _batched_prep(boxes, H, W, (PH, PW), 1.0 / 16, -0.5, 0.1,
                           -1, 4)
    fv = feats.astype(cd).reshape(B, H, W, CU, PH, PW)
    return jnp.einsum("bnph,bnqw,bhwupq->bnpqu", by.astype(cd),
                      bx.astype(cd), fv,
                      preferred_element_type=jnp.float32)


def per_p(feats, boxes, cd):
    """Loop the 7 bin rows: t_p is [B, N, Q, W, U] (65 MB f32), q rides
    next to n for the second contraction."""
    by, bx = _batched_prep(boxes, H, W, (PH, PW), 1.0 / 16, -0.5, 0.1,
                           -1, 4)
    by, bx = by.astype(cd), bx.astype(cd)
    fv = feats.astype(cd).reshape(B, H, W, CU, PH, PW)
    outs = []
    for p in range(PH):
        t = jnp.einsum("bnh,bhwuq->bnqwu", by[:, :, p], fv[..., p, :],
                       preferred_element_type=jnp.float32).astype(cd)
        outs.append(jnp.einsum("bnqw,bnqwu->bnqu", bx, t,
                               preferred_element_type=jnp.float32))
    return jnp.stack(outs, axis=2)                      # [B, N, P, Q, U]


def w_first(feats, boxes, cd):
    """Contract w first (bx side), then h."""
    by, bx = _batched_prep(boxes, H, W, (PH, PW), 1.0 / 16, -0.5, 0.1,
                           -1, 4)
    by, bx = by.astype(cd), bx.astype(cd)
    fv = feats.astype(cd).reshape(B, H, W, CU, PH, PW)
    t = jnp.einsum("bnqw,bhwupq->bnpqhu", bx, fv,
                   preferred_element_type=jnp.float32).astype(cd)
    return jnp.einsum("bnph,bnpqhu->bnpqu", by, t,
                      preferred_element_type=jnp.float32)


def q_major(feats, boxes, cd):
    """h-first but with fv pre-transposed so the t layout comes out with
    (n, q) adjacent for the second contraction's batch dims."""
    by, bx = _batched_prep(boxes, H, W, (PH, PW), 1.0 / 16, -0.5, 0.1,
                           -1, 4)
    by, bx = by.astype(cd), bx.astype(cd)
    fv = feats.astype(cd).reshape(B, H, W, CU, PH, PW)
    fq = fv.transpose(0, 4, 5, 1, 2, 3)                # [B, P, Q, H, W, U]
    t = jnp.einsum("bnph,bpqhwu->bnqpwu", by, fq,
                   preferred_element_type=jnp.float32).astype(cd)
    return jnp.einsum("bnqw,bnqpwu->bnpqu", bx, t,
                      preferred_element_type=jnp.float32)


def main():
    feats, boxes = make_inputs()
    ref = np.asarray(jax.jit(lambda f, b: current(f, b, None))(feats, boxes))
    variants = [("current", current), ("single", single_einsum),
                ("per_p", per_p), ("w_first", w_first),
                ("q_major", q_major)]
    for cd_name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        for name, fn in variants:
            got = np.asarray(jax.jit(
                lambda f, b, _fn=fn, _cd=cd: _fn(f, b, _cd))(feats, boxes))
            err = np.abs(got.astype(np.float32).reshape(ref.shape)
                         - ref).max()
            t = bench_scanned(lambda f, _fn=fn, _cd=cd, _b=boxes:
                              _fn(f, _b, _cd), feats, k=10)
            print(f"psroi {name:<8} {cd_name}: {t*1e6:7.1f} us/batch  "
                  f"maxerr {err:.2e}", flush=True)

    # the radar-side roi_align for scale (C=10 score map)
    rng = np.random.default_rng(1)
    rfeat = jnp.asarray(rng.standard_normal((B, H, W, 10)), jnp.float32)
    for cd_name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        t = bench_scanned(lambda f, _cd=cd, _b=boxes: roi_align_batched(
            f, _b, (PH, PW), 1.0 / 16, sampling_max=4, compute_dtype=_cd),
            rfeat, k=10)
        print(f"roi radar {cd_name}: {t*1e6:7.1f} us/batch", flush=True)


def pallas_rows():
    """On-chip rows for ops/roi_pallas.py (run with argv 'pallas')."""
    from millieye_tpu.ops.roi_pallas import (ps_roi_align_pallas,
                                             roi_align_pallas)
    feats, boxes = make_inputs()
    ref = np.asarray(jax.jit(lambda f, b: current(f, b, None))(feats, boxes))
    rng = np.random.default_rng(1)
    rfeat = jnp.asarray(rng.standard_normal((B, H, W, 10)), jnp.float32)
    rref = np.asarray(jax.jit(lambda f, b: roi_align_batched(
        f, b, (PH, PW), 1.0 / 16, sampling_max=4))(rfeat, boxes))
    for prec in ("highest", "split", "default"):
        got = np.asarray(ps_roi_align_pallas(feats, boxes, (PH, PW),
                                             1.0 / 16, sampling_max=4,
                                             precision=prec))
        err = np.abs(got.reshape(ref.shape) - ref).max()
        t = bench_scanned(lambda f, _p=prec, _b=boxes: ps_roi_align_pallas(
            f, _b, (PH, PW), 1.0 / 16, sampling_max=4, precision=_p),
            feats, k=10)
        print(f"psroi pallas {prec:<8}: {t*1e6:7.1f} us/batch  "
              f"maxerr {err:.2e}", flush=True)
        gotr = np.asarray(roi_align_pallas(rfeat, boxes, (PH, PW),
                                           1.0 / 16, sampling_max=4,
                                           precision=prec))
        errr = np.abs(gotr.reshape(rref.shape) - rref).max()
        tr = bench_scanned(lambda f, _p=prec, _b=boxes: roi_align_pallas(
            f, _b, (PH, PW), 1.0 / 16, sampling_max=4, precision=_p),
            rfeat, k=10)
        print(f"roi radar pallas {prec:<8}: {tr*1e6:7.1f} us/batch  "
              f"maxerr {errr:.2e}", flush=True)

    # p-major channel order (the serving wiring: the producing conv's
    # output channels are permuted, so the map is born p-major)
    from millieye_tpu.ops.roi_pallas import ps_channel_perm
    perm = ps_channel_perm(CU, PH, PW)
    fpuq = feats[..., perm]
    for prec in ("split", "default"):
        got = np.asarray(ps_roi_align_pallas(fpuq, boxes, (PH, PW),
                                             1.0 / 16, sampling_max=4,
                                             precision=prec,
                                             channel_order="puq"))
        err = np.abs(got.reshape(ref.shape) - ref).max()
        t = bench_scanned(lambda f, _p=prec, _b=boxes: ps_roi_align_pallas(
            f, _b, (PH, PW), 1.0 / 16, sampling_max=4, precision=_p,
            channel_order="puq"), fpuq, k=10)
        print(f"psroi pallas puq {prec:<8}: {t*1e6:7.1f} us/batch  "
              f"maxerr {err:.2e}", flush=True)


def pad128_rows():
    """Padded-channel grid-(b,p) kernel (argv 'pad128'): consumes the
    conv's natural NHWC output directly — no feature relayout at all."""
    from millieye_tpu.ops.roi_pallas import (ps_channel_perm_pad,
                                             ps_roi_align_pallas_padded)
    feats, boxes = make_inputs()
    ref = np.asarray(jax.jit(lambda f, b: current(f, b, None))(feats, boxes))
    dst = ps_channel_perm_pad(CU, PH, PW)
    fpad = np.zeros(feats.shape[:-1] + (PH * 128,), np.float32)
    fpad[..., dst] = np.asarray(feats)
    fpad = jnp.asarray(fpad)
    for prec in ("split", "default"):
        got = np.asarray(ps_roi_align_pallas_padded(
            fpad, boxes, (PH, PW), 1.0 / 16, sampling_max=4, c_out=CU,
            precision=prec))
        err = np.abs(got.reshape(ref.shape) - ref).max()
        t = bench_scanned(
            lambda f, _p=prec, _b=boxes: ps_roi_align_pallas_padded(
                f, _b, (PH, PW), 1.0 / 16, sampling_max=4, c_out=CU,
                precision=_p), fpad, k=10)
        print(f"psroi pallas pad128 {prec:<8}: {t*1e6:7.1f} us/batch  "
              f"maxerr {err:.2e}", flush=True)


def pad128_g1_rows():
    from millieye_tpu.ops.roi_pallas import (ps_channel_perm_pad,
                                             ps_roi_align_pallas_padded_g1)
    feats, boxes = make_inputs()
    ref = np.asarray(jax.jit(lambda f, b: current(f, b, None))(feats, boxes))
    dst = ps_channel_perm_pad(CU, PH, PW)
    fpad = np.zeros(feats.shape[:-1] + (PH * 128,), np.float32)
    fpad[..., dst] = np.asarray(feats)
    fpad = jnp.asarray(fpad)
    for prec in ("default", "split"):
        fn = jax.jit(lambda f, _p=prec, _b=boxes: ps_roi_align_pallas_padded_g1(
            f, _b, (PH, PW), 1.0 / 16, sampling_max=4, c_out=CU,
            precision=_p))
        try:
            got = np.asarray(fn(fpad))
            err = np.abs(got.reshape(ref.shape) - ref).max()
            t = bench_scanned(fn, fpad, k=10)
            print(f"psroi pallas pad128g1 {prec:<8}: {t*1e6:7.1f} us/batch"
                  f"  maxerr {err:.2e}", flush=True)
        except Exception as e:
            print(f"psroi pallas pad128g1 {prec}: FAILED "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    if "pad128g1" in sys.argv:
        pad128_g1_rows()
    elif "pad128" in sys.argv:
        pad128_rows()
    elif "pallas" in sys.argv:
        pallas_rows()
    else:
        main()
