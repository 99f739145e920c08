"""RoIAlign / PSRoIAlign vs. an independent looped numpy reference.

The reference below transcribes the published torchvision kernel algorithm
(adaptive sampling, bilinear taps, border behavior) in plain loops; the
framework op must match it exactly. torchvision itself is not in this
image — when it is available, these cases double as cross-checks.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from millieye_tpu.ops.roi_align import roi_align, ps_roi_align


def bilinear(fm, y, x):
    """fm [H, W, C]; torchvision bilinear_interpolate semantics."""
    h, w = fm.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(fm.shape[-1])
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return ((1 - ly) * (1 - lx) * fm[y0, x0] + (1 - ly) * lx * fm[y0, x1]
            + ly * (1 - lx) * fm[y1, x0] + ly * lx * fm[y1, x1])


def np_roi_align(features, rois, out_size, scale, sampling_ratio=-1):
    ph, pw = out_size
    outs = []
    for roi in rois:
        b = int(roi[0])
        fm = features[b]
        sx, sy = roi[1] * scale, roi[2] * scale
        rw = max(roi[3] * scale - sx, 1.0)
        rh = max(roi[4] * scale - sy, 1.0)
        bh, bw = rh / ph, rw / pw
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / ph))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / pw))
        out = np.zeros((ph, pw, fm.shape[-1]))
        for i in range(ph):
            for j in range(pw):
                acc = 0.0
                for iy in range(gh):
                    for ix in range(gw):
                        y = sy + i * bh + (iy + 0.5) * bh / gh
                        x = sx + j * bw + (ix + 0.5) * bw / gw
                        acc = acc + bilinear(fm, y, x)
                out[i, j] = acc / (gh * gw)
        outs.append(out)
    return np.stack(outs)


def np_ps_roi_align(features, rois, out_size, scale, sampling_ratio=-1):
    ph, pw = out_size
    c_in = features.shape[-1]
    c_out = c_in // (ph * pw)
    outs = []
    for roi in rois:
        b = int(roi[0])
        fm = features[b]
        sx = roi[1] * scale - 0.5
        sy = roi[2] * scale - 0.5
        rw = max(roi[3] * scale - sx - 0.5, 0.1)
        rh = max(roi[4] * scale - sy - 0.5, 0.1)
        bh, bw = rh / ph, rw / pw
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / ph))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / pw))
        gh, gw = max(gh, 1), max(gw, 1)
        out = np.zeros((ph, pw, c_out))
        for i in range(ph):
            for j in range(pw):
                # torch channel order: c_in = (c_out*ph + i)*pw + j
                ch = np.array([(c * ph + i) * pw + j for c in range(c_out)])
                acc = 0.0
                for iy in range(gh):
                    for ix in range(gw):
                        y = sy + i * bh + (iy + 0.5) * bh / gh
                        x = sx + j * bw + (ix + 0.5) * bw / gw
                        acc = acc + bilinear(fm[..., ch], y, x)
                out[i, j] = acc / (gh * gw)
        outs.append(out)
    return np.stack(outs)


def make_rois(rng, n_img, k, img=416):
    rois = np.zeros((k, 5), np.float32)
    rois[:, 0] = rng.integers(0, n_img, size=k)
    xy = rng.uniform(0, img - 40, size=(k, 2))
    wh = rng.uniform(8, img / 2, size=(k, 2))
    rois[:, 1:3] = xy
    rois[:, 3:5] = np.minimum(xy + wh, img - 1)
    return rois


def test_roi_align_matches_reference(rng):
    feats = rng.normal(size=(2, 26, 26, 10)).astype(np.float32)
    rois = make_rois(rng, 2, 12)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               (7, 7), 1 / 16, sampling_max=4))
    want = np_roi_align(feats, rois, (7, 7), 1 / 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_fixed_sampling(rng):
    feats = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    rois = make_rois(rng, 1, 5, img=256)
    got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                               (3, 3), 1 / 16, sampling_ratio=2, sampling_max=4))
    want = np_roi_align(feats, rois, (3, 3), 1 / 16, sampling_ratio=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ps_roi_align_matches_reference(rng):
    # 490 = 10 * 7 * 7, the fusion score-map shape (my_models.py:486,495)
    feats = rng.normal(size=(2, 26, 26, 490)).astype(np.float32)
    rois = make_rois(rng, 2, 8)
    got = np.asarray(ps_roi_align(jnp.asarray(feats), jnp.asarray(rois),
                                  (7, 7), 1 / 16, sampling_max=4))
    want = np_ps_roi_align(feats, rois, (7, 7), 1 / 16)
    assert got.shape == (8, 7, 7, 10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_degenerate_rois_no_nan(rng):
    feats = rng.normal(size=(1, 26, 26, 49)).astype(np.float32)
    rois = np.zeros((4, 5), np.float32)  # zero-area padded rois
    out1 = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois)))
    out2 = np.asarray(ps_roi_align(jnp.asarray(feats), jnp.asarray(rois)))
    assert np.isfinite(out1).all() and np.isfinite(out2).all()


def test_einsum_matches_gather_roi_align(rng):
    """The gather-free separable-matmul path must equal the tap-gather
    golden implementation bit-for-bit (same float32 math)."""
    from millieye_tpu.ops.roi_align import roi_align, _roi_align_gather
    feats = jnp.asarray(rng.standard_normal((2, 13, 13, 6)), jnp.float32)
    rois = make_rois(rng, 2, 24, img=200)
    a = roi_align(feats, rois, (7, 7), 1.0 / 16, method="einsum")
    b = _roi_align_gather(feats, rois, (7, 7), 1.0 / 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_einsum_matches_gather_ps_roi_align(rng):
    from millieye_tpu.ops.roi_align import (ps_roi_align,
                                            _ps_roi_align_gather)
    feats = jnp.asarray(rng.standard_normal((2, 13, 13, 49 * 4)), jnp.float32)
    rois = make_rois(rng, 2, 24, img=200)
    a = ps_roi_align(feats, rois, (7, 7), 1.0 / 16, method="einsum")
    b = _ps_roi_align_gather(feats, rois, (7, 7), 1.0 / 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_batched_variants_match_flat(rng):
    """roi_align_batched / ps_roi_align_batched must equal the flat-roi
    API given the blocked per-image layout the fusion network uses."""
    from millieye_tpu.ops.roi_align import (roi_align, ps_roi_align,
                                            roi_align_batched,
                                            ps_roi_align_batched)
    b, n = 2, 12
    feats = jnp.asarray(rng.standard_normal((b, 13, 13, 10)), jnp.float32)
    ps_feats = jnp.asarray(rng.standard_normal((b, 13, 13, 490)),
                           jnp.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    xy = rng.uniform(0, 150, size=(b, n, 2))
    wh = rng.uniform(8, 100, size=(b, n, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    batch_col = np.repeat(np.arange(b, dtype=np.float32), n)[:, None]
    rois = np.concatenate([batch_col, boxes.reshape(-1, 4)], -1)

    got = roi_align_batched(feats, jnp.asarray(boxes))
    want = roi_align(feats, jnp.asarray(rois))
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 7, 7, 10),
                               np.asarray(want), rtol=1e-5, atol=1e-5)

    got_ps = ps_roi_align_batched(ps_feats, jnp.asarray(boxes))
    want_ps = ps_roi_align(ps_feats, jnp.asarray(rois))
    np.testing.assert_allclose(np.asarray(got_ps).reshape(-1, 7, 7, 10),
                               np.asarray(want_ps), rtol=1e-5, atol=1e-5)


def test_pallas_roi_matches_einsum(rng):
    """ops/roi_pallas.py (interpret): the VMEM-resident kernel must match
    the einsum formulation — exactly at precision="highest", to ~2^-16 at
    "split", and within bf16-input rounding at "default" (the serving
    mode, same rounding class as the bf16 heads ladder)."""
    from millieye_tpu.ops.roi_align import (ps_roi_align_batched,
                                            roi_align_batched)
    from millieye_tpu.ops.roi_pallas import (ps_roi_align_pallas,
                                             roi_align_pallas)

    b, n = 2, 12
    feats = jnp.asarray(rng.standard_normal((b, 13, 13, 10)), jnp.float32)
    ps_feats = jnp.asarray(rng.standard_normal((b, 13, 13, 490)),
                           jnp.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    xy = rng.uniform(0, 150, size=(b, n, 2))
    wh = rng.uniform(8, 100, size=(b, n, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + wh
    boxes = jnp.asarray(boxes)

    want = np.asarray(roi_align_batched(feats, boxes))
    want_ps = np.asarray(ps_roi_align_batched(ps_feats, boxes))
    for prec, atol in (("highest", 1e-5), ("split", 1e-3),
                       ("default", 5e-2)):
        got = np.asarray(roi_align_pallas(feats, boxes, precision=prec,
                                          interpret=True))
        np.testing.assert_allclose(got, want, rtol=atol, atol=atol,
                                   err_msg=f"radar {prec}")
        got_ps = np.asarray(ps_roi_align_pallas(ps_feats, boxes,
                                                precision=prec,
                                                interpret=True))
        np.testing.assert_allclose(got_ps, want_ps, rtol=atol, atol=atol,
                                   err_msg=f"ps {prec}")


def test_pallas_ps_roi_channel_order_puq(rng):
    """channel_order="puq" + ps_channel_perm-permuted features must equal
    the torch-order path (the serving wiring permutes the producing
    conv's output channels instead of relaying the 50 MB map)."""
    from millieye_tpu.ops.roi_pallas import (ps_channel_perm,
                                             ps_roi_align_pallas)

    b, n, c_out = 2, 8, 10
    feats = jnp.asarray(rng.standard_normal((b, 13, 13, c_out * 49)),
                        jnp.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    xy = rng.uniform(0, 150, size=(b, n, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + rng.uniform(8, 100, size=(b, n, 2))
    boxes = jnp.asarray(boxes)
    want = np.asarray(ps_roi_align_pallas(feats, boxes,
                                          precision="highest",
                                          interpret=True))
    perm = ps_channel_perm(c_out, 7, 7)
    got = np.asarray(ps_roi_align_pallas(feats[..., perm], boxes,
                                         precision="highest",
                                         interpret=True,
                                         channel_order="puq"))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fusion_roi_impl_pallas_matches_einsum(rng):
    """FusionNetwork(roi_impl="pallas", precision="split") must
    reproduce the einsum build's detections at the box level (CPU
    interpret; exercises the in-graph channel permutation too)."""
    import jax
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork

    S = 128
    dn = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    base_cfg = dict(conf_thresh=0.05, max_det=16, max_radar=4,
                    pre_nms_top_k=64, nms_use_pallas=False)
    m_ein = FusionNetwork(dn, FusionConfig(**base_cfg))
    m_pal = FusionNetwork(dn, FusionConfig(roi_impl="pallas",
                                           roi_precision="split",
                                           **base_cfg))
    params, state = m_ein.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(size=(2, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(2, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((2, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(2, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    rb = jnp.asarray(rb)
    rv = jnp.ones((2, 4), bool)
    out_e = m_ein.apply(params, state, x, maps, rb, rv, mode=0)
    out_p = m_pal.apply(params, state, x, maps, rb, rv, mode=0)
    assert bool(jnp.all(out_e["valid"] == out_p["valid"]))
    np.testing.assert_allclose(np.asarray(out_p["boxes"]),
                               np.asarray(out_e["boxes"]),
                               rtol=2e-3, atol=2e-3)


def test_pallas_ps_roi_padded_channels(rng):
    """ps_roi_align_pallas_padded over perm+padded channels == the
    torch-order kernel (and hence the einsum)."""
    from millieye_tpu.ops.roi_pallas import (ps_channel_perm_pad,
                                             ps_roi_align_pallas,
                                             ps_roi_align_pallas_padded)

    b, n, c_out = 2, 8, 10
    feats = jnp.asarray(rng.standard_normal((b, 13, 13, c_out * 49)),
                        jnp.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    xy = rng.uniform(0, 150, size=(b, n, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + rng.uniform(8, 100, size=(b, n, 2))
    boxes = jnp.asarray(boxes)
    want = np.asarray(ps_roi_align_pallas(feats, boxes,
                                          precision="highest",
                                          interpret=True))
    dst = ps_channel_perm_pad(c_out, 7, 7)
    fpad = np.zeros(feats.shape[:-1] + (7 * 128,), np.float32)
    fpad[..., dst] = np.asarray(feats)
    got = np.asarray(ps_roi_align_pallas_padded(
        jnp.asarray(fpad), boxes, c_out=c_out, precision="highest",
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    from millieye_tpu.ops.roi_pallas import ps_roi_align_pallas_padded_g1
    got1 = np.asarray(ps_roi_align_pallas_padded_g1(
        jnp.asarray(fpad), boxes, c_out=c_out, precision="highest",
        interpret=True))
    np.testing.assert_allclose(got1, want, rtol=1e-4, atol=1e-5)
    # the VPU segmented-reduce spelling replaces the S-matrix matmul
    # with a minor-split + sublane sum — identical math at "highest"
    gotv = np.asarray(ps_roi_align_pallas_padded_g1(
        jnp.asarray(fpad), boxes, c_out=c_out, precision="highest",
        interpret=True, reduce="vpu"))
    np.testing.assert_allclose(gotv, want, rtol=1e-4, atol=1e-5)
    # "default" pre-rounds the products to bf16 (the S-dot's operand
    # rounding class) — agreement at bf16 tolerance
    gotd = np.asarray(ps_roi_align_pallas_padded_g1(
        jnp.asarray(fpad), boxes, c_out=c_out, precision="default",
        interpret=True, reduce="vpu"))
    np.testing.assert_allclose(gotd, want, rtol=3e-2, atol=3e-2)


def test_pallas_radar_roi_pack_p_matches_loop(rng):
    """roi_align_pallas pack_p=True (one [P*N, H] dot chain) == the
    per-p loop kernel at every precision rung."""
    from millieye_tpu.ops.roi_pallas import roi_align_pallas

    b, n, c = 2, 8, 10
    feats = jnp.asarray(rng.standard_normal((b, 13, 13, c)), jnp.float32)
    boxes = np.zeros((b, n, 4), np.float32)
    xy = rng.uniform(0, 150, size=(b, n, 2))
    boxes[..., :2] = xy
    boxes[..., 2:] = xy + rng.uniform(8, 100, size=(b, n, 2))
    boxes = jnp.asarray(boxes)
    for prec, tol in (("highest", 1e-5), ("split", 1e-3),
                      ("default", 3e-2)):
        want = np.asarray(roi_align_pallas(feats, boxes, precision=prec,
                                           interpret=True, pack_p=False))
        got = np.asarray(roi_align_pallas(feats, boxes, precision=prec,
                                          interpret=True, pack_p=True))
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol,
                                   err_msg=prec)


def test_large_roi_needs_raised_sampling_max():
    """An image-spanning RoI on a 38-cell map (608 px at 1/16) needs
    gh = ceil(38/7) = 6 sample rows; sampling_max=4 CLAMPS the grid and
    silently diverges from the adaptive torchvision semantics, while the
    derived bound (models.fusion._eff_sampling_max) matches the
    unclamped numpy oracle exactly."""
    from millieye_tpu.models.fusion import FusionConfig, _eff_sampling_max

    rng = np.random.default_rng(11)
    fm = rng.standard_normal((1, 38, 38, 8)).astype(np.float32)
    rois = np.array([[0, 3.0, 5.0, 600.0, 595.0]], np.float32)  # ~full img
    ref = np_roi_align(fm, rois, (7, 7), 1.0 / 16)

    smax = _eff_sampling_max(FusionConfig(), 608)
    assert smax == 6
    got = np.asarray(roi_align(jnp.asarray(fm), jnp.asarray(rois), (7, 7),
                               1.0 / 16, sampling_max=smax))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    clamped = np.asarray(roi_align(jnp.asarray(fm), jnp.asarray(rois),
                                   (7, 7), 1.0 / 16, sampling_max=4))
    assert np.abs(clamped - ref).max() > 1e-4   # the bug being guarded

    # 416 px keeps the default grid — no perf change at the flagship size
    assert _eff_sampling_max(FusionConfig(), 416) == 4
