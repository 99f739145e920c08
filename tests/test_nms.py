"""NMS parity tests against an independent pure-python greedy reference."""
import numpy as np
import jax.numpy as jnp

from millieye_tpu.ops import batched_nms
from millieye_tpu.ops.nms import nms_xyxy


def ref_iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1])
    ub = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (ua + ub - inter + 1e-16)


def ref_batched_nms(boxes, scores, labels, iou_thresh):
    """Greedy class-aware NMS, the torchvision semantics."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if labels[i] == labels[j] and ref_iou(boxes[i], boxes[j]) > iou_thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def make_pred(rng, batch=2, n=300, classes=12):
    pred = np.zeros((batch, n, 5 + classes), np.float32)
    cxy = rng.uniform(30, 380, size=(batch, n, 2))
    wh = rng.uniform(10, 120, size=(batch, n, 2))
    pred[..., :2] = cxy
    pred[..., 2:4] = wh
    pred[..., 4] = rng.uniform(0, 1, size=(batch, n))
    pred[..., 5:] = rng.uniform(0, 1, size=(batch, n, classes))
    return pred


def test_batched_nms_matches_reference(rng):
    conf, iou_t = 0.3, 0.5
    pred = make_pred(rng)
    det, valid = batched_nms(jnp.asarray(pred), conf, iou_t, max_det=200, pre_top_k=256)
    det, valid = np.asarray(det), np.asarray(valid)

    for b in range(pred.shape[0]):
        p = pred[b]
        m = p[:, 4] >= conf
        p = p[m]
        boxes = np.stack(
            [
                p[:, 0] - p[:, 2] / 2,
                p[:, 1] - p[:, 3] / 2,
                p[:, 0] + p[:, 2] / 2,
                p[:, 1] + p[:, 3] / 2,
            ],
            -1,
        )
        labels = p[:, 5:].argmax(-1)
        keep = ref_batched_nms(boxes, p[:, 4], labels, iou_t)[:200]

        got = det[b][valid[b]]
        assert got.shape[0] == len(keep)
        np.testing.assert_allclose(got[:, :4], boxes[keep], rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got[:, 4], p[keep, 4], rtol=1e-5)
        np.testing.assert_array_equal(got[:, 6].astype(int), labels[keep])
        # full class-score tail carried through (7+c layout)
        np.testing.assert_allclose(got[:, 7:], p[keep, 5:], rtol=1e-5)


def test_batched_nms_max_det_cap(rng):
    pred = make_pred(rng, batch=1, n=500)
    pred[..., 4] = 0.9  # everything passes
    # spread boxes far apart so nothing suppresses
    pred[0, :, 0] = np.arange(500) * 200.0
    pred[0, :, 1] = 50.0
    pred[0, :, 2:4] = 10.0
    det, valid = batched_nms(jnp.asarray(pred), 0.5, 0.5, max_det=64, pre_top_k=512)
    assert int(np.asarray(valid).sum()) == 64


def test_batched_nms_empty(rng):
    pred = make_pred(rng, batch=1, n=100)
    pred[..., 4] = 0.0
    det, valid = batched_nms(jnp.asarray(pred), 0.5)
    assert int(np.asarray(valid).sum()) == 0


def test_nms_xyxy_direct(rng):
    n = 60
    boxes = rng.uniform(0, 300, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 80, size=(n, 2))
    scores = rng.uniform(0, 1, size=n).astype(np.float32)
    labels = rng.integers(0, 3, size=n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-10:] = False

    out, ov = nms_xyxy(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(valid), 0.3, 64,
    )
    out, ov = np.asarray(out), np.asarray(ov)
    keep = ref_batched_nms(boxes[:-10], scores[:-10], labels[:-10], 0.3)
    got = out[ov]
    assert got.shape[0] == len(keep)
    np.testing.assert_allclose(got[:, :4], boxes[keep], rtol=1e-5)
    np.testing.assert_allclose(got[:, 4], scores[keep], rtol=1e-5)


def test_fixpoint_keep_mask_equals_sequential(rng):
    """The fast fixpoint NMS must match the sequential greedy exactly."""
    from millieye_tpu.ops.nms import nms_keep_mask, nms_keep_mask_ref
    import jax.numpy as jnp
    for trial in range(20):
        k = 64
        xy = rng.uniform(0, 300, size=(k, 2))
        wh = rng.uniform(5, 120, size=(k, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
        valid = jnp.asarray(rng.uniform(size=k) > 0.2)
        for thr in (0.3, 0.5, 0.7):
            fast = np.asarray(nms_keep_mask(boxes, valid, thr))
            ref = np.asarray(nms_keep_mask_ref(boxes, valid, thr))
            np.testing.assert_array_equal(fast, ref)


def test_pallas_kernel_matches_fixpoint(rng):
    """Pallas NMS kernel (interpret mode on CPU) == XLA fixpoint == greedy."""
    from millieye_tpu.ops.nms import nms_keep_mask
    from millieye_tpu.ops.nms_pallas import nms_keep_mask_pallas
    import jax.numpy as jnp
    B, K = 2, 64
    xy = rng.uniform(0, 300, size=(B, K, 2))
    wh = rng.uniform(5, 120, size=(B, K, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, K)) > 0.2)
    for t in (0.3, 0.5):
        fast = np.asarray(nms_keep_mask_pallas(boxes, valid, t,
                                               interpret=True))
        ref = np.stack([np.asarray(nms_keep_mask(boxes[i], valid[i], t))
                        for i in range(B)])
        np.testing.assert_array_equal(fast, ref)


def test_batched_nms_untruncated_dense_conf001(rng):
    """VERDICT r2 #4: at the stage-3 TRAINING operating point
    (conf_thresh=0.01, module3 train.py:106-107) nearly every anchor
    passes the confidence filter — 2535 of 2535 here. The reference
    applies NMS to ALL of them (utils/utils.py:337-378, no pre-top-k);
    with pre_top_k covering every anchor the padded on-device NMS must
    match the untruncated python reference row for row."""
    conf, iou_t, n = 0.01, 0.5, 2535
    pred = make_pred(rng, batch=2, n=n)
    pred[..., 4] = rng.uniform(0.011, 1.0, size=pred.shape[:2])  # all pass
    det, valid = batched_nms(jnp.asarray(pred), conf, iou_t, max_det=200,
                             pre_top_k=n, use_pallas=False)
    det, valid = np.asarray(det), np.asarray(valid)

    for b in range(pred.shape[0]):
        p = pred[b]
        boxes = np.stack([p[:, 0] - p[:, 2] / 2, p[:, 1] - p[:, 3] / 2,
                          p[:, 0] + p[:, 2] / 2, p[:, 1] + p[:, 3] / 2], -1)
        labels = p[:, 5:].argmax(-1)
        keep = ref_batched_nms(boxes, p[:, 4], labels, iou_t)[:200]
        got = det[b][valid[b]]
        assert got.shape[0] == len(keep)
        np.testing.assert_allclose(got[:, :4], boxes[keep], rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(got[:, 4], p[keep, 4], rtol=1e-5)
        np.testing.assert_array_equal(got[:, 6].astype(int), labels[keep])


def test_pre_top_k_truncation_sufficiency(rng):
    """Truncation to the top-K objectness rows is exact iff <=K rows pass
    OR >=max_det of the top K survive suppression (suppression only flows
    down the ranking). Checks both sides: a dense-but-spread scene where
    the condition holds and top-512 == untruncated, and an adversarial
    pile-up (every box stacked on one spot) where it fails and
    ops.nms.pre_top_k_sufficient flags it."""
    from millieye_tpu.ops.nms import pre_top_k_sufficient

    conf, iou_t, n, k, max_det = 0.01, 0.5, 2535, 512, 200
    # spread scene: boxes everywhere -> plenty of survivors in the top 512
    pred = make_pred(rng, batch=1, n=n)
    pred[..., 4] = rng.uniform(0.011, 1.0, size=pred.shape[:2])
    ok = np.asarray(pre_top_k_sufficient(jnp.asarray(pred), conf, iou_t,
                                         max_det=max_det, pre_top_k=k))
    assert ok.all()
    full, fv = batched_nms(jnp.asarray(pred), conf, iou_t, max_det=max_det,
                           pre_top_k=n, use_pallas=False)
    trunc, tv = batched_nms(jnp.asarray(pred), conf, iou_t, max_det=max_det,
                            pre_top_k=k, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(tv))
    np.testing.assert_allclose(np.asarray(full), np.asarray(trunc),
                               rtol=1e-6)

    # adversarial pile-up: one class, all boxes overlapping -> 1 survivor
    # in the top 512, while 2535 pass: rows ranked past 512 are LOST
    bad = make_pred(rng, batch=1, n=n)
    bad[..., :2] = 200.0
    bad[..., 2:4] = 50.0
    bad[..., 4] = np.linspace(0.9, 0.02, n)[None]
    bad[..., 5:] = 0.0
    bad[..., 5] = 1.0
    ok = np.asarray(pre_top_k_sufficient(jnp.asarray(bad), conf, iou_t,
                                         max_det=max_det, pre_top_k=k))
    assert not ok.any()


def test_blocked_pallas_keep_mask_bit_identical(rng):
    """Block-sequential Pallas NMS (rank-ordered 128-row blocks, MXU
    fixpoint dots) must reproduce the XLA fixpoint / sequential-golden
    keep set bit-for-bit, including dense deep suppression chains."""
    import jax
    from millieye_tpu.ops.nms import nms_keep_mask
    from millieye_tpu.ops.nms_pallas import nms_keep_mask_pallas_blocked

    for k, spread, density in ((128, 60, 1.0), (512, 60, 0.9),
                               (512, 300, 0.4)):
        b = 2
        centers = rng.uniform(0, spread, (b, k, 2))
        wh = rng.uniform(10, 80, (b, k, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
        bj = jnp.asarray(boxes, jnp.float32)
        vj = jnp.asarray(rng.random((b, k)) < density)
        want = np.asarray(jax.vmap(lambda bb, vv: nms_keep_mask(
            bb, vv, 0.5, plus_one=False))(bj, vj))
        got = np.asarray(nms_keep_mask_pallas_blocked(bj, vj, 0.5,
                                                      interpret=True))
        np.testing.assert_array_equal(got, want)


def test_nms_kernel_selection_env_knobs(rng, monkeypatch):
    """MILLIEYE_NMS_BLOCKED=0 must route the use_pallas path to the
    whole-matrix kernel (the chip-proven fallback bench.py's ladder
    pins); default selects the blocked kernel at K % 128 == 0. Both
    return identical detections. Calls go through the UNJITTED function
    so the trace-time env read happens per call."""
    import millieye_tpu.ops.nms as nms_mod
    import millieye_tpu.ops.nms_pallas as np_mod

    calls = {"blocked": 0, "full": 0}
    orig_blocked = np_mod.nms_keep_mask_pallas_blocked
    orig_full = np_mod.nms_keep_mask_pallas

    def blocked(*a, **k):
        calls["blocked"] += 1
        return orig_blocked(*a, **dict(k, interpret=True))

    def full(*a, **k):
        calls["full"] += 1
        return orig_full(*a, **dict(k, interpret=True))

    monkeypatch.setattr(np_mod, "nms_keep_mask_pallas_blocked", blocked)
    monkeypatch.setattr(np_mod, "nms_keep_mask_pallas", full)

    pred = jnp.asarray(make_pred(rng))
    raw = nms_mod.batched_nms.__wrapped__

    monkeypatch.delenv("MILLIEYE_NMS_BLOCKED", raising=False)
    det_b, val_b = raw(pred, 0.3, 0.5, max_det=64, pre_top_k=128,
                       use_pallas=True)
    assert calls == {"blocked": 1, "full": 0}

    monkeypatch.setenv("MILLIEYE_NMS_BLOCKED", "0")
    det_f, val_f = raw(pred, 0.3, 0.5, max_det=64, pre_top_k=128,
                       use_pallas=True)
    assert calls == {"blocked": 1, "full": 1}

    np.testing.assert_array_equal(np.asarray(det_b), np.asarray(det_f))
    np.testing.assert_array_equal(np.asarray(val_b), np.asarray(val_f))
