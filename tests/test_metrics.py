"""mAP engine golden tests on hand-computed cases."""
import numpy as np
import pytest

from millieye_tpu.eval.metrics import (
    compute_ap, ap_per_class, get_batch_statistics, iou_np,
)


def test_iou_np_plus_one():
    a = np.array([0.0, 0.0, 9.0, 9.0])     # 10x10 with +1
    b = np.array([[5.0, 0.0, 14.0, 9.0]])  # shifted 5 right
    # inter = 5x10 = 50, union = 100+100-50
    assert iou_np(a, b)[0] == pytest.approx(50 / 150)


def test_compute_ap_perfect():
    # all predictions correct: precision 1 at every recall step
    assert compute_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == pytest.approx(1.0)


def test_compute_ap_hand_case():
    # 3 preds sorted by conf: TP, FP, TP over 2 GT
    recall = np.array([0.5, 0.5, 1.0])
    precision = np.array([1.0, 0.5, 2 / 3])
    # envelope: [1, 2/3, 2/3]; steps at recall 0->0.5 (p=1), 0.5->1 (p=2/3)
    assert compute_ap(recall, precision) == pytest.approx(0.5 * 1 + 0.5 * 2 / 3)


def test_get_batch_statistics_greedy_single_claim():
    # two predictions on the same GT: only the first is a TP
    out = np.array([
        [0, 0, 10, 10, 0.9, 0.9, 1],
        [0.5, 0.5, 10, 10, 0.8, 0.8, 1],
    ])
    targets = np.array([[0, 1, 0, 0, 10, 10]])
    stats = get_batch_statistics([out], targets, iou_threshold=0.5)
    np.testing.assert_array_equal(stats[0][0], [1, 0])


def test_get_batch_statistics_label_gate():
    # predicted label absent from the image's targets -> skipped entirely
    out = np.array([[0, 0, 10, 10, 0.9, 0.9, 3]])
    targets = np.array([[0, 1, 0, 0, 10, 10]])
    stats = get_batch_statistics([out], targets, 0.5)
    np.testing.assert_array_equal(stats[0][0], [0])


def test_ap_per_class_hand_case():
    # class 0: preds [TP(conf .9), FP(.7)], 1 GT -> AP = 1.0
    # class 1: preds [FP(.8), TP(.6)], 1 GT  -> PR: (0, .5) then (.5, 1.0)
    tp = np.array([1, 0, 0, 1])
    conf = np.array([0.9, 0.7, 0.8, 0.6])
    pred_cls = np.array([0, 0, 1, 1])
    target_cls = np.array([0, 1])
    p, r, ap, f1, classes, curve = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_array_equal(classes, [0, 1])
    assert ap[0] == pytest.approx(1.0)
    assert ap[1] == pytest.approx(0.5)   # envelope: recall 0->1 at p=0.5
    assert r[0] == pytest.approx(1.0) and r[1] == pytest.approx(1.0)
    assert p[0] == pytest.approx(0.5) and p[1] == pytest.approx(0.5)


def test_ap_per_class_missing_predictions():
    # a GT class with zero predictions contributes AP=0
    tp = np.array([1.0])
    conf = np.array([0.9])
    pred_cls = np.array([0])
    target_cls = np.array([0, 5])
    _, _, ap, _, classes, _ = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap[list(classes).index(5)] == 0.0
