"""Native C++ kernel tests (skipped when no compiler/lib available)."""
import struct

import numpy as np
import pytest

native = pytest.importorskip("millieye_tpu.native")

try:
    native._load()
except Exception:  # pragma: no cover - no toolchain
    pytest.skip("native library unavailable", allow_module_level=True)


def relabel(labels):
    out = np.full_like(labels, -1)
    seen = {}
    for i, l in enumerate(labels):
        if l < 0:
            continue
        out[i] = seen.setdefault(l, len(seen))
    return out


def test_dbscan_native_vs_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.cluster")
    for _ in range(5):
        pts = rng.normal(size=(45, 4)) * 3
        got = native.dbscan_native(pts, 1.5, 2)
        want = sklearn.DBSCAN(eps=1.5, min_samples=2).fit_predict(pts)
        np.testing.assert_array_equal(relabel(got), relabel(want))


def test_hungarian_native_vs_scipy(rng):
    from scipy.optimize import linear_sum_assignment
    for shape in ((1, 1), (4, 4), (3, 8), (8, 3)):
        cost = rng.uniform(0, 10, size=shape)
        r, c = native.hungarian_native(cost)
        r2, c2 = linear_sum_assignment(cost)
        assert cost[r, c].sum() == pytest.approx(cost[r2, c2].sum())


def make_packet(points, frame_no=7, garbage=b""):
    tlv = struct.pack("<II", 1, len(points) * 16) + points.tobytes()
    total = 40 + len(tlv)
    hdr = (bytes([2, 1, 4, 3, 6, 5, 8, 7])
           + struct.pack("<IIIIIII", 0x3040004, total, 0xA6843, frame_no,
                         123, len(points), 1)
           + struct.pack("<I", 0))
    return garbage + hdr + tlv


def test_parse_mmwave_frame(rng):
    pts = rng.normal(size=(6, 4)).astype(np.float32)
    pkt = make_packet(pts, frame_no=42, garbage=b"\x00\x02\x01")
    ok, xyzv, fno, consumed = native.parse_mmwave_frame(pkt)
    assert ok and fno == 42
    assert consumed == len(pkt)
    np.testing.assert_array_equal(xyzv, pts)


def test_parse_mmwave_incomplete(rng):
    pts = rng.normal(size=(6, 4)).astype(np.float32)
    pkt = make_packet(pts)
    ok, _, _, consumed = native.parse_mmwave_frame(pkt[:25])
    assert not ok and consumed == 0
    # streaming: two frames back to back
    double = make_packet(pts, 1) + make_packet(pts * 2, 2)
    ok1, p1, f1, c1 = native.parse_mmwave_frame(double)
    ok2, p2, f2, c2 = native.parse_mmwave_frame(double[c1:])
    assert ok1 and ok2 and (f1, f2) == (1, 2)
    np.testing.assert_array_equal(p2, pts * 2)
