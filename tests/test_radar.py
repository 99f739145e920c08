"""Radar pipeline tests: DBSCAN vs sklearn, Hungarian vs scipy (when the
native backend is built), Kalman/tracker behavior, projection math."""
import numpy as np
import pytest

from millieye_tpu.radar.dbscan import dbscan, cluster_points, filter_clusters
from millieye_tpu.radar.hungarian import assign
from millieye_tpu.radar.kalman import ClusterKalman
from millieye_tpu.radar.tracker import ClusterTracker
from millieye_tpu.radar.projection import project_camera_xyz_to_uv
from millieye_tpu.radar.pipeline import (
    RadarPipeline, RadarParams, normalize_boxes_to_padded, pad_rows,
)


def relabel(labels):
    """Canonical cluster numbering for comparison."""
    out = np.full_like(labels, -1)
    next_id = 0
    seen = {}
    for i, l in enumerate(labels):
        if l < 0:
            continue
        if l not in seen:
            seen[l] = next_id
            next_id += 1
        out[i] = seen[l]
    return out


def test_dbscan_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.cluster")
    for trial in range(5):
        pts = rng.normal(size=(40, 4)) * 3
        got = dbscan(pts, eps=1.5, min_samples=2)
        want = sklearn.DBSCAN(eps=1.5, min_samples=2).fit_predict(pts)
        np.testing.assert_array_equal(relabel(got), relabel(want))


def test_dbscan_empty_and_noise():
    assert dbscan(np.zeros((0, 4)), 1.5, 2).size == 0
    # isolated points are all noise
    pts = np.arange(5)[:, None] * np.array([[100.0, 0, 0, 0]])
    assert (dbscan(pts, 1.5, 2) == -1).all()


def test_cluster_points_summary(rng):
    a = rng.normal(size=(6, 4)) * 0.1 + np.array([0, 0, 0, 1.0])
    b = rng.normal(size=(5, 4)) * 0.1 + np.array([50, 50, 50, -2.0])
    pts = np.concatenate([a, b])
    clusters, labels = cluster_points(pts, weights=(1, 1, 1, 0), eps=2.0,
                                      global_avg_v=False)
    assert len(clusters["num_points"]) == 2
    assert set(clusters["num_points"].tolist()) == {5, 6}
    # per-cluster mean velocity when global_avg_v=False
    assert {round(v) for v in clusters["avg_v"]} == {1, -2}
    # reference-quirk mode: global mean everywhere
    clusters_g, _ = cluster_points(pts, weights=(1, 1, 1, 0), eps=2.0,
                                   global_avg_v=True)
    np.testing.assert_allclose(clusters_g["avg_v"],
                               np.full(2, pts[:, 3].mean()))
    filtered = filter_clusters(clusters, 6)
    assert len(filtered["num_points"]) == 1


def test_hungarian_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment
    for shape in ((3, 3), (2, 5), (6, 2)):
        cost = rng.uniform(0, 10, size=shape)
        r, c = assign(cost)
        r2, c2 = linear_sum_assignment(cost)
        assert cost[r, c].sum() == pytest.approx(cost[r2, c2].sum())


def test_kalman_constant_velocity():
    kf = ClusterKalman(center=(0, 0, 10.0), avg_v=1.0, size=(1, 1, 1), dt=0.05)
    for step in range(1, 40):
        kf.predict()
        z = 10.0 + step * 0.05 * 1.0  # depth moving at v=1
        kf.update(center=(0, 0, z), avg_v=1.0, size=(1, 1, 1))
    assert kf.center[2] == pytest.approx(10.0 + 39 * 0.05, abs=0.05)
    assert kf.x[5] == pytest.approx(1.0, abs=0.2)


def test_tracker_lifecycle():
    tr = ClusterTracker(fps=20, max_age=4, min_hits=4)

    def frame(depth):
        return {"num_points": np.array([8]),
                "center": np.array([[1.0, 2.0, depth]]),
                "size": np.array([[0.5, 1.0, 0.4]]),
                "avg_v": np.array([1.0])}

    # warm-up: reported while frame_count <= min_hits
    out = tr.update(frame(10.0))
    assert len(out) == 1
    for i in range(6):
        out = tr.update(frame(10.0 + i * 0.05))
    assert len(out) == 1  # established track
    # drop the object: survives max_age frames then dies
    empty = {"num_points": np.zeros(0, np.int64), "center": np.zeros((0, 3)),
             "size": np.zeros((0, 3)), "avg_v": np.zeros(0)}
    alive = []
    for _ in range(6):
        alive.append(len(tr.update(empty)))
    assert alive[0] == 1 and alive[-1] == 0


def test_projection_pinhole_closed_form():
    # no distortion, no translation: u = fx*x/z + cx
    calib = np.array([500.0, 320.0, 480.0, 240.0,
                      0, 0, 0, 0, 0, 0, 0, 0])
    xyz = np.array([[1.0], [0.5], [5.0]])
    u, v = project_camera_xyz_to_uv(xyz, calib)
    assert u[0] == pytest.approx(500 * 1.0 / 5.0 + 320)
    assert v[0] == pytest.approx(480 * 0.5 / 5.0 + 240)


def test_pipeline_end_to_end(rng):
    calib = np.array([500.0, 320.0, 480.0, 240.0,
                      0, 0, 0, 0, 0, -0.07, -0.05, 0])
    pipe = RadarPipeline(calib, RadarParams(num_pts_filter=3, min_hits=2))
    # a blob of moving points in front of the sensor (radar frame: y=depth)
    for step in range(6):
        n = 12
        pts = np.zeros((4, n))
        pts[0] = rng.normal(scale=0.1, size=n) + 0.2        # x
        pts[1] = rng.normal(scale=0.1, size=n) + 5.0        # y (depth)
        pts[2] = rng.normal(scale=0.1, size=n) - 0.2        # z (up)
        pts[3] = 1.0                                        # velocity
        out = pipe.process(pts)
    assert out["points_uvzv"].shape[1] == 4
    assert out["proposals"].shape[0] >= 1
    boxes, valid = normalize_boxes_to_padded(out["proposals"], (640, 480))
    assert ((boxes >= 0) & (boxes <= 1)).all()
    padded, mask = pad_rows(boxes[valid], 32, 4)
    assert padded.shape == (32, 4) and mask.sum() == valid.sum()


def test_pipeline_empty_cloud():
    calib = np.array([500.0, 320.0, 480.0, 240.0,
                      0, 0, 0, 0, 0, 0, 0, 0])
    pipe = RadarPipeline(calib)
    out = pipe.process(np.zeros((4, 0)))
    assert out["proposals"].shape == (0, 4)
    assert out["points_uvzv"].shape == (0, 4)


def test_viz_helpers(rng):
    from millieye_tpu.radar.viz import (draw_radar_points,
                                        draw_cluster_boxes,
                                        draw_detections)
    frame = np.zeros((48, 64, 3), np.uint8)
    calib = np.array([40.0, 32, 40, 24, 0, 0, 0, 0, 0, 0, 0, 0])
    pts = np.array([[10.0, 10.0, 2.0, 1.0], [50.0, 30.0, 8.0, -1.0]])
    out = draw_radar_points(frame, pts)
    assert out.shape == frame.shape and out.sum() > 0
    tracked = [{"center": (0.0, 0.0, 3.0), "size": (0.5, 0.5, 0.5)}]
    out2 = draw_cluster_boxes(out, tracked, calib)
    assert out2.sum() > out.sum()
    boxes = np.array([[5, 5, 30, 40, 0.9, 0]])
    out3 = draw_detections(out2, boxes, np.array([True]),
                           labels=["person"])
    assert out3.sum() > 0
