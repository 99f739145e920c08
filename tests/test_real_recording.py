"""Integration against the reference's real recorded session (400 frames
of actual TI IWR6843 point clouds + camera timestamps + ROS calibration).

These tests validate the framework's format assumptions against
real-world artifacts, not synthesized ones: pointcloud.pkl schema, ROS
camera_info YAML, wall-clock sync, and the full radar pipeline (project ->
filter -> DBSCAN -> track -> propose) on genuine point clouds. Skipped
when the reference checkout isn't present.
"""
import os

import numpy as np
import pytest

REC = "/root/reference/module3_our_dataset/data_collection/data/20200729-213410"
CALIB = "/root/reference/module3_our_dataset/data_collection/yaml/calib_FOV90.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REC, "pointcloud.pkl")),
    reason="reference sample recording not available")


@pytest.fixture(scope="module")
def recording():
    from millieye_tpu.collection.sync import (load_timestamps,
                                              load_pointcloud)
    vt = load_timestamps(os.path.join(REC, "timestamps.txt"))
    rt, frames = load_pointcloud(os.path.join(REC, "pointcloud.pkl"))
    return vt, rt, frames


def test_real_pointcloud_schema(recording):
    vt, rt, frames = recording
    assert len(rt) == len(frames) > 100
    assert len(vt) > 100
    # radar frames are [4, n] (x, y, z, velocity); y is forward depth > 0
    non_empty = [f for f in frames if f.shape[1] > 0]
    assert non_empty, "recording has no points at all"
    f = non_empty[0]
    assert f.shape[0] == 4
    assert np.isfinite(f).all()
    # wall-clock times are sane and increasing
    assert np.all(np.diff(rt) >= 0)
    assert abs(rt[0] - vt[0]) < 60.0


def test_real_calibration_loads():
    from millieye_tpu.radar.projection import load_calib
    calib = load_calib(CALIB)
    assert calib.shape == (12,)
    fx, cx, fy, cy = calib[:4]
    assert 100 < fx < 2000 and 100 < fy < 2000
    assert 100 < cx < 1000 and 50 < cy < 800


def test_real_time_sync(recording):
    from millieye_tpu.collection.sync import match_frames
    vt, rt, _ = recording
    matches = match_frames(vt, rt, num_nearest=3)
    assert len(matches) == len(vt)
    picked = [i for m in matches for i in m]
    # each radar frame consumed at most once
    assert len(picked) == len(set(picked))
    # matched pairs are actually close in time (radar runs ~20 fps)
    for v_i in range(0, len(vt), 50):
        for r_i in matches[v_i]:
            assert abs(rt[r_i] - vt[v_i]) < 1.0


def test_real_radar_pipeline_end_to_end(recording):
    from millieye_tpu.collection.sync import match_frames
    from millieye_tpu.radar.pipeline import RadarPipeline, RadarParams
    from millieye_tpu.radar.projection import load_calib

    vt, rt, frames = recording
    matches = match_frames(vt, rt, num_nearest=3)
    calib = load_calib(CALIB)
    pipeline = RadarPipeline(calib, RadarParams())

    overlay = []
    n_props = 0
    n_pts = 0
    for idx in range(min(len(vt), 200)):
        for ri in matches[idx]:
            overlay.append(frames[ri])
        overlay = overlay[-2:]
        pts = (np.concatenate(overlay, axis=1) if overlay
               else np.zeros((4, 0)))
        out = pipeline.process(pts)
        assert np.isfinite(out["points_uvzv"]).all()
        p = out["proposals"]
        assert p.ndim == 2 and p.shape[1] == 4
        n_props += len(p)
        n_pts += len(out["points_uvzv"])
        if len(p):
            # proposals are plausibly inside/near the 640x480 frame
            assert (p[:, 2] > p[:, 0]).all() and (p[:, 3] > p[:, 1]).all()
    # real moving-person recording: the pipeline must actually fire
    assert n_pts > 50
    assert n_props > 0


def test_real_heatmap_rasterizes(recording):
    import jax.numpy as jnp
    from millieye_tpu.collection.sync import match_frames
    from millieye_tpu.radar.pipeline import RadarPipeline, RadarParams
    from millieye_tpu.radar.projection import load_calib
    from millieye_tpu.ops.rasterize import radar_heatmap

    vt, rt, frames = recording
    matches = match_frames(vt, rt, num_nearest=3)
    calib = load_calib(CALIB)
    pipeline = RadarPipeline(calib, RadarParams())
    # find a frame with points
    for idx in range(len(vt)):
        pts = (np.concatenate([frames[i] for i in matches[idx]], axis=1)
               if matches[idx] else np.zeros((4, 0)))
        out = pipeline.process(pts)
        if len(out["points_uvzv"]) >= 3:
            break
    pu = np.zeros((64, 4), np.float32)
    m = np.zeros(64, bool)
    k = min(64, len(out["points_uvzv"]))
    pu[:k] = out["points_uvzv"][:k]
    m[:k] = True
    heat = radar_heatmap(jnp.asarray(pu), jnp.asarray(m), (640, 480))
    h = np.asarray(heat)
    assert h.shape == (24, 32, 3)
    assert 0 <= h.min() and h.max() <= 1
    assert h[..., 0].sum() > 0          # some occupancy registered
