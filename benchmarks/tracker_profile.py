"""Host radar-tracker profile on the REAL recording (no chip needed).

The streaming capacity measurement (stream_bench.py) caps at ~204
track-fps while the device step sustains ~660 fps — the host producer is
the deployment bottleneck (VERDICT r3 #10). This decomposes one
``RadarPipeline.process`` call per recorded frame into its stages
(projection / dbscan / tracker / proposals), reports fps per stage, and
prints the cProfile top-20 so the next optimization targets facts.

    python benchmarks/tracker_profile.py [--profile]

Appends tracker_profile_* rows to BENCH_DETAILS.json.

Reference role: the producer process feeding the GPU consumer,
``module3_our_dataset/run_mp.py:42-160``.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REC = "/root/reference/module3_our_dataset/data_collection/data/20200729-213410"
CALIB = "/root/reference/module3_our_dataset/data_collection/yaml/calib_FOV90.yaml"


def load_frames():
    # {"Data": {numObj, x, y, z, velocity}, "Time", "Frame_ID"} records
    # (collection/sync.py); stacked to [4, n] like the stream producer
    from millieye_tpu.collection.sync import load_pointcloud
    _, frames = load_pointcloud(os.path.join(REC, "pointcloud.pkl"))
    return [np.asarray(f, np.float64) for f in frames]


def main():
    from millieye_tpu.radar.pipeline import RadarParams, RadarPipeline
    from millieye_tpu.radar.projection import (load_calib,
                                               radar_points_to_image)
    from millieye_tpu.radar.dbscan import cluster_points, filter_clusters
    from millieye_tpu.radar.pipeline import clusters_to_proposals

    calib = load_calib(CALIB)
    frames = load_frames()
    print(f"{len(frames)} recorded frames", flush=True)
    p = RadarParams()
    pipe = RadarPipeline(calib, p)

    # stage timers (separate pass per stage so each is a tight loop)
    t0 = time.perf_counter()
    projected = [radar_points_to_image(f, calib) for f in frames]
    t_proj = time.perf_counter() - t0

    filt = []
    w, h = p.frame_size
    t0 = time.perf_counter()
    for uv, xyzv in projected:
        keep = ((uv[:, 0] >= 0) & (uv[:, 0] < w)
                & (uv[:, 1] >= 0) & (uv[:, 1] < h)
                & (xyzv[:, 2] < p.max_depth)
                & (np.abs(xyzv[:, 3]) >= p.min_velocity))
        filt.append(xyzv[keep])
    t_filter = time.perf_counter() - t0

    t0 = time.perf_counter()
    clustered = [filter_clusters(
        cluster_points(x, p.dbscan_weights, p.dbscan_eps)[0],
        p.num_pts_filter) for x in filt]
    t_dbscan = time.perf_counter() - t0

    t0 = time.perf_counter()
    tracked = [pipe.tracker.update(c) for c in clustered]
    t_track = time.perf_counter() - t0

    t0 = time.perf_counter()
    for tr in tracked:
        clusters_to_proposals(tr, calib, p.max_size)
    t_prop = time.perf_counter() - t0

    # end-to-end process() (fresh tracker)
    pipe2 = RadarPipeline(calib, p)
    t0 = time.perf_counter()
    for f in frames:
        pipe2.process(f)
    t_e2e = time.perf_counter() - t0

    n = len(frames)
    rows = {
        "tracker_profile_frames": n,
        "tracker_profile_proj_us": round(1e6 * t_proj / n, 1),
        "tracker_profile_filter_us": round(1e6 * t_filter / n, 1),
        "tracker_profile_dbscan_us": round(1e6 * t_dbscan / n, 1),
        "tracker_profile_track_us": round(1e6 * t_track / n, 1),
        "tracker_profile_proposals_us": round(1e6 * t_prop / n, 1),
        "tracker_profile_e2e_us": round(1e6 * t_e2e / n, 1),
        "tracker_profile_e2e_fps": round(n / t_e2e, 1),
    }
    for k, v in rows.items():
        print(f"{k}: {v}", flush=True)

    if "--profile" in sys.argv:
        import cProfile
        import pstats
        pipe3 = RadarPipeline(calib, p)
        pr = cProfile.Profile()
        pr.enable()
        for f in frames:
            pipe3.process(f)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(20)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(rows)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
