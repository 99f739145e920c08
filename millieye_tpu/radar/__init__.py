from millieye_tpu.radar.projection import (
    load_calib,
    project_camera_xyz_to_uv,
    radar_points_to_image,
)
from millieye_tpu.radar.dbscan import dbscan, cluster_points
from millieye_tpu.radar.hungarian import assign
from millieye_tpu.radar.kalman import ClusterKalman
from millieye_tpu.radar.tracker import ClusterTracker
from millieye_tpu.radar.pipeline import RadarPipeline, RadarParams
from millieye_tpu.radar.viz import (draw_radar_points, draw_cluster_boxes,
                                    draw_detections)
