from millieye_tpu.collection.sync import load_timestamps, load_pointcloud, match_frames
from millieye_tpu.collection.uart import RadarReader, parse_radar_cfg
from millieye_tpu.collection.prepare import prepare_dataset
