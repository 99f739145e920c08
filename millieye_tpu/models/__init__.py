from millieye_tpu.models.darknet import Darknet
from millieye_tpu.models.zoo import tiny_yolov3_defs
