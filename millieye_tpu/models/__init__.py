from millieye_tpu.models.darknet import Darknet, decode_yolo
from millieye_tpu.models.zoo import (tiny_yolov3_defs, yolov3_defs,
                                     TINY_ANCHORS, YOLOV3_ANCHORS)
from millieye_tpu.models.fusion import (FusionConfig, FusionNetwork,
                                        RefineNetwork)
from millieye_tpu.models.yolo_head import yolo_loss, yolo_scale_loss
