from millieye_tpu.ops.boxes import (
    xywh_to_xyxy,
    xyxy_to_xywh,
    iou_pairwise,
    iou_matrix,
    wh_iou,
    rescale_boxes,
    box_regress,
    encode_boxes,
)
from millieye_tpu.ops.nms import batched_nms, nms_keep_mask
