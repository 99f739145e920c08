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
from millieye_tpu.ops.nms import (
    batched_nms,
    nms_xyxy,
    nms_keep_mask,
    nms_keep_mask_ref,
)
from millieye_tpu.ops.roi_align import roi_align, ps_roi_align
from millieye_tpu.ops.rasterize import radar_heatmap, heatmap_bins
from millieye_tpu.ops.letterbox import (
    letterbox_image,
    pad_to_square,
    resize_nearest,
    resize_bilinear_align_corners,
)
from millieye_tpu.ops.targets import build_targets
from millieye_tpu.ops.quantize import (
    quantize_int8,
    quantize_int8_stochastic,
    dequantize,
    quantize_darknet,
    dequantize_darknet,
    calibrate_act_scales,
)
