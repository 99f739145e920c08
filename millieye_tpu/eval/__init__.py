from millieye_tpu.eval.metrics import (
    compute_ap,
    ap_per_class,
    get_batch_statistics,
    iou_np,
)
