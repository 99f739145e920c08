from millieye_tpu.train.optim import (
    label_tree,
    frozen_adam,
    STAGE3_FROZEN,
)
from millieye_tpu.train.steps import (
    make_yolo_train_step,
    make_refine_train_step,
    make_fusion_train_step,
    TrainState,
)
