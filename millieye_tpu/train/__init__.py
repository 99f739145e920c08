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
from millieye_tpu.train.recipes import (
    Trainer,
    yolo_trainer,
    refine_trainer,
    fusion_trainer,
    fusion_device_batch,
)
from millieye_tpu.train.logging import MetricsLogger
