from millieye_tpu.io.config import (
    parse_model_config,
    parse_data_config,
    load_classes,
)
from millieye_tpu.io.darknet_weights import (
    load_darknet_weights,
    save_darknet_weights,
)
