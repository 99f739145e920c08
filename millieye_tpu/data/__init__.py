from millieye_tpu.data.preprocessing import (
    np_pad_to_square,
    np_resize_nearest,
    np_resize_bilinear_ac,
    horizontal_flip,
)
from millieye_tpu.data.datasets import (
    ImageListDataset,
    ExDarkDataset,
    RadarFusionDataset,
    ConcatDataset,
    COCO_NAMES,
    EXDARK_NAMES,
)
from millieye_tpu.data.loader import DataLoader, PaddedCollate
from millieye_tpu.data.device_cache import DeviceCache
from millieye_tpu.data.synthetic import SyntheticScenes
