"""millieye_tpu: TPU-native mmWave-radar + camera fusion object detection.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
sxontheway/milliEye (IoTDI'21): a two-stage detector where a frozen
tiny-YOLOv3 proposes boxes, an R-CNN-style refinement head re-scores and
regresses them from RoI-cropped image features, and a radar branch
contributes extra proposals (clustered + tracked point clouds) and an
attention heatmap fused into the confidence score.

Subpackages
-----------
ops       box math, fixed-shape NMS, RoIAlign/PSRoIAlign, heatmap rasterizer,
          YOLO target builder, on-device letterbox preprocessing
models    cfg-driven Darknet, YOLO decode/loss, fusion heads and networks
io        legacy weight loaders (.weights/.pt/.pth), orbax checkpoints, cfg parsers
data      dataset readers with padded fixed-shape collate
radar     projection, clustering, tracking, proposal generation (host-side)
eval      mAP engine and evaluation harnesses
train     three-stage training recipes with frozen-subtree optimization
parallel  device-mesh sharding for data-parallel training
runtime   streaming demo pipeline (host producers + double-buffered device feed)
collection  sensor I/O toolkit (UART radar parser, camera recorder, dataset prep)
"""

__version__ = "0.1.0"
