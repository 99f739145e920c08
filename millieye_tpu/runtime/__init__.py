from millieye_tpu.runtime.profiler import StageTimer, trace_annotation
from millieye_tpu.runtime.engine import FusionEngine
from millieye_tpu.runtime.stream import StreamingPipeline, FrameSource
