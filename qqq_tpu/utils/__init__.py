from qqq_tpu.utils.benchmark import measure_op
from qqq_tpu.utils.profiling import StageTimer, device_trace
