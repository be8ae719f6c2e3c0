from qqq_tpu.utils.benchmark import measure_op
