from qqq_tpu.calib.gptq import (
    hessian_init,
    hessian_update,
    gptq_quantize_matrix,
    GPTQResult,
)
