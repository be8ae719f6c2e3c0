from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models.llama import (
    forward,
    decode_step,
    init_params,
    linear_apply,
)
from qqq_tpu.models.loader import load_hf_model, save_quantized, load_quantized
