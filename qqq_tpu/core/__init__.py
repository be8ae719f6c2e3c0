from qqq_tpu.core.quant import (
    QuantSpec,
    quantize_activations_per_token,
    find_params_weight,
    quantize_weight_int,
    fake_quantize_weight,
    int8_channel_scale,
    double_scale,
    dequantize_weight_int,
    requantize_group_weights_int8,
    s_extra_from_group_scales,
    w4a8_matmul_reference,
)
from qqq_tpu.core.packing import (
    pack_int4,
    unpack_int4,
    PACK_BLOCK,
)
