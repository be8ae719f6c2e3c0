from qqq_tpu.kernels.w4a8_gemm import (
    fuse_glu_layout,
    w4a8_gemm,
    w4a8_gemm_fused,
    w4a8_glu_gemm,
    w4a8_glu_linear,
    w4a8_linear,
)
