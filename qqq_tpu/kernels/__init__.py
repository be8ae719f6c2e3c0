from qqq_tpu.kernels.w4a8_gemm import w4a8_gemm, w4a8_gemm_fused, w4a8_linear
