"""qqq-tpu: a TPU-native W4A8 quantized-inference framework.

Re-implements the full capability surface of HandH1998/QQQ (QuaRot-style
Hadamard rotation, OS+/AWQ/SQ adaptive smoothing, Hessian-based GPTQ, and
per-channel / per-group W4A8 GEMM) as an idiomatic JAX/XLA/Pallas stack:

- ``qqq_tpu.core``     quantization numerics in pure jnp (the test oracle)
- ``qqq_tpu.kernels``  Pallas TPU kernels (W4A8 GEMM, activation quant)
- ``qqq_tpu.models``   functional Llama-1/2/3 & Qwen2 (pytree params)
- ``qqq_tpu.calib``    calibration pipeline: rotation, smoothing, GPTQ
- ``qqq_tpu.parallel`` GSPMD mesh / sharding layout for packed weights
- ``qqq_tpu.serve``    inference engine: KV cache, continuous batching
- ``qqq_tpu.utils``    data loaders, HF checkpoint interop
- ``qqq_tpu.cli``      quantize / eval / generate / bench drivers
"""

__version__ = "0.1.0"
