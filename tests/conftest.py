"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpret mode on CPU (the "fake backend" of the test
pyramid, SURVEY.md §4); sharding tests use the 8 virtual devices.  Set
``QQQ_TPU_TEST_PLATFORM=tpu`` to run the suite on real TPU hardware instead.
"""

import os

if os.environ.get("QQQ_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the ambient TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("QQQ_TPU_TEST_PLATFORM", "cpu") == "cpu":
    # the axon client wrapper overrides JAX_PLATFORMS at import time; only a
    # post-import config update reliably pins the test suite to CPU
    jax.config.update("jax_platforms", "cpu")

# CPU matmuls default to bf16-fastmath (oneDNN); parity tests need true fp32
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compilation cache for the suite: jax 0.9.0 segfaults in the
# on-disk cache's (de)serialization of one specific executable — the paged
# donated-scatter decode program test_paged_engine compiles ~170 tests in —
# on BOTH the write path (put_executable_and_time / zstandard) and, once an
# entry exists, the read path (get_executable_and_time).  Reproduced 4/4
# full-suite runs, never when the file runs alone with a cold cache.  The
# in-memory jit cache is unaffected.
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
