"""Build + load the native packing library (ctypes, on-demand cc).

The reference ships its native code as a torch CUDAExtension (setup.py:9-35);
here the only host-side native need is checkpoint-conversion throughput, so a
single C file is compiled once into a cached .so and loaded with ctypes.
NumPy fallbacks keep every API working without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger("qqq_tpu")

_SRC = os.path.join(os.path.dirname(__file__), "packing.c")
_CACHE_DIR = os.environ.get(
    "QQQ_TPU_NATIVE_CACHE", os.path.expanduser("~/.cache/qqq_tpu_native")
)
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load packing.so; None if no toolchain."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = open(_SRC).read()
        tag = hashlib.sha256(src.encode()).hexdigest()[:16]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        so_path = os.path.join(_CACHE_DIR, f"packing_{tag}.so")
        if not os.path.exists(so_path):
            cmd = [
                os.environ.get("CC", "cc"), "-O3", "-shared", "-fPIC",
                "-fopenmp", _SRC, "-o", so_path,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            logger.info("built native packing library: %s", so_path)
        lib = ctypes.CDLL(so_path)
        for name in ("pack_int4", "unpack_int4"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ]
        _lib = lib
    except Exception as e:
        logger.info("native packing unavailable (%s); using NumPy", e)
        _lib = None
    return _lib


def _pack_int4_numpy(q: np.ndarray) -> np.ndarray:
    K, N = q.shape
    u = (q.astype(np.int32) + 8).astype(np.uint32)
    ub = u.reshape(K // 128, 2, 16, 4, N)
    byte = ub[:, 0] | (ub[:, 1] << 4)
    w32 = (
        byte[:, :, 0] | (byte[:, :, 1] << 8)
        | (byte[:, :, 2] << 16) | (byte[:, :, 3] << 24)
    )
    return w32.reshape(K // 8, N).view(np.int32)


def _unpack_int4_numpy(packed: np.ndarray) -> np.ndarray:
    K8, N = packed.shape
    K = K8 * 8
    w = packed.view(np.uint32).reshape(K // 128, 16, N)
    bytes_ = np.stack([(w >> (8 * i)) & 0xFF for i in range(4)], axis=2)
    lo = (bytes_ & 0xF).reshape(K // 128, 64, N)
    hi = (bytes_ >> 4).reshape(K // 128, 64, N)
    u = np.concatenate([lo, hi], axis=1)
    return (u.astype(np.int32) - 8).reshape(K, N).astype(np.int8)


def pack_int4_host(q: np.ndarray) -> np.ndarray:
    """(K, N) signed int4 codes → (K//8, N) int32, TPU nibble-plane layout.

    Host-side twin of core/packing.pack_int4 for checkpoint conversion;
    native when a C compiler is available, NumPy otherwise.
    """
    q = np.ascontiguousarray(q, dtype=np.int8)
    K, N = q.shape
    assert K % 128 == 0, K
    if q.size and (q.min() < -8 or q.max() > 7):
        raise ValueError(
            "int4 codes out of range [-8, 7] — packed words would wrap"
        )
    lib = load_native()
    if lib is None:
        return _pack_int4_numpy(q)
    out = np.empty((K // 8, N), np.int32)
    lib.pack_int4(
        q.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p),
        K, N,
    )
    return out


def unpack_int4_host(packed: np.ndarray) -> np.ndarray:
    packed = np.ascontiguousarray(packed, dtype=np.int32)
    K8, N = packed.shape
    lib = load_native()
    if lib is None:
        return _unpack_int4_numpy(packed)
    out = np.empty((K8 * 8, N), np.int8)
    lib.unpack_int4(
        packed.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), K8 * 8, N,
    )
    return out
