"""Native packing library vs the jnp layout definition (core/packing.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qqq_tpu.core.packing import pack_int4, unpack_int4
from qqq_tpu.native import load_native, pack_int4_host, unpack_int4_host
from qqq_tpu.native.build import _pack_int4_numpy, _unpack_int4_numpy


@pytest.fixture(scope="module")
def q(rng=None):
    r = np.random.default_rng(0)
    return r.integers(-8, 8, size=(512, 384)).astype(np.int8)


def test_numpy_twin_matches_jnp(q):
    np.testing.assert_array_equal(
        _pack_int4_numpy(q), np.asarray(pack_int4(jnp.asarray(q)))
    )
    packed = _pack_int4_numpy(q)
    np.testing.assert_array_equal(
        _unpack_int4_numpy(packed), np.asarray(unpack_int4(jnp.asarray(packed)))
    )


def test_host_roundtrip(q):
    packed = pack_int4_host(q)
    np.testing.assert_array_equal(
        packed, np.asarray(pack_int4(jnp.asarray(q)))
    )
    np.testing.assert_array_equal(unpack_int4_host(packed), q)


def test_native_library_builds(q):
    lib = load_native()
    if lib is None:
        pytest.skip("no C toolchain in this environment")
    # force the native path (bypassing any fallback) and compare
    import ctypes

    K, N = q.shape
    out = np.empty((K // 8, N), np.int32)
    lib.pack_int4(
        np.ascontiguousarray(q).ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), K, N,
    )
    np.testing.assert_array_equal(out, _pack_int4_numpy(q))
    back = np.empty((K, N), np.int8)
    lib.unpack_int4(
        out.ctypes.data_as(ctypes.c_void_p),
        back.ctypes.data_as(ctypes.c_void_p), K, N,
    )
    np.testing.assert_array_equal(back, q)
