"""Host serial range coder: C++ <-> Python bitstream identity and
round-trips (ops/host_rans.py twin of native/rangecoder.cpp)."""

import numpy as np
import pytest

from fastqueeze_tpu.io import native
from fastqueeze_tpu.ops import host_rans as hr

PARAMS = (1, 16, 8192)   # init, inc, cap


def test_python_roundtrip_ctx():
    rng = np.random.default_rng(0)
    for n, A, nctx in ((1, 2, 1), (257, 4, 4), (999, 250, 16)):
        syms = rng.integers(0, A, n).astype(np.uint8)
        ctx = rng.integers(0, nctx, n).astype(np.uint32)
        blob = hr._py_encode_ctx(syms, ctx, nctx, A, *PARAMS)
        back = hr._py_decode_ctx(blob, n, ctx, nctx, A, *PARAMS)
        assert np.array_equal(back, syms)


def test_python_roundtrip_o1():
    rng = np.random.default_rng(1)
    syms = rng.integers(0, 7, 1500).astype(np.uint8)
    blob = hr._py_encode_o1(syms, 7, *PARAMS)
    assert np.array_equal(hr._py_decode_o1(blob, len(syms), 7, *PARAMS),
                          syms)


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_native_bitstream_identical_to_python():
    rng = np.random.default_rng(2)
    for trial in range(5):
        n = int(rng.integers(1, 2500))
        A = int(rng.choice([2, 4, 41, 256]))
        nctx = int(rng.choice([1, 4, 16]))
        syms = rng.integers(0, A, n).astype(np.uint8)
        ctx = rng.integers(0, nctx, n).astype(np.uint32)
        assert (hr.encode_ctx(syms, ctx, nctx, A, *PARAMS)
                == hr._py_encode_ctx(syms, ctx, nctx, A, *PARAMS))
        o1 = hr.encode_o1(syms, A, *PARAMS)
        assert o1 == hr._py_encode_o1(syms, A, *PARAMS)
        assert np.array_equal(hr.decode_o1(o1, n, A, *PARAMS), syms)


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_cross_decode():
    """Archives written with the native coder decode with the Python
    mirror and vice versa (portability guarantee for marker 0x02)."""
    rng = np.random.default_rng(3)
    syms = rng.integers(0, 30, 800).astype(np.uint8)
    c_blob = hr.encode_o1(syms, 30, *PARAMS)
    assert np.array_equal(hr._py_decode_o1(c_blob, len(syms), 30, *PARAMS),
                          syms)
    py_blob = hr._py_encode_o1(syms, 30, *PARAMS)
    out = native.rc_decode_o1(py_blob, len(syms), 30, *PARAMS)
    assert np.array_equal(out, syms)


def test_skewed_compresses():
    syms = np.zeros(4000, np.uint8)
    syms[::97] = 1
    blob = hr.encode_o1(syms, 2, *PARAMS)
    assert len(blob) < 400
