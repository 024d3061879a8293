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


def _names_fixture(kind, n=400):
    import random
    rng = random.Random(7)
    if kind == "hash":
        return [bytes("".join(rng.choice("0123456789abcdef")
                              for _ in range(16)), "ascii")
                for _ in range(n)]
    if kind == "sra":
        return [(f"SRR2755197.{i} "
                 + "".join(rng.choice("0123456789abcdef") for _ in range(12))
                 + " length=100").encode() for i in range(n)]
    if kind == "edges":
        return [b"", b"x", b"007", b"0", b"9" * 26, b"a" * 300, b":" * 50,
                b""]
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["hash", "sra", "edges"])
def test_name_coder_roundtrip_and_twins(kind):
    """Fallback name coder (reference encode_name parity): native and
    Python twins produce identical bitstreams and both round-trip."""
    names = _names_fixture(kind)
    cat = np.frombuffer(b"".join(names), np.uint8)
    lens = np.array([len(x) for x in names], np.int32)
    blob = hr.encode_names(cat, lens, *PARAMS)
    py_blob = hr._py_encode_names(cat, lens, *PARAMS)
    assert blob == py_blob
    c1, l1 = hr.decode_names(blob, len(names), len(cat), *PARAMS)
    assert bytes(c1) == bytes(cat) and np.array_equal(l1, lens)
    c2, l2 = hr._py_decode_names(blob, len(names), len(cat), *PARAMS)
    assert bytes(c2) == bytes(cat) and np.array_equal(np.asarray(l2), lens)


def test_name_coder_beats_order1_on_structured_ids():
    """Unstructured-but-redundant IDs (SRA style: constant prefix, counter,
    random hash, constant suffix) must code materially below the generic
    order-1 byte path — the reason the tokenized fallback exists."""
    names = _names_fixture("sra", n=2000)
    cat = np.frombuffer(b"".join(names), np.uint8)
    lens = np.array([len(x) for x in names], np.int32)
    blob = hr.encode_names(cat, lens, *PARAMS)
    raw = b"\n".join(names) + b"\n"
    o1 = hr.encode_o1(np.frombuffer(raw, np.uint8), 256, *PARAMS)
    assert len(blob) < 0.75 * len(o1), (len(blob), len(o1))


def test_name_coder_corrupt_stream_rejected():
    names = _names_fixture("sra", n=50)
    cat = np.frombuffer(b"".join(names), np.uint8)
    lens = np.array([len(x) for x in names], np.int32)
    blob = bytearray(hr.encode_names(cat, lens, *PARAMS))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        hr.decode_names(bytes(blob), len(names), len(cat), *PARAMS)
