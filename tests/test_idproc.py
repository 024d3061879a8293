import numpy as np
import pytest

from fastqueeze_tpu.pipeline.idproc import analyze_ids, reconstruct_ids


def _rt(ids):
    schema, var = analyze_ids(ids)
    assert schema is not None
    back = reconstruct_ids(schema, len(ids), var)
    assert back == ids
    return schema, var


def test_sequential_ids_collapse():
    ids = [f"ERR2755197.{i} {i} length=100".encode() for i in range(1, 1001)]
    schema, var = _rt(ids)
    assert var == b""  # fully binned, no variable payload
    assert len(schema.to_json()) < 300


def test_pe_interleaved_ids():
    ids = []
    for i in range(1, 101):
        ids.append(f"SRR1.{i}/1".encode())
        ids.append(f"SRR1.{i}/1".encode())
    schema, var = _rt(ids)
    assert var == b""


def test_stride2_delta():
    ids = []
    for i in range(1, 101):
        ids.append(f"X.{i}.a".encode())
        ids.append(f"X.{i}.a".encode())
    schema, var = _rt(ids)
    assert var == b""


def test_variable_text_field():
    ids = [f"run{i} tile{i * i}".encode() for i in range(50)]
    _rt(ids)


def test_leading_zeros_fall_back_to_text():
    ids = [f"ID{i:05d}".encode() for i in range(100)]
    schema, var = _rt(ids)  # must re-render exactly (leading zeros!)


def test_structure_mismatch_returns_none():
    ids = [b"abc.1", b"abc.2", b"zzz"]
    schema, var = analyze_ids(ids)
    assert schema is None


def test_empty():
    schema, var = analyze_ids([])
    assert schema is not None
    assert reconstruct_ids(schema, 0, b"") == []


def test_vectorized_analyzer_matches_python():
    """_analyze_ids_vec (native tokenizer + numpy column tests) must return
    the identical schema and var payload as the Python reference path."""
    from fastqueeze_tpu.io import native
    from fastqueeze_tpu.pipeline.idproc import (
        _analyze_ids_full, _analyze_ids_vec)
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    n = 3000
    grammars = [
        [b"@SRR123.%d 1 length=100" % (i + 1) for i in range(n)],
        [b"@SRR123.%d %d length=%d" % (i + 1, rng.integers(1, 9), 100 + i % 3)
         for i in range(n)],
        [b"@inst:%d:%d:end" % (i // 2 + 7, 5 + 3 * (i // 2))
         for i in range(n)],                                  # stride-2 ids
        [b"@x%dy" % rng.integers(0, 10**9) for i in range(n)],  # random num
        [bytes(rng.integers(33, 120, 12).astype(np.uint8)) for _ in range(n)],
        [b"@const.line"] * n,
        [b"@z01%d" % i for i in range(n)],       # leading zero -> text var
        [b"@a %d" % (10**i) for i in range(1, 25)] * (n // 24),  # widths vary
    ]
    for ids in grammars:
        vec = _analyze_ids_vec(ids)
        ref = _analyze_ids_full(ids)
        if vec is NotImplemented:      # >18-digit tokens defer to Python
            assert max(len(s) for s in ids) > 18
            continue
        if ref[0] is None:
            assert vec[0] is None
            continue
        assert vec[0] is not None and vec[0].fields == ref[0].fields
        assert vec[1] == ref[1]


def test_vectorized_reconstruct_matches_python():
    from fastqueeze_tpu.io import native
    from fastqueeze_tpu.pipeline.idproc import (
        _analyze_ids_full, _reconstruct_ids_vec)
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    n = 3000
    grammars = [
        [b"@SRR123.%d 1 length=100" % (i + 1) for i in range(n)],
        [b"@inst:%d:%d:end" % (i // 2 + 7, 5 + 3 * (i // 2))
         for i in range(n)],
        [b"@x%dy" % rng.integers(0, 10**9) for i in range(n)],  # num var
        [b"@r%d %s" % (i, bytes(rng.integers(65, 90, rng.integers(1, 9))
                                .astype(np.uint8))) for i in range(n)],
        [b"@const"] * n,
        [b"@%d" % (10 ** 17 + i) for i in range(n)],   # 18-digit numbers
    ]
    for ids in grammars:
        schema, var = _analyze_ids_full(ids)
        assert schema is not None
        vec = _reconstruct_ids_vec(schema, n, var)
        assert vec is not NotImplemented
        assert vec == ids
