"""Native C++ scanner vs numpy fallback equivalence (io/native.py)."""

import numpy as np
import pytest

from fastqueeze_tpu.io import native
from fastqueeze_tpu.io.fastq import (
    _record_boundary, assemble_block, parse_block)


@pytest.fixture(scope="module")
def lib():
    lb = native.get_lib()
    if lb is None:
        pytest.skip("native library unavailable")
    return lb


def test_record_boundary(lib):
    data = b"@a\nACGT\n+\nIIII\n@b\nAC\n+\nII\n@c\nA"
    nb = native.record_boundary(data)
    assert nb == len(b"@a\nACGT\n+\nIIII\n@b\nAC\n+\nII\n")  # 2 whole records
    assert native.record_boundary(b"@a\nAC\n+\n") == 0


def test_parse_matches_numpy(lib, monkeypatch):
    raw = (b"@r1 c1\nACGTN\n+\nIIIII\n"
           b"@r2\nGG\n+x\nII\n"
           b"@r3\nTTTT\n+\nJJJJ\n")
    b_native = parse_block(raw, True)
    monkeypatch.setenv("FASTQUEEZE_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    b_np = parse_block(raw, True)
    assert b_native.ids == b_np.ids
    assert b_native.plus == b_np.plus
    assert np.array_equal(b_native.seq_flat, b_np.seq_flat)
    assert np.array_equal(b_native.qual_flat, b_np.qual_flat)
    assert np.array_equal(b_native.lengths, b_np.lengths)
    assert assemble_block(b_native) == raw


def test_parse_errors(lib):
    with pytest.raises(ValueError):
        parse_block(b"xr1\nAC\n+\nII\n", True)   # bad '@'
    with pytest.raises(ValueError):
        parse_block(b"@r1\nAC\nx\nII\n", True)   # bad '+'
    with pytest.raises(ValueError):
        parse_block(b"@r1\nAC\n+\nIII\n", True)  # len mismatch
    with pytest.raises(ValueError):
        parse_block(b"@r1\nAC\n+\n", True)       # 3 lines


def test_no_final_newline(lib):
    raw = b"@r1\nACG\n+\nIII"
    b = parse_block(raw, False)
    assert b.n_reads == 1
    assert assemble_block(b) == raw


def test_csr_build_native_matches_numpy():
    """Native CSR k-mer builders (narrow u32 radix + wide u64 radix) must
    be bit-identical to the numpy stable-argsort path — the index arrays
    feed decision-bearing alignment, so this is a correctness contract,
    not a perf detail."""
    import numpy as np

    from fastqueeze_tpu.align.index import _rolling_kmers
    from fastqueeze_tpu.io import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(9)
    n = 50_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    amb = rng.random(n) < 0.002
    for k in (11, 14, 15, 16, 22, 31):
        out = native.csr_build(codes, amb, k)
        assert out is not None, k
        kv, valid = _rolling_kmers(codes, amb, k)
        pos_all = np.flatnonzero(valid)
        kvv = kv[pos_all]
        order = np.argsort(kvv, kind="stable")
        np.testing.assert_array_equal(out[0], kvv[order])
        np.testing.assert_array_equal(out[1],
                                      pos_all[order].astype(np.uint32))
