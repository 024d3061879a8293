import io

import pytest

from fastqueeze_tpu.container.encap import (
    iter_tlv, read_tlv, read_varint, write_tlv, write_varint)


@pytest.mark.parametrize("v", [0, 1, 126, 127, 128, 300, 16382, 16383,
                               2**21 - 2, 2**21, 2**28, 2**40, 2**55 - 2])
def test_varint_roundtrip(v):
    raw = write_varint(v)
    assert read_varint(io.BytesIO(raw)) == v


def test_varint_lengths():
    assert len(write_varint(0)) == 1
    assert len(write_varint(126)) == 1
    assert len(write_varint(127)) == 2   # 127 = all-ones payload, reserved
    assert len(write_varint(16382)) == 2
    assert len(write_varint(16383)) == 3


def test_tlv_roundtrip():
    sections = [(1, b"hello"), (2, b""), (1000, b"x" * 100000)]
    raw = b"".join(write_tlv(t, p) for t, p in sections)
    assert list(iter_tlv(raw)) == sections


def test_tlv_truncated():
    raw = write_tlv(5, b"abcdef")[:-2]
    with pytest.raises(EOFError):
        read_tlv(io.BytesIO(raw))
