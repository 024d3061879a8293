import gzip
import os

import numpy as np
import pytest

from fastqueeze_tpu.io.fastq import (
    assemble_block, parse_block, read_blocks)


def _mk_fastq(rng, n, minlen=30, maxlen=150, with_comment=True,
              with_n=True, plus_content=False):
    recs = []
    for i in range(n):
        ln = int(rng.integers(minlen, maxlen + 1))
        seq = rng.choice(list(b"ACGT"), size=ln).astype(np.uint8)
        if with_n and rng.random() < 0.3:
            pos = rng.integers(0, ln)
            seq[pos] = ord("N")
        qual = rng.integers(33, 74, size=ln).astype(np.uint8)
        cm = f" c{i}" if with_comment else ""
        ident = f"read.{i}{cm}"
        plus = ident if plus_content else ""
        recs.append(f"@{ident}\n{bytes(seq).decode()}\n+{plus}\n"
                    f"{bytes(qual).decode()}\n")
    return "".join(recs).encode()


def test_parse_assemble_roundtrip():
    rng = np.random.default_rng(0)
    raw = _mk_fastq(rng, 100)
    blk = parse_block(raw, True)
    assert assemble_block(blk) == raw


def test_parse_assemble_no_final_newline():
    rng = np.random.default_rng(1)
    raw = _mk_fastq(rng, 10)[:-1]
    blk = parse_block(raw, False)
    assert assemble_block(blk) == raw


def test_plus_with_content():
    rng = np.random.default_rng(2)
    raw = _mk_fastq(rng, 20, plus_content=True)
    blk = parse_block(raw, True)
    assert blk.plus[0] != b""
    assert assemble_block(blk) == raw


def test_malformed_rejected():
    with pytest.raises(ValueError):
        parse_block(b"@x\nACGT\n+\nIIII\nextra\n", True)
    with pytest.raises(ValueError):
        parse_block(b"x\nACGT\n+\nIIII\n", True)
    with pytest.raises(ValueError):
        parse_block(b"@x\nACGT\n+\nIII\n", True)  # qual len mismatch


def test_read_blocks_boundaries(tmp_path):
    rng = np.random.default_rng(3)
    raw = _mk_fastq(rng, 203)
    path = tmp_path / "t.fq"
    path.write_bytes(raw)
    blocks = list(read_blocks(str(path), 4096))
    assert b"".join(b for b, _ in blocks) == raw
    assert len(blocks) > 3
    for braw, fnl in blocks:
        blk = parse_block(braw, fnl)  # every block is whole records
        assert blk.n_reads > 0


def test_read_blocks_gz(tmp_path):
    rng = np.random.default_rng(4)
    raw = _mk_fastq(rng, 50)
    path = tmp_path / "t.fq.gz"
    with gzip.open(path, "wb") as fh:
        fh.write(raw)
    blocks = list(read_blocks(str(path), 1 << 20))
    assert b"".join(b for b, _ in blocks) == raw
