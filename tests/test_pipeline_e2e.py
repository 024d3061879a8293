"""End-to-end compress/decompress round-trips (SURVEY.md §4's golden tests),
on small inputs + small models to keep CPU compile time down."""

import gzip
import os

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.pipeline.driver import compress_se, decompress
from fastqueeze_tpu.pipeline.pe import compress_pe

# small models/lanes: CPU-friendly compile shapes
SMALL = dict(slevel=0, lanes_min=16, lanes_max=32, lane_target_symbols=512,
             block_size_mb=50)


def _mk_fastq(rng, n, minlen=30, maxlen=150, constant_len=None):
    recs = []
    for i in range(n):
        ln = constant_len or int(rng.integers(minlen, maxlen + 1))
        seq = rng.choice(list(b"ACGT"), size=ln).astype(np.uint8)
        if rng.random() < 0.2:
            seq[rng.integers(0, ln)] = ord("N")
        qual = (np.clip(np.cumsum(rng.integers(-2, 3, size=ln)) % 60, 0, 40)
                + 33).astype(np.uint8)
        recs.append(f"@sim.{i} {i} length={ln}\n{bytes(seq).decode()}\n+\n"
                    f"{bytes(qual).decode()}\n")
    return "".join(recs).encode()


def _se_roundtrip(tmp_path, raw, name="in.fq", **kw):
    p = CodecParams(**{**SMALL, **kw})
    src = tmp_path / name
    src.write_bytes(raw)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se(p, str(src), arc)
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    back = open(outs[0], "rb").read()
    assert back == raw
    return stats


def test_se_roundtrip_varlen(tmp_path):
    rng = np.random.default_rng(0)
    _se_roundtrip(tmp_path, _mk_fastq(rng, 300))


def test_se_roundtrip_constlen(tmp_path):
    rng = np.random.default_rng(1)
    stats = _se_roundtrip(tmp_path, _mk_fastq(rng, 300, constant_len=100))
    assert stats["ratio"] > 2.0


def test_se_no_final_newline(tmp_path):
    rng = np.random.default_rng(2)
    _se_roundtrip(tmp_path, _mk_fastq(rng, 50)[:-1])


def test_se_gz_input(tmp_path):
    rng = np.random.default_rng(3)
    raw = _mk_fastq(rng, 100)
    src = tmp_path / "in.fq.gz"
    with gzip.open(src, "wb") as fh:
        fh.write(raw)
    p = CodecParams(**SMALL)
    arc = str(tmp_path / "out.fqz")
    compress_se(p, str(src), arc)
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    assert open(outs[0], "rb").read() == raw


def test_se_multiblock(tmp_path):
    rng = np.random.default_rng(4)
    raw = _mk_fastq(rng, 400)
    p = CodecParams(**SMALL, block_bytes=8192)
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se(p, str(src), arc)
    assert stats["blocks"] > 2
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    assert open(outs[0], "rb").read() == raw


def test_corrupt_block_detected(tmp_path):
    rng = np.random.default_rng(5)
    raw = _mk_fastq(rng, 100)
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc = str(tmp_path / "out.fqz")
    compress_se(CodecParams(**SMALL), str(src), arc)
    data = bytearray(open(arc, "rb").read())
    data[-30] ^= 0xFF  # flip a bit inside the last block payload
    open(arc, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="MD5|decode|length"):
        decompress(arc, str(tmp_path / "back"), force=True)


def test_pe_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    n = 150
    raw1 = _mk_fastq(rng, n, constant_len=80)
    raw2 = _mk_fastq(rng, n, constant_len=80)
    f1, f2 = tmp_path / "a_1.fq", tmp_path / "a_2.fq"
    f1.write_bytes(raw1)
    f2.write_bytes(raw2)
    arc = str(tmp_path / "pe.fqz")
    p = CodecParams(**SMALL, is_pe=1)
    compress_pe(p, str(f1), str(f2), arc)
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    assert open(outs[0], "rb").read() == raw1
    assert open(outs[1], "rb").read() == raw2


def test_pe_mismatched_counts_rejected(tmp_path):
    rng = np.random.default_rng(7)
    f1, f2 = tmp_path / "a_1.fq", tmp_path / "a_2.fq"
    f1.write_bytes(_mk_fastq(rng, 60, constant_len=50))
    f2.write_bytes(_mk_fastq(rng, 59, constant_len=50))
    with pytest.raises(ValueError):
        compress_pe(CodecParams(**SMALL, is_pe=1), str(f1), str(f2),
                    str(tmp_path / "pe.fqz"))


def test_threads_roundtrip_and_determinism(tmp_path):
    """-t N must produce the identical archive to -t 1 (block outputs are
    order-independent) and round-trip exactly."""
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress
    rng = np.random.default_rng(21)
    raw = _mk_fastq(rng, 1000) * 12
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p1 = CodecParams(**SMALL)
    p1.block_size_mb = 1
    compress_se(p1, str(src), str(tmp_path / "t1.fqz"))
    p3 = CodecParams(threads=3, **SMALL)
    p3.block_size_mb = 1
    compress_se(p3, str(src), str(tmp_path / "t3.fqz"))
    a = (tmp_path / "t1.fqz").read_bytes()
    b = (tmp_path / "t3.fqz").read_bytes()
    # PARAM section differs only in the threads field; block payloads and
    # tables must be identical
    from fastqueeze_tpu.container.arcfile import ArcReader
    with ArcReader(str(tmp_path / "t1.fqz")) as r1, \
            ArcReader(str(tmp_path / "t3.fqz")) as r3:
        assert len(r1.blocks) == len(r3.blocks) >= 2
        for i in range(len(r1.blocks)):
            assert r1.read_block(i) == r3.read_block(i)
    outs = decompress(str(tmp_path / "t3.fqz"), str(tmp_path / "back"),
                      force=True, threads=3)
    assert open(outs[0], "rb").read() == raw


def test_e2e_config_matrix(tmp_path):
    """SURVEY.md §4: coder-shaping parameter combinations (slevel/qlevel/
    usemodel) must round-trip from the archive's own serialized params —
    the reference crashes when seqarc.config is absent at decode time."""
    rng = np.random.default_rng(42)
    recs = []
    for i in range(300):
        L = int(rng.integers(30, 150))
        seq = "".join(rng.choice(list("ACGTN"), L,
                                 p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 60, L))
        recs.append(f"@m.{i} x\n{seq}\n+\n{qual}\n")
    raw = "".join(recs).encode()
    src = tmp_path / "m.fq"
    src.write_bytes(raw)
    for kw in (dict(slevel=0, qlevel=1), dict(slevel=1, qlevel=3),
               dict(slevel=0, qlevel=2, use_model=1),
               dict(slevel=0, qlevel=2, adapt_chunk=16)):
        p = CodecParams(lanes_min=16, lanes_max=64,
                        lane_target_symbols=512, **kw)
        out = tmp_path / "m.fqz"
        compress_se(p, str(src), str(out))
        back = decompress(str(out), str(tmp_path / "b"), force=True)
        assert open(back[0], "rb").read() == raw, kw


def test_binned_qual_dense_alphabet(tmp_path):
    """Modern binned qualities (4 distinct values) must code with a dense
    rank alphabet (8 after round-up, not 40), and round-trip bit-exact —
    including a frozen-model run where a later block carries a quality
    value the training prefix never saw (rank-space extension)."""
    import json

    from fastqueeze_tpu.container.arcfile import ArcReader
    from fastqueeze_tpu.container.encap import iter_tlv
    from fastqueeze_tpu.pipeline.blockcodec import TAG_META

    rng = np.random.default_rng(5)
    recs = []
    for i in range(400):
        ln = 80
        seq = rng.choice(list(b"ACGT"), size=ln).astype(np.uint8)
        qual = rng.choice([2, 12, 24, 37], size=ln).astype(np.uint8) + 33
        if i == 399:   # one read with a value unseen elsewhere
            qual[5] = 40 + 33
        recs.append(b"@r%d\n%s\n+\n%s\n"
                    % (i, bytes(seq), bytes(qual)))
    raw = b"".join(recs)
    stats = _se_roundtrip(tmp_path, raw)
    with ArcReader(str(tmp_path / "out.fqz")) as r:
        meta = json.loads(dict(iter_tlv(r.read_block(0)))[TAG_META])
    assert meta["qmax"] <= 7 and len(meta["qv"]) == 5

    # frozen tables trained WITHOUT a value that a later block contains:
    # the block must extend the rank space (appended rank, padded table)
    # and still round-trip bit-exact
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.blockcodec import decode_block, encode_block
    from fastqueeze_tpu.pipeline.frozen import train_frozen

    p = CodecParams(**SMALL)
    train_blk = parse_block(b"".join(recs[:200]), True)
    frozen = train_frozen(p, train_blk)
    assert len(frozen["qvals"]) == 4          # 5th value only in read 399
    oov_blk = parse_block(b"".join(recs[380:]), True)
    payload = encode_block(p, oov_blk, frozen=frozen)
    back = decode_block(p, payload, frozen=frozen)
    assert np.array_equal(back.qual_flat, oov_blk.qual_flat)
    assert np.array_equal(back.seq_flat, oov_blk.seq_flat)


def test_se_unbinnable_ids_fallback_coder(tmp_path):
    """Random-hash IDs defeat the ID binner; the tokenized fallback name
    coder (reference encode_name parity) must round-trip them and beat the
    raw+order-1 floor."""
    import random
    rng = np.random.default_rng(9)
    rd = random.Random(9)
    recs = []
    for i in range(300):
        name = ("".join(rd.choice("0123456789abcdef") for _ in range(16))
                + f" run={rd.randint(1000, 9999)} length=90")
        seq = bytes(rng.choice(list(b"ACGT"), size=90).astype(np.uint8)
                    ).decode()
        qual = bytes(rng.integers(33, 73, size=90).astype(np.uint8)).decode()
        recs.append(f"@{name}\n{seq}\n+\n{qual}\n")
    raw = "".join(recs).encode()
    stats = _se_roundtrip(tmp_path, raw)
    assert stats["ratio"] > 1.5


def test_long_reads_ont_style(tmp_path):
    """ONT/PacBio-style long reads: variable-width length tier (one read
    over 65,535 bases exercises the 4-byte tier), >254 degenerate bases in
    one read, round-trip bit-exact (reference hard-fails on none of this
    because it never gets there; SURVEY.md encode_len_long parity)."""
    rng = np.random.default_rng(11)
    # one read over 65,535 (4-byte tier) + a few mid-size; kept small —
    # this test costs minutes of 1-vCPU wave coding per extra 10 kb
    lens = [70_000] + [int(x) for x in rng.integers(2_000, 8_000, 4)]
    recs = []
    for i, ln in enumerate(lens):
        seq = rng.choice(list(b"ACGT"), size=ln).astype(np.uint8)
        if i == 0:   # a 300-N run: dege count > 254 in one read
            seq[1000:1300] = ord("N")
        qual = (rng.integers(0, 60, size=ln) + 33).astype(np.uint8)
        recs.append(b"@ont/" + str(i).encode() + b"\n" + seq.tobytes()
                    + b"\n+\n" + qual.tobytes() + b"\n")
    raw = b"".join(recs)
    stats = _se_roundtrip(tmp_path, raw, qlevel=1)
    assert stats["ratio"] > 1.5


def test_qual_chars_above_126(tmp_path):
    """decode_qual_128 parity (SURVEY.md §2.1): quality chars past '~'
    (126) up to 255 round-trip — rank coding makes the raw char range
    irrelevant.  Chars below 33 stay rejected (FASTQ framing)."""
    rng = np.random.default_rng(12)
    recs = []
    for i in range(120):
        seq = rng.choice(list(b"ACGT"), size=80).astype(np.uint8)
        qual = rng.choice([33, 70, 126, 127, 160, 200, 255],
                          size=80).astype(np.uint8)
        recs.append(b"@hi.%d\n" % i + seq.tobytes() + b"\n+\n"
                    + qual.tobytes() + b"\n")
    _se_roundtrip(tmp_path, b"".join(recs))


def test_qual_chars_below_33_rejected(tmp_path):
    rng = np.random.default_rng(13)
    rec = b"@lo.0\nACGTACGT\n+\n" + bytes([32] * 8) + b"\n"
    src = tmp_path / "lo.fq"
    src.write_bytes(rec)
    p = CodecParams(**SMALL)
    with pytest.raises(ValueError, match="quality"):
        compress_se(p, str(src), str(tmp_path / "lo.fqz"))
