"""Corruption fuzz: every mangled archive must be rejected with a clean
error (ValueError family), never an unhandled IndexError/segfault and
never silent wrong output.  (Failure-detection hardening, SURVEY.md §5;
deterministic seeds so failures reproduce.)"""

import random

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.pipeline.driver import compress_se, decompress

SMALL = dict(slevel=0, lanes_min=16, lanes_max=32, lane_target_symbols=512)


@pytest.fixture(scope="module")
def arc_and_raw(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(7)
    recs = []
    for i in range(150):
        L = int(rng.integers(20, 60))
        seq = "".join(rng.choice(list("ACGTN"), L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, L))
        recs.append(f"@fz.{i} x\n{seq}\n+\n{qual}\n")
    raw = "".join(recs).encode()
    src = tmp / "in.fq"
    src.write_bytes(raw)
    arc = tmp / "a.fqz"
    compress_se(CodecParams(**SMALL), str(src), str(arc))
    return arc.read_bytes(), raw, tmp


def test_corrupt_archives_fail_cleanly(arc_and_raw):
    arc, raw, tmp = arc_and_raw
    random.seed(11)
    for trial in range(24):
        mode = trial % 3
        b = bytearray(arc)
        if mode == 0:                       # flip one byte
            i = random.randrange(len(b))
            b[i] ^= random.randrange(1, 256)
        elif mode == 1:                     # truncate
            b = b[:random.randrange(1, len(b))]
        else:                               # zero a 16-byte span
            i = random.randrange(len(b))
            b[i:i + 16] = b"\x00" * 16
        bad = tmp / "bad.fqz"
        bad.write_bytes(bytes(b))
        try:
            outs = decompress(str(bad), str(tmp / "out"), force=True)
        except (ValueError, KeyError, EOFError, OSError):
            continue                        # clean rejection
        # decode "succeeded": only acceptable if the mutation landed in
        # dead bytes and the output is still exact
        assert open(outs[0], "rb").read() == raw, \
            f"silent corruption (trial {trial}, mode {mode})"


def test_corrupt_frozen_archives_fail_cleanly(tmp_path):
    """Same sweep against a usemodel archive: the MODEL section, frozen
    ternary decode and the sentinel d2h fetch all sit on this path."""
    rng = np.random.default_rng(8)
    recs = []
    for i in range(150):
        L = int(rng.integers(20, 60))
        seq = "".join(rng.choice(list("ACGTN"), L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, L))
        recs.append(f"@fz.{i} x\n{seq}\n+\n{qual}\n")
    raw = "".join(recs).encode()
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc_p = tmp_path / "a.fqz"
    compress_se(CodecParams(**SMALL, use_model=1), str(src), str(arc_p))
    arc = arc_p.read_bytes()
    random.seed(12)
    for trial in range(18):
        mode = trial % 3
        b = bytearray(arc)
        if mode == 0:
            i = random.randrange(len(b))
            b[i] ^= random.randrange(1, 256)
        elif mode == 1:
            b = b[:random.randrange(1, len(b))]
        else:
            i = random.randrange(len(b))
            b[i:i + 16] = b"\x00" * 16
        bad = tmp_path / "bad.fqz"
        bad.write_bytes(bytes(b))
        try:
            outs = decompress(str(bad), str(tmp_path / "out"), force=True)
        except (ValueError, KeyError, EOFError, OSError):
            continue
        assert open(outs[0], "rb").read() == raw, \
            f"silent corruption (trial {trial}, mode {mode})"


def test_corrupt_aligned_indel_archives_fail_cleanly(tmp_path):
    """Same sweep against an aligned archive carrying multi-op indel
    streams (ACIG*/ACG2*): the two-op decode splice indexes the reference
    with stream-derived splits/gaps — corruption must surface as a clean
    MD5/ValueError, never an unhandled IndexError."""
    from fastqueeze_tpu.align.index import build_from_ref
    from fastqueeze_tpu.align.ref import load_fasta
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 4, 20_000).astype(np.uint8)
    fa = tmp_path / "ref.fa"
    fa.write_text(">r\n" + "".join("ACGT"[c] for c in ref) + "\n")
    recs = []
    for i in range(80):
        start = int(rng.integers(10, len(ref) - 140))
        r = ref[start:start + 100].copy()
        s1, s2 = int(rng.integers(15, 35)), int(rng.integers(60, 85))
        r = np.concatenate([r[:s1], r[s1 + 1:]])       # 1 bp deletion
        ins = rng.integers(0, 4, 1).astype(np.uint8)
        r = np.concatenate([r[:s2], ins, r[s2:]])[:100]  # + 1 bp insertion
        seq = "".join("ACGT"[c] for c in r)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(2, 40, len(r)))
        recs.append(f"@iz.{i}\n{seq}\n+\n{qual}\n")
    raw = "".join(recs).encode()
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc_p = tmp_path / "a.fqz"
    p = CodecParams(**SMALL, seed_len=10, seed_max_occ=8, seed_big_occ=32,
                    max_mis=4, max_indel=3, indel_ops=2)
    stats = compress_se_aligned(p, str(fa), str(src), str(arc_p))
    assert stats["mapped"] >= 40          # the 2-op streams are present
    arc = arc_p.read_bytes()
    random.seed(13)
    for trial in range(18):
        mode = trial % 3
        b = bytearray(arc)
        if mode == 0:
            i = random.randrange(len(b))
            b[i] ^= random.randrange(1, 256)
        elif mode == 1:
            b = b[:random.randrange(1, len(b))]
        else:
            i = random.randrange(len(b))
            b[i:i + 16] = b"\x00" * 16
        bad = tmp_path / "bad.fqz"
        bad.write_bytes(bytes(b))
        try:
            outs = decompress(str(bad), str(tmp_path / "out"),
                              ref=str(fa), force=True)
        except (ValueError, KeyError, EOFError, OSError):
            continue
        assert open(outs[0], "rb").read() == raw, \
            f"silent corruption (trial {trial}, mode {mode})"


def test_hostile_param_values_rejected():
    """PARAM is untrusted input: parameters that size model tables or
    drive native loops must be range-checked at load, not allocated —
    qctx_hash_bits=40 would otherwise try a 2^40-row table."""
    import pytest
    from fastqueeze_tpu.config import CodecParams
    base = CodecParams().to_bytes()
    import json
    d = json.loads(base.decode())
    for field, bad in (("qctx_hash_bits", 40), ("qctx_k", 60),
                       ("slevel", 30), ("qlevel", 9),
                       ("qual_cap", 1 << 30), ("seq_cap", 0),
                       ("lanes_max", 1 << 30), ("qmax", 100000),
                       ("align_max_len", 1 << 40),
                       ("block_size_mb", -3),
                       ("qctx_hash_bits", "40")):
        bd = dict(d)
        bd[field] = bad
        with pytest.raises(ValueError):
            CodecParams.from_bytes(json.dumps(bd).encode())
    # a chain scheme with an absurd base must be rejected too
    bd = dict(d)
    bd.update(qctx_k=4, qctx_base=1)
    with pytest.raises(ValueError):
        CodecParams.from_bytes(json.dumps(bd).encode())
    # round-trip of healthy params still loads
    CodecParams.from_bytes(base)


def test_corrupt_longread_archives_fail_cleanly(tmp_path):
    """Long-read chunk streams (LR*) decode through stream-derived
    positions/column indices — corruption must surface as ValueError or
    the block MD5, never wrong output or an unhandled IndexError."""
    import hashlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from genome_fixture import make_genome, write_fasta

    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    codes, bounds = make_genome(200_000, seed=13)
    fa = str(tmp_path / "ref.fa")
    write_fasta(codes, bounds, fa)
    rng = np.random.default_rng(14)
    recs = []
    for i in range(20):
        L = int(rng.integers(4000, 9000))
        st = int(rng.integers(0, len(codes) - L))
        r = np.minimum(codes[st:st + L], 3)
        seq = np.frombuffer(b"ACGT", np.uint8)[r].tobytes()
        recs.append(b"@l.%d\n%s\n+\n%s\n" % (i, seq, bytes([70]) * L))
    src = tmp_path / "lr.fq"
    src.write_bytes(b"".join(recs))
    arc = tmp_path / "lr.fqz"
    compress_se_aligned(CodecParams(**SMALL), fa, str(src), str(arc))
    raw_md5 = hashlib.md5(src.read_bytes()).digest()
    arc_b = arc.read_bytes()
    random.seed(23)
    for trial in range(16):
        b = bytearray(arc_b)
        i = random.randrange(len(b))
        b[i] ^= random.randrange(1, 256)
        bad = tmp_path / "bad.fqz"
        bad.write_bytes(bytes(b))
        try:
            outs = decompress(str(bad), str(tmp_path / "out"), force=True,
                              ref=fa)
        except (ValueError, KeyError, EOFError, OSError):
            continue
        assert (hashlib.md5(open(outs[0], "rb").read()).digest()
                == raw_md5), f"silent corruption (trial {trial})"


def test_corrupt_partial_archives_fail_cleanly(tmp_path):
    """Mangled PART sections / partial archives: clean rejection from
    both --merge and decode."""
    from fastqueeze_tpu.container.arcfile import merge_archives
    rng = np.random.default_rng(15)
    recs = []
    for i in range(200):
        seq = "".join(rng.choice(list("ACGT"), 40))
        q = "".join(chr(33 + int(x)) for x in rng.integers(2, 40, 40))
        recs.append(f"@p.{i}\n{seq}\n+\n{q}\n")
    src = tmp_path / "in.fq"
    src.write_bytes("".join(recs).encode())
    parts = []
    for k in range(2):
        pth = str(tmp_path / f"p{k}.fqz")
        compress_se(CodecParams(**SMALL, block_bytes=2048), str(src), pth,
                    part=(k, 2))
        parts.append(pth)
    base = open(parts[0], "rb").read()
    random.seed(31)
    for trial in range(12):
        b = bytearray(base)
        i = random.randrange(len(b))
        b[i] ^= random.randrange(1, 256)
        bad = str(tmp_path / "bad0.fqz")
        open(bad, "wb").write(bytes(b))
        try:
            merge_archives(str(tmp_path / "m.fqz"), [bad, parts[1]],
                           force=True)
            # merge may succeed if the flip hit a block payload (merge
            # only validates headers); the decode must then catch it
            decompress(str(tmp_path / "m.fqz"), str(tmp_path / "out"),
                       force=True)
        except (ValueError, KeyError, EOFError, OSError):
            continue
        # fully clean round-trip: flip landed in dead bytes — verify
        out = open(str(tmp_path / "out") + ".fastq", "rb").read()
        assert out == src.read_bytes(), f"silent corruption ({trial})"
