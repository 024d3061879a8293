"""Self-referential alignment (-S / CodecParams.self_align): mapped reads
code against a reference rebuilt at decode time from the block's own
unmapped unique reads — no FASTA on either side, no permutation stream."""

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.pipeline.driver import compress_se, decompress

SMALL = dict(slevel=0, lanes_min=16, lanes_max=32, lane_target_symbols=512,
             seed_len=10)


def _coverage_fastq(n_reads=1500, genome_len=20000, L=80, err=0.005,
                    seed=42, with_n=False, dup_every=0):
    """Reads sampled from a random genome at high coverage — the shape
    self-referential alignment is built for (near-duplicates everywhere,
    few exact duplicates)."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len).astype(np.uint8)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(n_reads):
        if dup_every and i % dup_every == 1 and i > dup_every:
            recs.append(recs[i - dup_every])    # exact duplicate record
            continue
        pos = int(rng.integers(0, genome_len - L))
        r = genome[pos:pos + L].copy()
        e = rng.random(L) < err
        r[e] = (r[e] + rng.integers(1, 4, int(e.sum()))) % 4
        if rng.random() < 0.5:
            r = 3 - r[::-1]
        seq = BASES[r].tobytes()
        if with_n and rng.random() < 0.1:
            b = bytearray(seq)
            b[int(rng.integers(0, L))] = ord("N")
            seq = bytes(b)
        q = (rng.integers(30, 41, L).astype(np.uint8) + 33).tobytes()
        recs.append(b"@c.%d\n" % i + seq + b"\n+\n" + q + b"\n")
    return b"".join(recs)


def _roundtrip(tmp_path, raw, **kw):
    p = CodecParams(**{**SMALL, **kw})
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se(p, str(src), arc)
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    assert open(outs[0], "rb").read() == raw
    return stats


def test_selfref_beats_entropy_on_coverage_data(tmp_path):
    raw = _coverage_fastq()
    s_plain = _roundtrip(tmp_path, raw, self_align=0)
    s_self = _roundtrip(tmp_path, raw, self_align=1)
    assert s_self["compressed"] < s_plain["compressed"]


def test_auto_gate_probe_decisions():
    """auto_self_align (self_align=-1, the default): ON for high-coverage
    data, OFF when the context model already wins (low-entropy repeats)
    and OFF for unmappable random reads."""
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.selfref import auto_self_align
    p = CodecParams(**SMALL)
    assert auto_self_align(p, parse_block(_coverage_fastq(), True))

    rng = np.random.default_rng(17)
    motif = b"TTAGGG" * 20
    recs = []
    for i in range(800):
        off = int(rng.integers(0, 6))
        recs.append(b"@t.%d\n" % i + motif[off:off + 80] + b"\n+\n"
                    + bytes([33 + 35] * 80) + b"\n")
    assert not auto_self_align(p, parse_block(b"".join(recs), True))

    BASES = np.frombuffer(b"ACGT", np.uint8)
    recs = [b"@x.%d\n" % i + BASES[rng.integers(0, 4, 80)].tobytes()
            + b"\n+\n" + bytes([33 + 35] * 80) + b"\n" for i in range(800)]
    assert not auto_self_align(p, parse_block(b"".join(recs), True))


def test_auto_default_matches_forced_choice(tmp_path):
    # when auto enables, the archive is byte-identical to -S (the
    # resolved value also lands in PARAM)
    raw = _coverage_fastq()
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    a_auto, a_forced = str(tmp_path / "a.fqz"), str(tmp_path / "f.fqz")
    compress_se(CodecParams(**SMALL), str(src), a_auto)
    compress_se(CodecParams(**SMALL, self_align=1), str(src), a_forced)
    assert open(a_auto, "rb").read() == open(a_forced, "rb").read()


def test_selfref_with_n_bases_and_duplicates(tmp_path):
    # degenerate reads are excluded from the self-reference on both sides;
    # exact duplicates ride the dedup tier, not the aligner
    raw = _coverage_fastq(with_n=True, dup_every=7, seed=3)
    _roundtrip(tmp_path, raw, self_align=1)


def test_selfref_tail_overhang_roundtrip(tmp_path):
    """A read mapping onto the block's LAST kept read with a <= max_mis
    tail overhang produces a window past the self-reference end; the
    encode-side mismatch-context gather must clip like the decode side
    (unclipped it crashed with IndexError on the default auto path)."""
    rng = np.random.default_rng(77)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    r0 = rng.integers(0, 4, 60).astype(np.uint8)
    # r1 = r0 shifted 2 left + 2 novel tail bases -> maps at pos 2 with a
    # 2-base overhang past the end of the rebuilt reference
    r1 = np.concatenate([r0[2:], rng.integers(0, 4, 2).astype(np.uint8)])
    recs = []
    for i, r in enumerate((r0, r1)):
        q = (rng.integers(30, 41, len(r)).astype(np.uint8) + 33).tobytes()
        recs.append(b"@ov.%d\n" % i + BASES[r].tobytes() + b"\n+\n"
                    + q + b"\n")
    raw = b"".join(recs)
    _roundtrip(tmp_path, raw, self_align=1, min_map_ratio=0.0)


def test_selfref_low_coverage_gate(tmp_path):
    # unmappable data (every read unique random): the map-ratio gate keeps
    # the block entropy-only and the archive stays loss-free
    rng = np.random.default_rng(5)
    recs = []
    for i in range(200):
        seq = "".join(rng.choice(list("ACGT"), 60))
        q = "".join(chr(33 + int(x)) for x in rng.integers(0, 40, 60))
        recs.append(f"@u.{i}\n{seq}\n+\n{q}\n")
    raw = "".join(recs).encode()
    stats = _roundtrip(tmp_path, raw, self_align=1)
    assert stats["ratio"] > 1.0


def test_selfref_multiblock_and_threads(tmp_path):
    # per-block self-references; -t 2 payloads identical to -t 1
    raw = _coverage_fastq(n_reads=2400, seed=9)
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    a1 = str(tmp_path / "t1.fqz")
    a2 = str(tmp_path / "t2.fqz")
    bb = len(raw) // 3 + 200
    compress_se(CodecParams(**SMALL, self_align=1, block_bytes=bb,
                            threads=1), str(src), a1)
    compress_se(CodecParams(**SMALL, self_align=1, block_bytes=bb,
                            threads=2), str(src), a2)
    from fastqueeze_tpu.container.arcfile import ArcReader
    with ArcReader(a1) as r1, ArcReader(a2) as r2:
        assert len(r1.blocks) > 1
        assert all(r1.read_block(i) == r2.read_block(i)
                   for i in range(len(r1.blocks)))
    outs = decompress(a1, str(tmp_path / "back"), force=True)
    assert open(outs[0], "rb").read() == raw


def test_selfref_pe_roundtrip(tmp_path):
    # -S over PE: mates interleave into one block; the self-reference is
    # per merged block; decode rebuilds it inside decode_block unchanged
    from fastqueeze_tpu.pipeline.pe import compress_pe
    raw1 = _coverage_fastq(n_reads=700, seed=21)
    raw2 = _coverage_fastq(n_reads=700, seed=22)
    f1, f2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    f1.write_bytes(raw1)
    f2.write_bytes(raw2)
    arc = str(tmp_path / "pe.fqz")
    compress_pe(CodecParams(**SMALL, self_align=1), str(f1), str(f2), arc)
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    assert open(outs[0], "rb").read() == raw1
    assert open(outs[1], "rb").read() == raw2


def test_selfref_corrupt_fails_cleanly(tmp_path):
    import random
    raw = _coverage_fastq(n_reads=600, seed=11)
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc = tmp_path / "o.fqz"
    compress_se(CodecParams(**SMALL, self_align=1), str(src), str(arc))
    blob = arc.read_bytes()
    random.seed(31)
    for _ in range(10):
        b = bytearray(blob)
        i = random.randrange(len(b) // 2, len(b))
        b[i] ^= random.randrange(1, 256)
        bad = tmp_path / "bad.fqz"
        bad.write_bytes(bytes(b))
        try:
            outs = decompress(str(bad), str(tmp_path / "bk"), force=True)
            assert open(outs[0], "rb").read() == raw
        except ValueError:
            pass


def test_selfref_native_mirror_bit_identical():
    """native fq_selfref_align vs the numpy mirror (_selfref_align_py):
    decisions, final positions, rev flags, masks, and the rebuilt
    reference must agree exactly (the mirror is the no-native fallback
    AND the review oracle for the sequential kept[] logic)."""
    import dataclasses

    import fastqueeze_tpu.io.native as N
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.selfref import maybe_align_self
    if N.get_lib() is None:
        pytest.skip("native library unavailable")
    raw = _coverage_fastq(n_reads=900, genome_len=12000, seed=77,
                          with_n=True, dup_every=9)
    blk = parse_block(raw, True)
    p = dataclasses.replace(CodecParams(**SMALL), min_map_ratio=0.0)
    r1, c1 = maybe_align_self(p, blk)
    orig = N.selfref_align
    N.selfref_align = lambda *a, **k: None
    try:
        r2, c2 = maybe_align_self(p, blk)
    finally:
        N.selfref_align = orig
    assert np.array_equal(r1.mapped, r2.mapped)
    assert np.array_equal(r1.pos, r2.pos)
    assert np.array_equal(r1.is_rev, r2.is_rev)
    assert np.array_equal(r1.mis_mask, r2.mis_mask)
    assert np.array_equal(c1, c2)
    assert r1.mapped.sum() > 0
