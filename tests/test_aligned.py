"""Alignment subsystem tests: index build/save/load, batched aligner
correctness, aligned SE/PE round-trips, wrong-ref rejection
(SURVEY.md §4 golden tests for the +ref configs)."""

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.align.ref import load_fasta, pack_2bit, unpack_2bit
from fastqueeze_tpu.align.index import (
    build_from_ref, build_index, load_index, load_index_file, save_index)
from fastqueeze_tpu.align.hash import Aligner

SMALL = dict(slevel=0, lanes_min=16, lanes_max=32, lane_target_symbols=512,
             seed_len=10, seed_max_occ=8, seed_big_occ=32, max_mis=4)


def _write_fasta(path, codes, name="chr1"):
    seq = "".join("ACGT"[c] for c in codes)
    with open(path, "w") as f:
        f.write(f">{name} test\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refs")
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 20_000).astype(np.uint8)
    fa = str(tmp / "ref.fa")
    _write_fasta(fa, codes)
    return fa, codes, rng


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for n in (0, 1, 15, 16, 17, 100):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(codes), n), codes)


def test_index_build_save_load(ref_env, tmp_path):
    fa, codes, _ = ref_env
    p = CodecParams(**SMALL)
    out = build_index(fa, p, str(tmp_path / "ref.fqzidx"))
    idx = load_index_file(out)
    assert idx.ref_len == len(codes)
    assert idx.k == p.seed_len
    assert np.array_equal(np.sort(idx.keys), idx.keys)
    assert int(idx.offsets[-1]) == idx.n_positions
    # every stored position's k-mer equals its key
    ref = load_fasta(fa)
    j = 5 if idx.n_keys > 5 else 0
    s, e = int(idx.offsets[j]), int(idx.offsets[j + 1])
    for pos in idx.positions[s:e]:
        kv = 0
        for c in codes[pos:pos + idx.k]:
            kv = (kv << 2) | int(c)
        assert kv == int(idx.keys[j])


def test_align_exact_mutated_rc(ref_env):
    fa, ref_codes, rng = ref_env
    p = CodecParams(**SMALL)
    ref = load_fasta(fa)
    idx = build_from_ref(ref, p)
    al = Aligner(idx, p)

    R, L = 64, 60
    starts = rng.integers(0, len(ref_codes) - L, R)
    reads = ref_codes[starts[:, None] + np.arange(L)[None, :]].copy()
    true_rev = np.zeros(R, bool)
    for i in range(R):
        mp = rng.choice(L, rng.integers(0, 4), replace=False)
        reads[i, mp] = (reads[i, mp] + rng.integers(1, 4, len(mp))) % 4
        if i % 3 == 0:
            reads[i] = 3 - reads[i][::-1]
            true_rev[i] = True
    reads[:4] = rng.integers(0, 4, (4, L))      # random: should not map
    lengths = np.full(R, L, np.int64)
    res = al.align(reads.reshape(-1), np.zeros(R * L, bool), lengths)
    assert res.mapped[4:].sum() >= R - 8
    # reconstruction: window + patches (+ RC) == read
    for i in np.flatnonzero(res.mapped):
        win = ref_codes[res.pos[i]:res.pos[i] + L].copy()
        eff = (3 - reads[i][::-1]) if res.is_rev[i] else reads[i]
        mm = res.mis_mask[i, :L]
        win[mm] = eff[mm]
        out = (3 - win[::-1]) if res.is_rev[i] else win
        assert np.array_equal(out, reads[i])


def test_degenerate_reads_unmapped(ref_env):
    fa, ref_codes, _ = ref_env
    p = CodecParams(**SMALL)
    idx = build_from_ref(load_fasta(fa), p)
    al = Aligner(idx, p)
    L = 60
    reads = ref_codes[100:100 + L][None, :].copy()
    dege = np.zeros((1, L), bool)
    dege[0, 30] = True
    res = al.align(reads.reshape(-1), dege.reshape(-1),
                   np.array([L], np.int64))
    assert not res.mapped[0]


def _mk_fastq_from_ref(rng, ref_codes, n, L=60, rev_every=4, n_every=11):
    recs = []
    for i in range(n):
        s = int(rng.integers(0, len(ref_codes) - L))
        seq = ref_codes[s:s + L].copy()
        mp = rng.choice(L, rng.integers(0, 3), replace=False)
        seq[mp] = (seq[mp] + rng.integers(1, 4, len(mp))) % 4
        if i % rev_every == 0:
            seq = 3 - seq[::-1]
        txt = "".join("ACGT"[c] for c in seq)
        if i % n_every == 0:
            txt = txt[:20] + "N" + txt[21:]
        qual = "".join(chr(33 + int(q)) for q in
                       np.clip(rng.integers(2, 40, L), 0, 40))
        recs.append(f"@aln.{i} {i} length={L}\n{txt}\n+\n{qual}\n")
    return "".join(recs).encode()


def test_aligned_se_roundtrip(ref_env, tmp_path):
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw = _mk_fastq_from_ref(rng, ref_codes, 120)
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p = CodecParams(**SMALL)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    assert stats["mapped"] > 60
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw
    # wrong ref rejected
    other = str(tmp_path / "other.fa")
    _write_fasta(other, np.random.default_rng(1).integers(0, 4, 5000)
                 .astype(np.uint8))
    with pytest.raises(ValueError, match="wrong reference"):
        decompress(arc, str(tmp_path / "back2"), ref=other, force=True)
    # missing ref rejected
    with pytest.raises(ValueError, match="needs the same FASTA"):
        decompress(arc, str(tmp_path / "back3"), force=True)


def test_aligned_pe_roundtrip(ref_env, tmp_path):
    from fastqueeze_tpu.pipeline.pe import compress_pe
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw1 = _mk_fastq_from_ref(rng, ref_codes, 80)
    raw2 = _mk_fastq_from_ref(rng, ref_codes, 80)
    f1, f2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    f1.write_bytes(raw1)
    f2.write_bytes(raw2)
    p = CodecParams(**SMALL)
    arc = str(tmp_path / "pe.fqz")
    stats = compress_pe(p, str(f1), str(f2), arc, ref=fa)
    assert stats["mapped"] > 80
    outs = decompress(arc, str(tmp_path / "peback"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw1
    assert open(outs[1], "rb").read() == raw2


def test_low_map_ratio_falls_back_to_entropy(ref_env, tmp_path):
    """Random reads (unmappable) must still round-trip: the per-block
    aligned/fqz decision falls back (reference: Fqz block)."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, _, rng = ref_env
    recs = []
    for i in range(60):
        seq = "".join(rng.choice(list("ACGT"), 50))
        recs.append(f"@rnd.{i}\n{seq}\n+\n{'I' * 50}\n")
    raw = "".join(recs).encode()
    src = tmp_path / "rnd.fq"
    src.write_bytes(raw)
    p = CodecParams(**SMALL)
    arc = str(tmp_path / "rnd.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    outs = decompress(arc, str(tmp_path / "rndback"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw


def test_aligned_pe_insert_delta_roundtrip(ref_env, tmp_path):
    """PE -I mode (broken in the reference binary; reimplemented): mate-2
    positions near mate-1 are coded as insert-bounded deltas."""
    from fastqueeze_tpu.pipeline.pe import compress_pe
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    # build proper pairs: mate2 within +-200 bp of mate1
    recs1, recs2 = [], []
    L = 60
    for i in range(80):
        s1 = int(rng.integers(0, len(ref_codes) - L - 300))
        s2 = s1 + int(rng.integers(20, 200))
        seq1 = ref_codes[s1:s1 + L]
        seq2 = 3 - ref_codes[s2:s2 + L][::-1]
        q = "I" * L
        recs1.append(f"@pair.{i}\n"
                     f"{''.join('ACGT'[c] for c in seq1)}\n+\n{q}\n")
        recs2.append(f"@pair.{i}\n"
                     f"{''.join('ACGT'[c] for c in seq2)}\n+\n{q}\n")
    f1, f2 = tmp_path / "i1.fq", tmp_path / "i2.fq"
    f1.write_bytes("".join(recs1).encode())
    f2.write_bytes("".join(recs2).encode())
    p = CodecParams(max_insr=1000, **SMALL)
    arc = str(tmp_path / "ins.fqz")
    stats = compress_pe(p, str(f1), str(f2), arc, ref=fa)
    assert stats["mapped"] > 100
    outs = decompress(arc, str(tmp_path / "insback"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == f1.read_bytes()
    assert open(outs[1], "rb").read() == f2.read_bytes()
    # -I should not be larger than absolute coding
    p2 = CodecParams(max_insr=0, **SMALL)
    arc2 = str(tmp_path / "noins.fqz")
    compress_pe(p2, str(f1), str(f2), arc2, ref=fa)
    import os
    assert os.path.getsize(arc) <= os.path.getsize(arc2) + 64


def test_wide_key_longseed_backend(ref_env, tmp_path):
    """-q long-seed mode (k > 15, wide 2k-bit keys as u32 pairs): the
    BWA-SMEM specificity analogue (SURVEY.md C14/C15)."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    p = CodecParams(**{**SMALL, "seed_len": 22})
    ref = load_fasta(fa)
    idx = build_from_ref(ref, p)
    assert idx.keys.dtype == np.uint64
    al = Aligner(idx, p)
    assert al.wide
    R, L = 48, 60
    starts = rng.integers(0, len(ref_codes) - L, R)
    reads = ref_codes[starts[:, None] + np.arange(L)[None, :]].copy()
    for i in range(R):
        mp = rng.choice(L, rng.integers(0, 3), replace=False)
        reads[i, mp] = (reads[i, mp] + rng.integers(1, 4, len(mp))) % 4
        if i % 3 == 0:
            reads[i] = 3 - reads[i][::-1]
    res = al.align(reads.reshape(-1), np.zeros(R * L, bool),
                   np.full(R, L, np.int64))
    assert res.mapped.sum() >= R - 10
    for i in np.flatnonzero(res.mapped):
        win = ref_codes[res.pos[i]:res.pos[i] + L].copy()
        eff = (3 - reads[i][::-1]) if res.is_rev[i] else reads[i]
        win[res.mis_mask[i, :L]] = eff[res.mis_mask[i, :L]]
        out = (3 - win[::-1]) if res.is_rev[i] else win
        assert np.array_equal(out, reads[i])

    # end-to-end with the long-seed index
    raw = _mk_fastq_from_ref(rng, ref_codes, 100)
    src = tmp_path / "q.fq"
    src.write_bytes(raw)
    arc = str(tmp_path / "q.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    assert stats["mapped"] > 50
    outs = decompress(arc, str(tmp_path / "qback"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw


def test_pe_mate_window_rescue(ref_env, tmp_path):
    """An unmapped mate near its mapped mate is rescued by the windowed
    re-verification (consistent-pairing preference, -I mode)."""
    from fastqueeze_tpu.align.hash import AlignResult
    fa, ref_codes, rng = ref_env
    p = CodecParams(max_insr=500, **SMALL)
    idx = build_from_ref(load_fasta(fa), p)
    al = Aligner(idx, p)
    L = 60
    # pair: mate1 clean, mate2 heavily mutated in every seed window (so
    # seeding fails) but still within max_mis overall at a known offset
    s1 = 4000
    s2 = s1 + 150
    m1 = ref_codes[s1:s1 + L].copy()
    m2 = ref_codes[s2:s2 + L].copy()
    mut = np.arange(5, L, 15)[:4]            # 4 spread mutations
    m2[mut] = (m2[mut] + 1) % 4
    reads = np.concatenate([m1, m2])
    lengths = np.full(2, L, np.int64)
    res = al.align(reads, np.zeros(2 * L, bool), lengths)
    assert res.mapped[0]
    res2 = al.rescue_mates(reads, np.zeros(2 * L, bool), lengths, res,
                           p.max_insr)
    assert res2.mapped[1]
    assert abs(int(res2.pos[1]) - s2) == 0
    # reconstruction exactness for the rescued mate
    win = ref_codes[res2.pos[1]:res2.pos[1] + L].copy()
    eff = (3 - m2[::-1]) if res2.is_rev[1] else m2
    win[res2.mis_mask[1, :L]] = eff[res2.mis_mask[1, :L]]
    out = (3 - win[::-1]) if res2.is_rev[1] else win
    assert np.array_equal(out, m2)


def _indel_reads(rng, ref_codes, n, L=60, G=3):
    """Reads carrying one 1..G bp indel vs the reference (+ 0-2 extra
    mismatches), alternating deletions/insertions/strands."""
    recs = []
    truth = []
    for i in range(n):
        g = int(rng.integers(1, G + 1)) * (1 if i % 2 == 0 else -1)
        s = int(rng.integers(L // 4, 3 * L // 4))
        start = int(rng.integers(G, len(ref_codes) - L - 2 * G))
        if g > 0:       # read skips g ref bases at s
            seq = np.concatenate([ref_codes[start:start + s],
                                  ref_codes[start + s + g:start + L + g]])
        else:           # |g| inserted read bases at s
            ins = rng.integers(0, 4, -g).astype(np.uint8)
            seq = np.concatenate([ref_codes[start:start + s], ins,
                                  ref_codes[start + s:start + L + g]])
        seq = seq.copy()
        mp = rng.choice(L, rng.integers(0, 2), replace=False)
        seq[mp] = (seq[mp] + 1) % 4
        if i % 3 == 0:
            seq = 3 - seq[::-1]
        txt = "".join("ACGT"[c] for c in seq)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(2, 40, L))
        recs.append(f"@idl.{i} {i} length={L}\n{txt}\n+\n{qual}\n")
        truth.append((start, s, g))
    return "".join(recs).encode(), truth


def test_indel_tier_maps_gapped_reads(ref_env):
    """Reads with a 1-3 bp indel fail the gapless tiers but map through
    the one-indel rescue (reference CigaL/CigaV capability, -q mode)."""
    fa, ref_codes, rng = ref_env
    p = CodecParams(**SMALL, max_indel=3)
    idx = build_from_ref(load_fasta(fa), p)
    al = Aligner(idx, p)
    raw, truth = _indel_reads(rng, ref_codes, 24)
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.blockcodec import _BASE_MAP
    blk = parse_block(raw, True)
    codes = _BASE_MAP[blk.seq_flat].copy()
    dege = codes == 255
    codes[dege] = 0
    # gapless-only: these reads don't map
    p0 = CodecParams(**SMALL)
    res0 = Aligner(idx, p0).align(codes, dege, blk.lengths)
    assert int(res0.mapped.sum()) <= 4
    res = al.align(codes, dege, blk.lengths)
    n_idl = int((res.gap_len[res.mapped] != 0).sum())
    assert int(res.mapped.sum()) >= 18
    assert n_idl >= 16

    # exactness: spliced window + patches reconstructs every mapped read
    off = np.cumsum(blk.lengths) - blk.lengths
    for r in np.flatnonzero(res.mapped):
        L = int(blk.lengths[r])
        s, g, pos = int(res.gap_pos[r]), int(res.gap_len[r]), int(res.pos[r])
        i = np.arange(L)
        widx = pos + i + np.where(i >= s, g, 0)
        win = ref_codes[np.clip(widx, 0, len(ref_codes) - 1)].copy()
        if g < 0:
            win[(i >= s) & (i < s - g)] = 0
        mm = res.mis_mask[r, :L]
        read = codes[off[r]:off[r] + L]
        eff = (3 - read[::-1]) if res.is_rev[r] else read
        win[mm] = eff[mm]
        out = (3 - win[::-1]) if res.is_rev[r] else win
        assert np.array_equal(out, read), f"read {r} splice mismatch"


def _two_indel_reads(rng, ref_codes, n, L=100, G=3):
    """Reads carrying TWO separated 1..2 bp indels vs the reference
    (multi-op CigaL/CigaV generality), cumulative shift within +-G."""
    recs = []
    for i in range(n):
        g1 = int(rng.integers(1, 3)) * (1 if i % 2 == 0 else -1)
        g2 = int(rng.integers(1, 3)) * (1 if (i // 2) % 2 == 0 else -1)
        if abs(g1 + g2) > G:
            g2 = -g2
        s1 = int(rng.integers(15, 35))
        s2 = int(rng.integers(60, 85))
        start = int(rng.integers(2 * G, len(ref_codes) - L - 4 * G))
        # build in output (read) coords: i < s1 -> ref[start+i];
        # s1..s1+h1 inserted; then ref shifted g1; s2..s2+h2 inserted;
        # then ref shifted g1+g2
        seq = np.empty(L, np.uint8)
        for j in range(L):
            if j < s1:
                seq[j] = ref_codes[start + j]
            elif g1 < 0 and j < s1 - g1:
                seq[j] = int(rng.integers(0, 4))
            elif j < s2:
                seq[j] = ref_codes[start + j + g1]
            elif g2 < 0 and j < s2 - g2:
                seq[j] = int(rng.integers(0, 4))
            else:
                seq[j] = ref_codes[start + j + g1 + g2]
        if i % 3 == 0:
            seq = 3 - seq[::-1]
        txt = "".join("ACGT"[c] for c in seq)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(2, 40, L))
        recs.append(f"@idl2.{i} {i} length={L}\n{txt}\n+\n{qual}\n")
    return "".join(recs).encode()


def test_two_op_indel_tier_maps(ref_env):
    """Reads with two separated indels fail both the gapless tiers and the
    one-op rescue, but map through the greedy second-op pass (reference
    multi-op CigaL/CigaV streams); the 2-op splice is exact."""
    fa, ref_codes, rng = ref_env
    raw = _two_indel_reads(rng, ref_codes, 24)
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.blockcodec import _BASE_MAP
    blk = parse_block(raw, True)
    codes = _BASE_MAP[blk.seq_flat].copy()
    dege = codes == 255
    codes[dege] = 0
    idx = build_from_ref(load_fasta(fa), CodecParams(**SMALL))
    p1 = CodecParams(**SMALL, max_indel=3, indel_ops=1)
    res1 = Aligner(idx, p1).align(codes, dege, blk.lengths)
    p2 = CodecParams(**SMALL, max_indel=3, indel_ops=2)
    res2 = Aligner(idx, p2).align(codes, dege, blk.lengths)
    n2 = int((res2.gap_len2[res2.mapped] != 0).sum())
    assert int(res2.mapped.sum()) >= int(res1.mapped.sum()) + 8
    assert n2 >= 8                       # the second op actually fired

    # exactness: two-op spliced window + patches reconstructs the read
    off = np.cumsum(blk.lengths) - blk.lengths
    checked = 0
    for r in np.flatnonzero(res2.mapped & (res2.gap_len2 != 0)):
        L = int(blk.lengths[r])
        s1, g1 = int(res2.gap_pos[r]), int(res2.gap_len[r])
        s2, g2 = int(res2.gap_pos2[r]), int(res2.gap_len2[r])
        pos = int(res2.pos[r])
        i = np.arange(L)
        widx = (pos + i + np.where(i >= s1, g1, 0)
                + np.where(i >= s2, g2, 0))
        win = ref_codes[np.clip(widx, 0, len(ref_codes) - 1)].copy()
        win[((g1 < 0) & (i >= s1) & (i < s1 - g1))
            | ((g2 < 0) & (i >= s2) & (i < s2 - g2))] = 0
        mm = res2.mis_mask[r, :L]
        read = codes[off[r]:off[r] + L]
        eff = (3 - read[::-1]) if res2.is_rev[r] else read
        win[mm] = eff[mm]
        out = (3 - win[::-1]) if res2.is_rev[r] else win
        assert np.array_equal(out, read), f"read {r} 2-op splice mismatch"
        checked += 1
    assert checked >= 8


def test_two_op_aligned_se_roundtrip(ref_env, tmp_path):
    """End-to-end: a two-indel FASTQ rides the ACG2* streams, round-trips
    bit-exact, and the aligned archive beats the entropy-only one."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress
    fa, ref_codes, rng = ref_env
    raw = (_two_indel_reads(rng, ref_codes, 40)
           + _mk_fastq_from_ref(rng, ref_codes, 40))
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p = CodecParams(**SMALL, max_indel=3, indel_ops=2)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    assert stats["mapped"] >= 70
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw
    pe = CodecParams(**SMALL)
    plain = str(tmp_path / "plain.fqz")
    compress_se(pe, str(src), plain)
    import os as _os
    assert _os.path.getsize(arc) < _os.path.getsize(plain)


def test_indel_aligned_se_roundtrip(ref_env, tmp_path):
    """End-to-end: an indel-bearing FASTQ round-trips bit-exact through
    the aligned pipeline with the cigar streams, and maps enough to beat
    the entropy-only fallback gate."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw_i, _ = _indel_reads(rng, ref_codes, 40)
    raw_g = _mk_fastq_from_ref(rng, ref_codes, 40)
    raw = raw_i + raw_g
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p = CodecParams(**SMALL, max_indel=3)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    assert stats["mapped"] >= 60
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw


def test_indel_aligned_pe_roundtrip(ref_env, tmp_path):
    """PE + -q indels: merged mate blocks ride the same cigar streams."""
    from fastqueeze_tpu.pipeline.aligned import compress_pe_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw1, _ = _indel_reads(rng, ref_codes, 30)
    raw2 = _mk_fastq_from_ref(rng, ref_codes, 30)
    (tmp_path / "in1.fq").write_bytes(raw1)
    (tmp_path / "in2.fq").write_bytes(raw2)
    p = CodecParams(**SMALL, max_indel=3)
    arc = str(tmp_path / "out.fqz")
    stats = compress_pe_aligned(p, fa, str(tmp_path / "in1.fq"),
                                str(tmp_path / "in2.fq"), arc)
    assert stats["mapped"] >= 45
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw1
    assert open(outs[1], "rb").read() == raw2


def test_aligned_frozen_roundtrip(ref_env, tmp_path):
    """Aligned + frozen-model (usemodel) combined: mapped-read streams and
    the frozen qual/seq tables in one archive.  Production hits this on
    inputs past the usemodel gate; forced here on the small fixture."""
    from fastqueeze_tpu.pipeline.aligned import (compress_pe_aligned,
                                                 compress_se_aligned)
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw = _mk_fastq_from_ref(rng, ref_codes, 80)
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p = CodecParams(**SMALL, use_model=1)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    assert stats["mapped"] >= 60
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw

    raw2 = _mk_fastq_from_ref(rng, ref_codes, 80)
    (tmp_path / "in2.fq").write_bytes(raw2)
    arc2 = str(tmp_path / "pe.fqz")
    p2 = CodecParams(**SMALL, use_model=1)
    compress_pe_aligned(p2, fa, str(src), str(tmp_path / "in2.fq"), arc2)
    outs = decompress(arc2, str(tmp_path / "peb"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw
    assert open(outs[1], "rb").read() == raw2


def test_indel_with_overlong_read_roundtrip(ref_env, tmp_path):
    """A block mixing indel reads with one read longer than align_max_len
    takes the long-read fallback inside Aligner.align(); the recursive
    result must keep the gap streams (a dropped gap_len codes indel reads
    as gapless with spliced-coords masks -> MD5 mismatch on decode)."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw_i, _ = _indel_reads(rng, ref_codes, 40)
    long_seq = "".join(rng.choice(list("ACGT"), 700))
    long_q = "".join(chr(33 + int(q)) for q in rng.integers(2, 40, 700))
    raw = raw_i + f"@long.0\n{long_seq}\n+\n{long_q}\n".encode()
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p = CodecParams(**SMALL, max_indel=3)
    p.align_max_len = 512            # force the fallback split
    arc = str(tmp_path / "out.fqz")
    stats = compress_se_aligned(p, fa, str(src), arc)
    assert stats["mapped"] >= 30     # indel reads still map via rescue
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw


def test_wide_indel_gap_width(ref_env, tmp_path):
    """max_indel > 127 needs 2-byte zigzag gap coding (1 byte silently
    truncated it); archives round-trip either way."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    fa, ref_codes, rng = ref_env
    raw_i, _ = _indel_reads(rng, ref_codes, 30)
    src = tmp_path / "in.fq"
    src.write_bytes(raw_i)
    p = CodecParams(**SMALL, max_indel=200)
    arc = str(tmp_path / "out.fqz")
    compress_se_aligned(p, fa, str(src), arc)
    outs = decompress(arc, str(tmp_path / "back"), ref=fa, force=True)
    assert open(outs[0], "rb").read() == raw_i
