"""Reference-aligned compression pipelines (SE and PE).

Capability parity with the reference's aligned encode path (SURVEY.md C7
AlignEncodeSEJob/AlignEncodePEJob: per-block doAlign -> AlignInfoProcess ->
doAlignEncode) and the per-block aligned/fqz-only decision ("Only Fqzcomp
will be called if no index given or align ratio too low" — binary help;
debug line `Total block:N Align block:A Fqz block:F`).

The aligner itself is the batched device kernel in align/hash.py; this
module owns the per-block orchestration: parse -> align -> encode with
alignment streams, falling back to entropy-only when the block's mapping
ratio is below ``min_map_ratio``.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

from fastqueeze_tpu.align.hash import Aligner, AlignResult
from fastqueeze_tpu.align.index import load_index
from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.arcfile import (
    FLAG_ALIGNED, FLAG_PE, ArcWriter, BlockInfo)
from fastqueeze_tpu.container.encap import write_tlv
from fastqueeze_tpu.io.fastq import FastqBlock, parse_block, read_blocks
from fastqueeze_tpu.pipeline.blockcodec import _BASE_MAP, encode_block
from fastqueeze_tpu.utils.metrics import DebugInfo


def _read_codes(block: FastqBlock) -> Tuple[np.ndarray, np.ndarray]:
    codes = _BASE_MAP[block.seq_flat]
    dege = codes == 255
    return np.where(dege, 0, codes).astype(np.uint8), dege


def align_block(aligner: Aligner, block: FastqBlock,
                dup_src: Optional[np.ndarray] = None) -> AlignResult:
    """Align a block's reads.  With dup_src (the duplicate tier's
    first-occurrence back-references), only unique reads run the aligner;
    each duplicate inherits its source's result.  The aligner is
    content-deterministic per read, so this IS what aligning the
    duplicates would produce — archives are byte-identical — but on
    repeat-heavy data (the bundled telomeric pair is 52% exact seq
    duplicates) it halves the aligner's work.  encode_block's dedup
    masking then keeps duplicates out of the alignment streams anyway."""
    codes, dege = _read_codes(block)
    if dup_src is None:
        res = aligner.align(codes, dege, block.lengths)
        return res._replace(chunks=_chunk_align(aligner, block, codes,
                                                dege))
    sdup = dup_src >= 0
    keep_read_lr = ~sdup
    keep = ~sdup
    sym_keep = np.repeat(keep, block.lengths)
    sub = aligner.align(codes[sym_keep], dege[sym_keep],
                        block.lengths[keep])
    R = block.n_reads
    lp = sub.mis_mask.shape[1]
    mapped = np.zeros(R, bool)
    pos = np.zeros(R, np.int64)
    rev = np.zeros(R, bool)
    mm = np.zeros((R, lp), bool)
    gp = gl = gp2 = gl2 = None
    rows = np.flatnonzero(keep)
    mapped[rows] = sub.mapped
    pos[rows] = sub.pos
    rev[rows] = sub.is_rev
    mm[rows] = sub.mis_mask
    if sub.gap_pos is not None:
        gp = np.zeros(R, np.int32)
        gl = np.zeros(R, np.int32)
        gp[rows] = sub.gap_pos
        gl[rows] = sub.gap_len
        if sub.gap_pos2 is not None:
            gp2 = np.zeros(R, np.int32)
            gl2 = np.zeros(R, np.int32)
            gp2[rows] = sub.gap_pos2
            gl2[rows] = sub.gap_len2
    d = np.flatnonzero(sdup)
    src = dup_src[d]                 # first occurrences: always in `rows`
    mapped[d] = mapped[src]
    pos[d] = pos[src]
    rev[d] = rev[src]
    mm[d] = mm[src]
    if gp is not None:
        gp[d] = gp[src]
        gl[d] = gl[src]
    if gp2 is not None:
        gp2[d] = gp2[src]
        gl2[d] = gl2[src]
    return AlignResult(mapped, pos, rev, mm, gp, gl, gp2, gl2,
                       chunks=_chunk_align(aligner, block, codes, dege,
                                           keep_read=keep_read_lr))


def _chunk_align(aligner: Aligner, block: FastqBlock, codes: np.ndarray,
                 dege: np.ndarray, keep_read=None):
    """Long-read tier (no reference equivalent): anchor-map reads >
    align_max_len in longread_chunk-sized pieces through the ordinary
    aligner (gap-free: a chunk an indel straddles simply stays in the
    residual entropy stream).  Grid = blockcodec._lr_grid, derived from
    lengths + params on both sides (zero structure bytes)."""
    p = aligner.params
    cap = p.align_max_len
    C = min(p.longread_chunk, cap)
    if not C or not len(block.lengths) or int(block.lengths.max()) <= cap:
        return None
    from fastqueeze_tpu.align.hash import AlignResult, _intra
    from fastqueeze_tpu.pipeline.blockcodec import _lr_grid
    reads, offs, clens = _lr_grid(block.lengths, cap, C,
                                  p.longread_tail_min)
    if not len(reads):
        return None
    # duplicate long reads restore by copy — their chunks carry no
    # streams, so skip their (expensive) chunk alignment entirely
    sel = (np.ones(len(reads), bool) if keep_read is None
           else keep_read[reads])
    starts = np.cumsum(block.lengths) - block.lengths
    if sel.all():
        idx = np.repeat(starts[reads] + offs, clens) + _intra(clens)
        sub = aligner.align(codes[idx], dege[idx], clens,
                            allow_indel=p.longread_indel > 0,
                            max_indel=p.longread_indel)
        return (reads, offs, clens, sub)
    ks = np.flatnonzero(sel)
    Cn = len(reads)
    lp = 0
    if len(ks):
        idx = (np.repeat(starts[reads[ks]] + offs[ks], clens[ks])
               + _intra(clens[ks]))
        s = aligner.align(codes[idx], dege[idx], clens[ks],
                          allow_indel=p.longread_indel > 0,
                          max_indel=p.longread_indel)
        lp = s.mis_mask.shape[1]
    mapped = np.zeros(Cn, bool)
    pos = np.zeros(Cn, np.int64)
    rev = np.zeros(Cn, bool)
    mm = np.zeros((Cn, max(lp, 16)), bool)
    gp = gl = gp2 = gl2 = None
    if len(ks):
        mapped[ks] = s.mapped
        pos[ks] = s.pos
        rev[ks] = s.is_rev
        mm[ks, :lp] = s.mis_mask
        if s.gap_pos is not None:
            gp = np.zeros(Cn, np.int32)
            gl = np.zeros(Cn, np.int32)
            gp2 = np.zeros(Cn, np.int32)
            gl2 = np.zeros(Cn, np.int32)
            gp[ks] = s.gap_pos
            gl[ks] = s.gap_len
            gp2[ks] = s.gap_pos2
            gl2[ks] = s.gap_len2
    sub = AlignResult(mapped, pos, rev, mm, gp, gl, gp2, gl2)
    return (reads, offs, clens, sub)


def _maybe_align(p: CodecParams, aligner: Aligner, block: FastqBlock,
                 dbg: DebugInfo):
    """Align the block; return (align_or_None, n_mapped).  A block whose
    mapping ratio is under min_map_ratio is coded entropy-only (the
    reference's per-block Align/Fqz decision)."""
    t0 = time.time()
    dup_src = None
    if p.dedup and block.n_reads > 1:
        from fastqueeze_tpu.pipeline.blockcodec import dup_masks
        dup_src, _ = dup_masks(block)
    res = align_block(aligner, block, dup_src)
    dbg.add("align_s", time.time() - t0)
    n_mapped = int(res.mapped.sum())
    frac = n_mapped / block.n_reads if block.n_reads else 0.0
    if res.chunks is not None and res.chunks[3].mapped.any():
        # long-read blocks: gate on BASE coverage (a block of only long
        # reads has zero read-level mappings but may be almost fully
        # chunk-covered)
        ch = res.chunks
        mapped_b = (int(block.lengths[res.mapped].sum())
                    + int(ch[2][ch[3].mapped].sum()))
        frac = max(frac, mapped_b / max(int(block.lengths.sum()), 1))
        dbg.add("lr_chunks_mapped", int(ch[3].mapped.sum()))
    if block.n_reads and frac < p.min_map_ratio:
        dbg.add("fqz_blocks", 1)
        return None, 0
    dbg.add("align_blocks", 1)
    dbg.add("mapped_reads", n_mapped)
    return res, n_mapped


# (path, mtime, size, seed_len, shm) -> (Aligner, RefSeq).  The reference
# binary amortizes its index with POSIX shm staging (`-s`, SURVEY.md §2.2);
# in-process the same role is played by this cache: repeated compress/
# decompress calls (servers, benchmarks, the multi-file driver) skip the
# FASTA re-parse, index load and device re-upload.  Aligner.params is
# re-stamped per call — alignment policy knobs are read at align() time.
_REF_CACHE: Dict = {}
_REF_CACHE_MAX = 4


def prepare_ref(p: CodecParams, ref_path: str):
    """Load (or rebuild) the index, stamp ref identity into the params."""
    try:
        st = os.stat(ref_path)
        key = (os.path.abspath(ref_path), st.st_mtime_ns, st.st_size,
               p.seed_len, p.shm_index)
    except OSError:
        key = None
    hit = _REF_CACHE.get(key) if key is not None else None
    if hit is None:
        idx, ref = load_index(ref_path, p)
        from fastqueeze_tpu.align import sharded
        if (idx.n_positions >= sharded.SHARD_MIN_POSITIONS
                or idx.ref_len >= sharded.SHARD_MIN_POSITIONS):
            # human-scale references (> int32 positions): index sharded
            # over the mesh's devices (SURVEY.md §2.3 north star)
            aligner = sharded.ShardedAligner(idx, p)
        else:
            aligner = Aligner(idx, p)
        if key is not None:
            if len(_REF_CACHE) >= _REF_CACHE_MAX:
                _REF_CACHE.pop(next(iter(_REF_CACHE)))
            _REF_CACHE[key] = (aligner, ref)
    else:
        aligner, ref = hit
        aligner.params = p
    p.aligned = 1
    p.ref_md5 = ref.md5
    p.ref_len = ref.length
    p.seed_len = aligner.k
    return aligner, ref


def compress_se_aligned(p: CodecParams, ref_path: str, in_path: str,
                        out_path: str,
                        dbg: Optional[DebugInfo] = None,
                        part: Optional[tuple] = None) -> Dict:
    dbg = dbg or DebugInfo()
    from fastqueeze_tpu.ops.engine import new_input_epoch
    new_input_epoch()      # speculative-fetch estimates are per-input
    aligner, ref = prepare_ref(p, ref_path)
    block_size = p.block_bytes or p.block_size_mb * (1 << 20)
    whole_md5 = hashlib.md5()
    writer = ArcWriter(out_path, p, [os.path.basename(in_path)], [],
                       part=part)
    frozen = None
    from fastqueeze_tpu.pipeline.frozen import decide_use_model
    if decide_use_model(p, os.path.getsize(in_path)):
        from fastqueeze_tpu.pipeline.driver import train_frozen_prefix
        frozen, blob = train_frozen_prefix(p, in_path, dbg)
        writer.set_model(blob)
    idx = 0
    total_raw = 0
    total_mapped = total_reads = 0

    part_k, part_n = part if part else (0, 1)

    def my_items():
        # --part K:N round-robin ownership; see driver.compress_se
        # (single-part runs defer parse/lossy to the workers)
        for gi, (raw, final_nl) in enumerate(read_blocks(in_path,
                                                         block_size)):
            if part_n > 1:
                block = None
                if p.lossy_factor > 1.0:
                    from fastqueeze_tpu.pipeline.driver import apply_lossy
                    block = parse_block(raw, final_nl)
                    raw, block = apply_lossy(p, block)
                whole_md5.update(raw)
                if gi % part_n == part_k:
                    yield gi, (raw, final_nl, block)
            else:
                yield gi, (raw, final_nl, None)

    def work(_i, gi_item):
        gi, (raw, final_nl, block) = gi_item
        if block is None:
            block = parse_block(raw, final_nl)
            if part_n == 1 and p.lossy_factor > 1.0:
                from fastqueeze_tpu.pipeline.driver import apply_lossy
                raw, block = apply_lossy(p, block)
        align, n_mapped = _maybe_align(p, aligner, block, dbg)
        t0 = time.time()
        payload = encode_block(p, block, frozen=frozen, align=align,
                               ref_codes=ref.codes, dbg=dbg)
        dbg.add("encode_s", time.time() - t0)
        return gi, raw, payload, block.n_reads, n_mapped, align is not None

    from fastqueeze_tpu.pipeline.parallel_host import (
        block_dp_devices, device_parallel)
    devices = block_dp_devices(p)
    for _i, (gi, raw, payload, n_reads, n_mapped, was_aligned) in \
            device_parallel(my_items(), work, devices, p.threads):
        if part_n == 1:            # ordered: blocks arrive in file order
            whole_md5.update(raw)
        writer.add_block(gi, payload, BlockInfo(
            payload_len=len(payload), n_reads=n_reads, raw_len1=len(raw),
            flags=FLAG_ALIGNED if was_aligned else 0,
            md5=hashlib.md5(raw).digest()))
        total_mapped += n_mapped
        total_reads += n_reads
        total_raw += len(raw)
        idx += 1
    writer.input_md5s = [whole_md5.digest()]
    writer.finalize()
    out_size = os.path.getsize(out_path)
    dbg.add("raw_bytes", total_raw)
    dbg.add("out_bytes", out_size)
    return {"blocks": idx, "raw": total_raw, "compressed": out_size,
            "ratio": total_raw / out_size if out_size else 0.0,
            "mapped": total_mapped, "reads": total_reads}


def compress_pe_aligned(p: CodecParams, ref_path: str, in1: str, in2: str,
                        out_path: str,
                        dbg: Optional[DebugInfo] = None,
                        part: Optional[tuple] = None) -> Dict:
    """PE aligned: mates interleaved into one block (pair order), every read
    aligned; pair relations (both-map / 1Y2N / 1N2Y / none, reference
    compressPERelation) fall out of the per-read map flags; insert sizes are
    tallied for the stats table (CaclInsertSize parity)."""
    from fastqueeze_tpu.pipeline.pe import (
        TAG_PE_META, TAG_PE_BODY, _RecordReader, interleave_blocks)
    dbg = dbg or DebugInfo()
    from fastqueeze_tpu.ops.engine import new_input_epoch
    new_input_epoch()      # speculative-fetch estimates are per-input
    aligner, ref = prepare_ref(p, ref_path)
    p.is_pe = 1
    block_size = p.block_bytes or p.block_size_mb * (1 << 20)
    md5_1, md5_2 = hashlib.md5(), hashlib.md5()
    writer = ArcWriter(out_path, p,
                       [os.path.basename(in1), os.path.basename(in2)], [],
                       part=part)
    frozen = None
    from fastqueeze_tpu.pipeline.frozen import decide_use_model
    if decide_use_model(p, os.path.getsize(in1) + os.path.getsize(in2)):
        from fastqueeze_tpu.pipeline.pe import train_frozen_pe_prefix
        frozen, blob = train_frozen_pe_prefix(p, in1, in2)
        writer.set_model(blob)
    rr2 = _RecordReader(in2)
    idx = 0
    total_raw = 0
    total_mapped = total_reads = 0
    part_k, part_n = part if part else (0, 1)

    def items():
        # --part K:N round-robin ownership; see driver.compress_se
        # (single-part runs defer parse/lossy to the workers)
        gi = 0
        for raw1, fnl1 in read_blocks(in1, block_size // 2):
            n1 = (raw1.count(b"\n") + (0 if fnl1 else 1)) // 4
            raw2, fnl2 = rr2.take(n1)
            b1 = b2 = None
            if part_n > 1:
                if p.lossy_factor > 1.0:
                    from fastqueeze_tpu.pipeline.driver import apply_lossy
                    b1 = parse_block(raw1, fnl1)
                    b2 = parse_block(raw2, fnl2)
                    raw1, b1 = apply_lossy(p, b1)
                    raw2, b2 = apply_lossy(p, b2)
                md5_1.update(raw1)
                md5_2.update(raw2)
                if gi % part_n == part_k:
                    yield gi, (raw1, fnl1, raw2, fnl2, b1, b2)
            else:
                yield gi, (raw1, fnl1, raw2, fnl2, b1, b2)
            gi += 1

    def work(_i, gi_item):
        gi, (raw1, fnl1, raw2, fnl2, b1, b2) = gi_item
        if b1 is None:
            b1 = parse_block(raw1, fnl1)
            b2 = parse_block(raw2, fnl2)
            if part_n == 1 and p.lossy_factor > 1.0:
                from fastqueeze_tpu.pipeline.driver import apply_lossy
                raw1, b1 = apply_lossy(p, b1)
                raw2, b2 = apply_lossy(p, b2)
        merged = interleave_blocks(b1, b2)
        align, n_mapped = _maybe_align(p, aligner, merged, dbg)
        if align is not None and p.max_insr > 0:
            # consistent-pairing rescue within the insert window
            codes, dege = _read_codes(merged)
            before = int(align.mapped.sum())
            align = aligner.rescue_mates(codes, dege, merged.lengths,
                                         align, p.max_insr)
            n_mapped = int(align.mapped.sum())
            dbg.add("pe_rescued", n_mapped - before)
        if align is not None:
            _tally_pe_relations(align, dbg)
        t0 = time.time()
        body = encode_block(p, merged, frozen=frozen, align=align,
                            ref_codes=ref.codes, dbg=dbg)
        dbg.add("encode_s", time.time() - t0)
        meta = {"fnl1": b1.final_newline, "fnl2": b2.final_newline}
        payload = (write_tlv(TAG_PE_META, json.dumps(meta).encode())
                   + write_tlv(TAG_PE_BODY, body))
        return (gi, raw1, raw2, payload, b1.n_reads, merged.n_reads,
                n_mapped, align is not None)

    from fastqueeze_tpu.pipeline.parallel_host import (
        block_dp_devices, device_parallel)
    devices = block_dp_devices(p)
    for _i, (gi, raw1, raw2, payload, n_pairs, n_merged, n_mapped,
             was_aligned) in device_parallel(items(), work, devices,
                                             p.threads):
        if part_n == 1:            # ordered: pairs arrive in file order
            md5_1.update(raw1)
            md5_2.update(raw2)
        flags = FLAG_PE | (FLAG_ALIGNED if was_aligned else 0)
        writer.add_block(gi, payload, BlockInfo(
            payload_len=len(payload), n_reads=n_pairs,
            raw_len1=len(raw1), raw_len2=len(raw2), flags=flags,
            md5=hashlib.md5(raw1 + raw2).digest()))
        total_mapped += n_mapped
        total_reads += n_merged
        total_raw += len(raw1) + len(raw2)
        idx += 1
    if rr2.take_rest():
        raise ValueError("PE inputs have different read counts")
    writer.input_md5s = [md5_1.digest(), md5_2.digest()]
    writer.finalize()
    out_size = os.path.getsize(out_path)
    return {"blocks": idx, "raw": total_raw, "compressed": out_size,
            "ratio": total_raw / out_size if out_size else 0.0,
            "mapped": total_mapped, "reads": total_reads}


def _tally_pe_relations(align: AlignResult, dbg: DebugInfo) -> None:
    """Pair-relation histogram (reference stats: both-map, 1Y2N, 1N2Y) and
    modal insert size over both-mapped pairs."""
    m1, m2 = align.mapped[0::2], align.mapped[1::2]
    dbg.add("pe_both_map", int((m1 & m2).sum()))
    dbg.add("pe_1Y2N", int((m1 & ~m2).sum()))
    dbg.add("pe_1N2Y", int((~m1 & m2).sum()))
    dbg.add("pe_none", int((~m1 & ~m2).sum()))
    both = m1 & m2
    if both.any():
        ins = np.abs(align.pos[0::2][both] - align.pos[1::2][both])
        dbg.add("pe_insert_median", float(np.median(ins)))
