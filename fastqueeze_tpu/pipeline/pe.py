"""Paired-end compression pipeline.

Capability parity with the reference's PE path (SURVEY.md C5 doReadPEJob,
C7 AlignEncodePEJob, C8 analysisPEType, C17 DecodePEJob): both mates of a
pair live in the same block; sequence/quality/length streams interleave the
mates (pair order r1_0, r2_0, r1_1, r2_1, ...) so one adaptive model serves
both files; IDs are binned per file, with a SAME flag when file-2 IDs equal
file-1's (the common case, detected like the reference's petype analysis).

Decode writes ``<prefix>_1.fastq`` / ``<prefix>_2.fastq`` (matching the
reference's observed naming, SURVEY.md §8) or pipes per -P 1/2/3.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.arcfile import (
    FLAG_PE, ArcReader, ArcWriter, BlockInfo)
from fastqueeze_tpu.container.encap import iter_tlv, write_tlv
from fastqueeze_tpu.io.fastq import (
    FastqBlock, assemble_block, open_maybe_gz, parse_block)
from fastqueeze_tpu.pipeline.blockcodec import decode_block, encode_block
from fastqueeze_tpu.utils.metrics import DebugInfo

TAG_PE_META = 40
TAG_PE_BODY = 41
TAG_PE_IDS2 = 42
TAG_PE_PLUS2 = 43


def interleave_blocks(b1: FastqBlock, b2: FastqBlock) -> FastqBlock:
    """Merge mate blocks into pair-interleaved SoA (r1_0, r2_0, r1_1, ...)."""
    if b1.n_reads != b2.n_reads:
        raise ValueError(
            f"PE inputs disagree: {b1.n_reads} vs {b2.n_reads} reads in block")
    R = b1.n_reads
    lengths = np.empty(2 * R, np.int64)
    lengths[0::2] = b1.lengths
    lengths[1::2] = b2.lengths
    seq = _interleave_flat(b1.seq_flat, b1.lengths, b2.seq_flat, b2.lengths)
    qual = _interleave_flat(b1.qual_flat, b1.lengths, b2.qual_flat, b2.lengths)
    ids = _interleave_lines(b1.ids, b2.ids)
    plus = _interleave_lines(b1.plus, b2.plus)
    return FastqBlock(n_reads=2 * R, ids=ids, plus=plus, seq_flat=seq,
                      qual_flat=qual, lengths=lengths,
                      raw_len=b1.raw_len + b2.raw_len,
                      final_newline=b1.final_newline and b2.final_newline)


def deinterleave_block(blk: FastqBlock, fnl1: bool, fnl2: bool
                       ) -> Tuple[FastqBlock, FastqBlock]:
    R = blk.n_reads // 2
    l1, l2 = blk.lengths[0::2], blk.lengths[1::2]
    s1, s2 = _deinterleave_flat(blk.seq_flat, l1, l2)
    q1, q2 = _deinterleave_flat(blk.qual_flat, l1, l2)
    b1 = FastqBlock(R, blk.ids[0::2], blk.plus[0::2], s1, q1, l1, 0, fnl1)
    b2 = FastqBlock(R, blk.ids[1::2], blk.plus[1::2], s2, q2, l2, 0, fnl2)
    return b1, b2


def _interleave_lines(a, b):
    """Pair-interleave two line collections.  LazyLines inputs stay lazy
    (one flat copy, no per-line bytes objects — the ID binner consumes
    the concatenated form directly)."""
    from fastqueeze_tpu.io.fastq import LazyLines
    if isinstance(a, LazyLines) and isinstance(b, LazyLines):
        la = np.diff(a.offs)
        lb = np.diff(b.offs)
        R = len(la)
        lens = np.empty(2 * R, np.int64)
        lens[0::2] = la
        lens[1::2] = lb
        offs = np.zeros(2 * R + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        cat = _interleave_flat(np.frombuffer(a.cat, np.uint8), la,
                               np.frombuffer(b.cat, np.uint8), lb)
        return LazyLines(cat.tobytes(), offs)
    return [x for pair in zip(a, b) for x in pair]


def _interleave_flat(f1, l1, f2, l2):
    R = len(l1)
    lens = np.empty(2 * R, np.int64)
    lens[0::2] = l1
    lens[1::2] = l2
    out = np.empty(len(f1) + len(f2), np.uint8)
    off = np.cumsum(lens) - lens
    _place(out, off[0::2], l1, f1)
    _place(out, off[1::2], l2, f2)
    return out


def _deinterleave_flat(flat, l1, l2):
    R = len(l1)
    lens = np.empty(2 * R, np.int64)
    lens[0::2] = l1
    lens[1::2] = l2
    off = np.cumsum(lens) - lens
    return _gather(flat, off[0::2], l1), _gather(flat, off[1::2], l2)


def _idx(starts, lens):
    total = int(lens.sum())
    return (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
            + np.repeat(starts, lens))


def _place(out, starts, lens, flat):
    if int(lens.sum()):
        out[_idx(starts, lens)] = flat


def _gather(flat, starts, lens):
    if not int(lens.sum()):
        return np.zeros(0, np.uint8)
    return flat[_idx(starts, lens)]


def compress_pe(p: CodecParams, in1: str, in2: str, out_path: str,
                ref: Optional[str] = None,
                dbg: Optional[DebugInfo] = None,
                part: Optional[tuple] = None) -> Dict:
    from fastqueeze_tpu.io.fastq import read_blocks
    dbg = dbg or DebugInfo()
    if ref:
        from fastqueeze_tpu.pipeline.aligned import compress_pe_aligned
        return compress_pe_aligned(p, ref, in1, in2, out_path, dbg=dbg,
                                   part=part)
    from fastqueeze_tpu.ops.engine import new_input_epoch
    new_input_epoch()      # speculative-fetch estimates are per-input
    p.is_pe = 1
    block_size = p.block_bytes or p.block_size_mb * (1 << 20)
    md5_1, md5_2 = hashlib.md5(), hashlib.md5()
    writer = ArcWriter(out_path, p,
                       [os.path.basename(in1), os.path.basename(in2)], [],
                       part=part)
    frozen = None
    from fastqueeze_tpu.pipeline.frozen import decide_use_model
    if decide_use_model(p, os.path.getsize(in1) + os.path.getsize(in2)):
        frozen, blob = train_frozen_pe_prefix(p, in1, in2)
        writer.set_model(blob)
    idx = 0
    total_raw = 0

    # file2 is consumed with the same record counts as file1's blocks
    f2_iter_state = _RecordReader(in2)

    def raw_items():
        for raw1, fnl1 in read_blocks(in1, block_size // 2):
            n1 = (raw1.count(b"\n") + (0 if fnl1 else 1)) // 4
            raw2, fnl2 = f2_iter_state.take(n1)
            yield raw1, fnl1, raw2, fnl2

    it = raw_items()
    first = None
    first_parsed = None
    if p.self_align == -1:
        # auto (-S default): decide once per file from the first block
        # pair, before the threaded loop (-t/--mesh invariance)
        from fastqueeze_tpu.pipeline.selfref import auto_self_align
        first = next(it, None)
        sa = 0
        if first is not None:
            pb1 = parse_block(first[0], first[1])
            pb2 = parse_block(first[2], first[3])
            sa = 1 if auto_self_align(p, interleave_blocks(pb1, pb2),
                                      dbg) else 0
            first_parsed = (pb1, pb2)   # encode loop reuses the parse
        p.self_align = sa

    def items():
        if first is not None:
            yield first
        yield from it

    part_k, part_n = part if part else (0, 1)

    def my_items():
        # --part K:N round-robin ownership; every block pair is still
        # scanned (and lossy-transformed) in file order so each part
        # computes identical whole-input MD5s (see driver.compress_se).
        # Single-part runs defer parse/lossy to the workers and update
        # MD5s in the ordered consumer (threaded-lossy parallelism).
        for gi, (raw1, fnl1, raw2, fnl2) in enumerate(items()):
            b1 = b2 = None
            if gi == 0 and first_parsed is not None:
                b1, b2 = first_parsed
            if part_n > 1:
                if p.lossy_factor > 1.0:
                    from fastqueeze_tpu.pipeline.driver import apply_lossy
                    if b1 is None:
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
        align = rc = None
        if p.self_align:
            from fastqueeze_tpu.pipeline.selfref import maybe_align_self
            align, rc = maybe_align_self(p, merged, dbg)
        t0 = time.time()
        payload = _encode_pe_block(p, merged, b1, b2, frozen=frozen,
                                   align=align, ref_codes=rc)
        dbg.add("encode_s", time.time() - t0)
        return gi, raw1, raw2, payload, b1.n_reads

    from fastqueeze_tpu.pipeline.parallel_host import (
        block_dp_devices, device_parallel)
    devices = block_dp_devices(p)
    for _i, (gi, raw1, raw2, payload, n_reads) in device_parallel(
            my_items(), work, devices, p.threads):
        if part_n == 1:            # ordered: pairs arrive in file order
            md5_1.update(raw1)
            md5_2.update(raw2)
        info = BlockInfo(payload_len=len(payload), n_reads=n_reads,
                         raw_len1=len(raw1), raw_len2=len(raw2),
                         flags=FLAG_PE,
                         md5=hashlib.md5(raw1 + raw2).digest())
        writer.add_block(gi, payload, info)
        total_raw += len(raw1) + len(raw2)
        idx += 1
    if f2_iter_state.take_rest():
        raise ValueError("PE inputs have different read counts")
    writer.input_md5s = [md5_1.digest(), md5_2.digest()]
    writer.finalize()
    out_size = os.path.getsize(out_path)
    return {"blocks": idx, "raw": total_raw, "compressed": out_size,
            "ratio": total_raw / out_size if out_size else 0.0}


class _RecordReader:
    """Sequential exact-record-count reader over a (possibly gz) FASTQ."""

    def __init__(self, path: str):
        self._fh, _ = open_maybe_gz(path)
        self._carry = b""
        self._eof = False

    def take(self, n_records: int) -> Tuple[bytes, bool]:
        need = 4 * n_records
        have = self._carry.count(b"\n")
        chunks = [self._carry]
        while have < need and not self._eof:
            data = self._fh.read(1 << 20)
            if not data:
                self._eof = True
                break
            chunks.append(data)
            have += data.count(b"\n")
        buf = b"".join(chunks)
        if have < need:
            # allow a final record without trailing newline
            if have == need - 1 and buf and not buf.endswith(b"\n"):
                self._carry = b""
                return buf, False
            raise ValueError("PE file 2 ran out of records")
        pos = -1
        for _ in range(need):
            pos = buf.index(b"\n", pos + 1)
        self._carry = buf[pos + 1:]
        return buf[:pos + 1], True

    def take_rest(self) -> bytes:
        rest = self._carry + self._fh.read()
        self._fh.close()
        return rest


def train_frozen_pe_prefix(p: CodecParams, in1: str, in2: str):
    """usemodel preprocess over the pair: train on the interleaved prefix,
    exactly the stream shape the per-block coder sees."""
    from fastqueeze_tpu.io.fastq import read_blocks
    from fastqueeze_tpu.pipeline.frozen import serialize_frozen, train_frozen
    half = (p.model_train_mb << 20) // 2
    b1 = parse_block(*next(iter(read_blocks(in1, half))))
    rr2 = _RecordReader(in2)
    b2 = parse_block(*rr2.take(b1.n_reads))
    rr2.take_rest()
    if p.lossy_factor > 1.0:
        from fastqueeze_tpu.pipeline.driver import apply_lossy
        _, b1 = apply_lossy(p, b1)
        _, b2 = apply_lossy(p, b2)
    merged = interleave_blocks(b1, b2)
    prefix_syms = int(merged.lengths.sum())
    total = os.path.getsize(in1) + os.path.getsize(in2)
    est = (int(total * prefix_syms / max(b1.raw_len + b2.raw_len, 1))
           if (b1.raw_len and b2.raw_len) else prefix_syms)
    if p.dedup:
        from fastqueeze_tpu.pipeline.blockcodec import dedup_training_block
        merged, frac = dedup_training_block(merged, p)
        est = int(est * frac)
    frozen = train_frozen(p, merged, est_total_syms=est)
    return frozen, serialize_frozen(frozen)


def _encode_pe_block(p: CodecParams, merged: FastqBlock,
                     b1: FastqBlock, b2: FastqBlock,
                     frozen=None, align=None, ref_codes=None) -> bytes:
    """PE block = shared-model body over interleaved mates.

    The body coder sees the interleaved block; IDs of both mates are inside
    it (alternating), which the ID binner handles naturally (alternating
    fields become step-0/step-1 sequences or VAR columns).  A petype
    fast-path: when ids2 == ids1 and plus2 == plus1 elementwise, the body's
    alternating IDs already collapse; nothing extra is stored.
    """
    meta = {"fnl1": b1.final_newline, "fnl2": b2.final_newline}
    body = encode_block(p, merged, frozen=frozen, align=align,
                        ref_codes=ref_codes, self_ref=align is not None)
    return (write_tlv(TAG_PE_META, json.dumps(meta).encode())
            + write_tlv(TAG_PE_BODY, body))


def decode_pe_payload(p: CodecParams, payload: bytes, frozen, ref_codes,
                      expected_md5: bytes, block_idx: int):
    """Decode + verify one PE block payload (PE_META wrapper, interleaved
    body, md5 over raw1+raw2).  Shared by the streaming decoder and the
    random-access extractor so the layout lives in one place."""
    sections = dict(iter_tlv(payload))
    meta = json.loads(sections[TAG_PE_META].decode())
    merged = decode_block(p, sections[TAG_PE_BODY], frozen=frozen,
                          ref_codes=ref_codes)
    b1, b2 = deinterleave_block(merged, meta["fnl1"], meta["fnl2"])
    raw1, raw2 = assemble_block(b1), assemble_block(b2)
    if hashlib.md5(raw1 + raw2).digest() != expected_md5:
        raise ValueError(f"block {block_idx}: MD5 mismatch (corrupt archive)")
    return b1, b2, raw1, raw2


def decompress_pe_blocks(reader: ArcReader, out_prefix: Optional[str],
                         dbg: DebugInfo, ref: Optional[str] = None,
                         pipeout: int = 0, force: bool = False,
                         ref_codes=None, devices=None) -> List[str]:
    p = reader.params
    names = _pe_out_names(reader, out_prefix)
    md5_1, md5_2 = hashlib.md5(), hashlib.md5()
    outs: List = []
    if pipeout:
        o1 = sys.stdout.buffer if pipeout in (1, 3) else None
        o2 = sys.stdout.buffer if pipeout in (2, 3) else None
    else:
        for n in names:
            if os.path.exists(n) and not force:
                raise ValueError(f"{n} exists (use -f to overwrite)")
        o1 = open(names[0], "wb")
        o2 = open(names[1], "wb")
    def decode_one(i, payload):
        return decode_pe_payload(p, payload, _frozen_of(reader, p),
                                 ref_codes, reader.blocks[i].md5, i)

    try:
        from fastqueeze_tpu.pipeline.parallel_host import device_parallel
        payloads = (reader.read_block(i) for i in range(len(reader.blocks)))
        for i, (b1, b2, raw1, raw2) in device_parallel(
                payloads, decode_one, devices, p.threads):
            md5_1.update(raw1)
            md5_2.update(raw2)
            if pipeout == 3:
                _write_interleaved(sys.stdout.buffer, b1, b2)
            else:
                if o1 is not None:
                    o1.write(raw1)
                if o2 is not None:
                    o2.write(raw2)
        if len(reader.input_md5s) == 2 and not pipeout:
            if (md5_1.digest() != reader.input_md5s[0]
                    or md5_2.digest() != reader.input_md5s[1]):
                raise ValueError("whole-input MD5 mismatch")
    finally:
        if not pipeout:
            o1.close()
            o2.close()
    return names if not pipeout else []


def _frozen_of(reader, p):
    # cached on the reader instance: id()-keyed module globals can alias a
    # new reader after GC, and instance state needs no cross-thread locking
    if reader.model_blob is None:
        return None
    frozen = getattr(reader, "_frozen_cache", None)
    if frozen is None:
        from fastqueeze_tpu.pipeline.frozen import deserialize_frozen
        frozen = reader._frozen_cache = deserialize_frozen(reader.model_blob)
    return frozen


def _write_interleaved(out, b1: FastqBlock, b2: FastqBlock) -> None:
    offs = [np.concatenate(([0], np.cumsum(b.lengths, dtype=np.int64)))
            for b in (b1, b2)]
    for k in range(b1.n_reads):
        for b, off in zip((b1, b2), offs):
            s, e = int(off[k]), int(off[k + 1])
            out.write(b"@" + b.ids[k] + b"\n" + b.seq_flat[s:e].tobytes()
                      + b"\n+" + b.plus[k] + b"\n" + b.qual_flat[s:e].tobytes()
                      + b"\n")


def _pe_out_names(reader: ArcReader, out_prefix: Optional[str]) -> List[str]:
    if out_prefix:
        return [f"{out_prefix}_1.fastq", f"{out_prefix}_2.fastq"]
    if len(reader.file_list) == 2:
        return list(reader.file_list)
    base = reader.path
    return [base + "_1.fastq", base + "_2.fastq"]
