"""File-level compress/decompress orchestration.

Capability parity with the reference's SeqArcContext + SeqArcRead + decode
jobs (SURVEY.md C3/C5/C17): cut input into blocks, encode each, record
per-block MD5 + whole-input MD5, write the container; on decode, verify both
and reassemble plaintext.  Blocks are independent, so this maps directly to
data-parallel execution across threads/hosts/chips (SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.arcfile import (
    ArcReader, ArcWriter, BlockInfo)
from fastqueeze_tpu.io.fastq import assemble_block, parse_block, read_blocks
from fastqueeze_tpu.pipeline.blockcodec import decode_block, encode_block
from fastqueeze_tpu.pipeline.parallel_host import (
    block_dp_devices as _block_dp_devices, device_parallel)
from fastqueeze_tpu.utils.log import info
from fastqueeze_tpu.utils.metrics import DebugInfo

# Frozen qual tables with at least this many (rows x (A+1)) entries decode
# ctx-SHARDED over an active mesh instead of replicated per device (u16
# quantized entries: 32M entries = 64 MB/device saved at 8 devices; the
# 2^20-row deep-qctx tables with a 40-rank alphabet sit at ~44M).  Tests
# monkeypatch this to exercise the path at toy scale.
CTX_SHARD_MIN_ENTRIES = 32 << 20


def _reject_partial(reader: ArcReader, arc_path: str) -> None:
    if reader.part is not None:
        k, n = reader.part
        raise ValueError(
            f"{arc_path}: partial archive (part {k} of {n}) — assemble the "
            f"full archive first: fastqueeze --merge part0.fqz ... -o out.fqz")


def apply_lossy(params: CodecParams, block):
    """R-Block quality transform (encode-side only); returns the new
    plaintext bytes + block, so MD5s cover what decode will reproduce."""
    from fastqueeze_tpu.pipeline.lossy import rblock_transform
    q = block.qual_flat.astype(np.int32) - 33
    q = rblock_transform(q, block.lengths, params.lossy_factor)
    block.qual_flat = (q + 33).astype(np.uint8)
    return assemble_block(block), block


def train_frozen_prefix(params: CodecParams, in_path: str,
                        dbg: Optional[DebugInfo] = None):
    """usemodel preprocess (reference doPreProcess, SURVEY.md §3.4): train
    frozen model tables on the input's first ~model_train_mb MB."""
    from fastqueeze_tpu.pipeline.frozen import serialize_frozen, train_frozen
    t0 = time.time()
    prefix = next(iter(read_blocks(in_path, params.model_train_mb << 20)))
    block = parse_block(*prefix)
    if params.lossy_factor > 1.0:
        _, block = apply_lossy(params, block)
    syms = int(block.lengths.sum())
    est = int(_gate_bytes(in_path) * syms / max(block.raw_len, 1))
    if params.dedup:
        # the duplicate tier shrinks the coded qual stream; train on the
        # deduped sample so the qctx cost model prices tables honestly
        from fastqueeze_tpu.pipeline.blockcodec import dedup_training_block
        block, frac = dedup_training_block(block, params)
        est = int(est * frac)
    frozen = train_frozen(params, block, est_total_syms=est)
    blob = serialize_frozen(frozen)
    # start the (~10 MB) table upload now, overlapping the first block's
    # host work (transfers are async; blocks would otherwise stall on it)
    from fastqueeze_tpu.pipeline.frozen import (_qual_alphabet,
                                                frozen_dev_tables)
    frozen_dev_tables(frozen, _qual_alphabet(frozen["qmax"]),
                      params.qctx_eff_init())
    if dbg:
        dbg.add("train_s", time.time() - t0)
    return frozen, blob


def _gate_bytes(in_path: str) -> int:
    """usemodel gate input-size estimate; gz inputs scale x5 (the
    reference's heuristic, doCheckSetEncodeOpt @0x408298)."""
    sz = os.path.getsize(in_path)
    return sz * 5 if in_path.endswith(".gz") else sz


def compress_se(params: CodecParams, in_path: str, out_path: str,
                dbg: Optional[DebugInfo] = None,
                part: Optional[tuple] = None) -> Dict:
    from fastqueeze_tpu.ops.engine import new_input_epoch
    from fastqueeze_tpu.pipeline.frozen import decide_use_model
    new_input_epoch()      # speculative-fetch estimates are per-input
    dbg = dbg or DebugInfo()
    devices = _block_dp_devices(params)
    block_size = params.block_bytes or params.block_size_mb * (1 << 20)
    whole_md5 = hashlib.md5()
    writer = ArcWriter(out_path, params, [os.path.basename(in_path)], [],
                       part=part)
    frozen = None
    gen = read_blocks(in_path, block_size)
    prefix_items = []   # (raw, final_nl, FastqBlock) — parsed once, reused
    if decide_use_model(params, _gate_bytes(in_path)):
        # usemodel preprocess (reference doPreProcess, SURVEY.md §3.4):
        # pull blocks until the training prefix is covered, parse them
        # once, train from the parsed arrays, then feed the same parsed
        # blocks straight into the encode pipeline (no second read pass)
        from fastqueeze_tpu.pipeline.frozen import (
            _qual_alphabet, frozen_dev_tables, serialize_frozen,
            train_frozen_blocks)
        t0 = time.time()
        need = params.model_train_mb << 20
        got = 0
        for raw, final_nl in gen:
            block = parse_block(raw, final_nl)
            if params.lossy_factor > 1.0:
                raw, block = apply_lossy(params, block)
            prefix_items.append((raw, final_nl, block))
            got += len(raw)
            if got >= need:
                break
        syms = sum(int(b.lengths.sum()) for _, _, b in prefix_items)
        est = int(_gate_bytes(in_path) * syms / max(got, 1))
        tblocks = [b for _, _, b in prefix_items]
        if params.dedup:
            # train on the deduped sample (what the coder will actually
            # emit) so the qctx cost model prices tables honestly;
            # dup_masks() caches on each block, so the per-block encode
            # below reuses this work instead of rehashing
            from fastqueeze_tpu.pipeline.blockcodec import (
                dedup_training_block)
            tblocks = [dedup_training_block(b, params)[0]
                       for b in tblocks]
            uq = sum(int(tb.lengths.sum()) for tb in tblocks)
            est = int(est * uq / max(syms, 1))
        frozen = train_frozen_blocks(params, tblocks, est_total_syms=est)
        writer.set_model(serialize_frozen(frozen))
        # start the (~10 MB) table upload now, overlapping the first
        # block's host work (transfers are async)
        frozen_dev_tables(frozen, _qual_alphabet(frozen["qmax"]),
                          params.qctx_eff_init())
        dbg.add("train_s", time.time() - t0)
    if params.self_align == -1:
        # auto (-S default): decide once per file from the first block,
        # BEFORE the (possibly threaded) encode loop — the decision must
        # not depend on -t/--mesh scheduling
        from fastqueeze_tpu.pipeline.selfref import auto_self_align
        if not prefix_items:
            first = next(gen, None)
            if first is not None:
                raw0, fnl0 = first
                blk0 = parse_block(raw0, fnl0)
                if params.lossy_factor > 1.0:
                    raw0, blk0 = apply_lossy(params, blk0)
                prefix_items.append((raw0, fnl0, blk0))
        params.self_align = 1 if (
            prefix_items
            and auto_self_align(params, prefix_items[0][2], dbg)) else 0
    idx = 0
    total_raw = 0
    part_k, part_n = part if part else (0, 1)

    def items():
        for it in prefix_items:
            yield it
        for raw, final_nl in gen:
            yield (raw, final_nl, None)

    def my_items():
        # --part K:N: this host owns blocks K, K+N, ... of the SAME input;
        # every block is still scanned (and lossy-transformed) in file
        # order so each part computes the identical whole-input MD5 —
        # that is what lets merge_archives() reproduce the single-run
        # archive byte-for-byte.  Single-part runs defer parse + lossy to
        # the workers (the generator is single-threaded; transforming
        # here would serialize threaded lossy encodes) and update the
        # MD5 in the ordered consumer instead.
        for gi, (raw, final_nl, block) in enumerate(items()):
            if part_n > 1:
                if block is None and params.lossy_factor > 1.0:
                    block = parse_block(raw, final_nl)
                    raw, block = apply_lossy(params, block)
                whole_md5.update(raw)
                if gi % part_n == part_k:
                    yield gi, (raw, final_nl, block)
            else:
                yield gi, (raw, final_nl, block)

    def _self_align(block):
        if not params.self_align:
            return None, None
        from fastqueeze_tpu.pipeline.selfref import maybe_align_self
        return maybe_align_self(params, block, dbg)

    if params.threads > 1:
        def work(_i, gi_item):
            gi, (raw, final_nl, block) = gi_item
            if block is None:
                block = parse_block(raw, final_nl)
                if part_n == 1 and params.lossy_factor > 1.0:
                    raw, block = apply_lossy(params, block)
            align, rc = _self_align(block)
            payload = encode_block(params, block, frozen=frozen,
                                   align=align, ref_codes=rc,
                                   self_ref=align is not None, dbg=dbg)
            return gi, raw, payload, block.n_reads

        t_all = time.time()
        for _i, (gi, raw, payload, n_reads) in device_parallel(
                my_items(), work, devices, params.threads):
            if part_n == 1:        # ordered: blocks arrive in file order
                whole_md5.update(raw)
            writer.add_block(gi, payload, BlockInfo(
                payload_len=len(payload), n_reads=n_reads,
                raw_len1=len(raw), md5=hashlib.md5(raw).digest()))
            dbg.add("reads", n_reads)
            total_raw += len(raw)
            idx += 1
        dbg.add("encode_s", time.time() - t_all)
    else:
        pending = None      # (idx, finalize, BlockInfo) — device in flight
        from fastqueeze_tpu.pipeline.blockcodec import encode_block_job

        def flush(pend):
            t0 = time.time()
            payload = pend[1]()
            dbg.add("encode_s", time.time() - t0)
            writer.add_block(pend[0], payload, pend[2])

        for gi, (raw, final_nl, block) in my_items():
            t0 = time.time()
            if block is None:
                block = parse_block(raw, final_nl)
                if part_n == 1 and params.lossy_factor > 1.0:
                    raw, block = apply_lossy(params, block)
            if part_n == 1:
                whole_md5.update(raw)
            dbg.add("parse_s", time.time() - t0)
            t0 = time.time()
            align, rc = _self_align(block)
            fin = encode_block_job(params, block, frozen=frozen,
                                   align=align, ref_codes=rc,
                                   self_ref=align is not None, dbg=dbg)
            dbg.add("dispatch_s", time.time() - t0)
            info = BlockInfo(payload_len=0, n_reads=block.n_reads,
                             raw_len1=len(raw),
                             md5=hashlib.md5(raw).digest())
            if pending is not None:
                flush(pending)
            pending = (gi, fin, info)
            dbg.add("reads", block.n_reads)
            total_raw += len(raw)
            idx += 1
        if pending is not None:
            flush(pending)
    writer.input_md5s = [whole_md5.digest()]
    writer.finalize()
    out_size = os.path.getsize(out_path)
    dbg.add("raw_bytes", total_raw)
    dbg.add("out_bytes", out_size)
    return {"blocks": idx, "raw": total_raw, "compressed": out_size,
            "ratio": total_raw / out_size if out_size else 0.0}


def decompress(arc_path: str, out_prefix: Optional[str],
               dbg: Optional[DebugInfo] = None, ref: Optional[str] = None,
               pipeout: int = 0, force: bool = False,
               indir: bool = False, threads: int = 0,
               mesh: int = 0) -> List[str]:
    dbg = dbg or DebugInfo()
    from fastqueeze_tpu.ops.engine import new_input_epoch
    new_input_epoch()      # speculative-fetch estimates are per-input
    with ArcReader(arc_path) as reader:
        _reject_partial(reader, arc_path)
        params = reader.params
        if threads:            # decode-side -t overrides the encoder's
            params.threads = threads
        if mesh:               # decode-side --mesh overrides the encoder's;
            params.mesh_n = mesh   # either way clamped to visible devices
        from fastqueeze_tpu.parallel.mesh import block_devices
        devices = block_devices(params.mesh_n, clamp=True)
        if devices and params.threads < len(devices):
            params.threads = len(devices)
        ref_codes = _load_ref_for_decode(params, ref)
        if params.is_pe:
            from fastqueeze_tpu.pipeline.pe import decompress_pe_blocks
            return decompress_pe_blocks(reader, out_prefix, dbg, ref=ref,
                                        pipeout=pipeout, force=force,
                                        ref_codes=ref_codes,
                                        devices=devices)
        if getattr(params, "multi", 0):
            frozen_m = None
            if reader.model_blob is not None:
                from fastqueeze_tpu.pipeline.frozen import deserialize_frozen
                frozen_m = deserialize_frozen(reader.model_blob)
            return _decompress_multi(reader, out_prefix, dbg, frozen_m,
                                     ref_codes, force, devices)
        out_name = _se_out_name(arc_path, out_prefix, reader.file_list)
        if indir:
            out_name = os.path.join(os.path.dirname(os.path.abspath(arc_path)),
                                    os.path.basename(out_name))
        if pipeout:
            out_name = None
        elif os.path.exists(out_name) and not force:
            raise ValueError(f"{out_name} exists (use -f to overwrite)")
        frozen = None
        if reader.model_blob is not None:
            from fastqueeze_tpu.pipeline.frozen import deserialize_frozen
            frozen = deserialize_frozen(reader.model_blob)
        # big-table mesh gate: with a mesh active and a frozen qual table
        # past the replication threshold, blocks decode sequentially with
        # the table SHARDED over the mesh's devices ('ctx' axis — the TP
        # analogue, parallel/mesh.decode_blocks_frozen_sharded) instead of
        # replicating it per device for block round-robin
        ctx_shard = None
        if (devices and frozen is not None and not params.frozen_adapt
                and params.qual_nctx() % len(devices) == 0
                and params.qual_nctx() * (frozen["qmax"] + 2)
                >= CTX_SHARD_MIN_ENTRIES):
            ctx_shard, devices = devices, None
        whole_md5 = hashlib.md5()
        import contextlib

        def decode_one(i, payload):
            block = decode_block(params, payload, frozen=frozen,
                                 ref_codes=ref_codes, ctx_shard=ctx_shard)
            raw = assemble_block(block)
            if hashlib.md5(raw).digest() != reader.blocks[i].md5:
                raise ValueError(
                    f"block {i}: MD5 mismatch (corrupt archive)")
            return raw

        with (open(out_name, "wb") if out_name
              else contextlib.nullcontext(sys.stdout.buffer)) as out:
            payloads = (reader.read_block(i)
                        for i in range(len(reader.blocks)))
            t0 = time.time()
            for i, raw in device_parallel(payloads, decode_one, devices,
                                          params.threads):
                whole_md5.update(raw)
                out.write(raw)
            dbg.add("decode_s", time.time() - t0)
        if reader.input_md5s and whole_md5.digest() != reader.input_md5s[0]:
            raise ValueError("whole-input MD5 mismatch")
        return [out_name] if out_name else []


def extract(arc_path: str, out_prefix: Optional[str], start: int,
            count: int, ref: Optional[str] = None, force: bool = False,
            dbg: Optional[DebugInfo] = None) -> List[str]:
    """Random-access decode: reads [start, start+count) without touching
    other blocks.  The block table's per-block read counts (container
    BLOCKTABLE, the reference's writeBlockLenArry made blocks seekable —
    SURVEY.md §5 checkpoint/resume) locate the covering blocks; only
    those are fetched and decoded (per-block MD5 still verified).  For PE
    archives indices address PAIRS; two output files are written."""
    dbg = dbg or DebugInfo()
    if start < 0 or count <= 0:
        raise ValueError("extract needs start >= 0 and count > 0")
    with ArcReader(arc_path) as reader:
        _reject_partial(reader, arc_path)
        params = reader.params
        if getattr(params, "multi", 0):
            raise ValueError("-X is not supported on multi-file archives")
        ref_codes = _load_ref_for_decode(params, ref)
        frozen = None
        if reader.model_blob is not None:
            from fastqueeze_tpu.pipeline.frozen import deserialize_frozen
            frozen = deserialize_frozen(reader.model_blob)
        total = sum(b.n_reads for b in reader.blocks)
        if start + count > total:
            raise ValueError(
                f"read range [{start}, {start + count}) exceeds archive "
                f"({total} {'pairs' if params.is_pe else 'reads'})")

        pieces1, pieces2 = [], []
        cum = 0
        for i, info in enumerate(reader.blocks):
            lo, hi = cum, cum + info.n_reads
            cum = hi
            if hi <= start or lo >= start + count:
                continue
            payload = reader.read_block(i)
            s = max(start - lo, 0)
            e = min(start + count - lo, info.n_reads)
            if params.is_pe:
                from fastqueeze_tpu.pipeline.pe import decode_pe_payload
                b1, b2, _, _ = decode_pe_payload(params, payload, frozen,
                                                 ref_codes, info.md5, i)
                pieces1.append(_slice_records(b1, s, e))
                pieces2.append(_slice_records(b2, s, e))
            else:
                block = decode_block(params, payload, frozen=frozen,
                                     ref_codes=ref_codes)
                raw = assemble_block(block)
                if hashlib.md5(raw).digest() != info.md5:
                    raise ValueError(
                        f"block {i}: MD5 mismatch (corrupt archive)")
                pieces1.append(_slice_records(block, s, e))

        base = out_prefix or (os.path.splitext(arc_path)[0] + "_extract")
        if params.is_pe:
            outs = [base + "_1.fastq", base + "_2.fastq"]
            datas = [b"".join(pieces1), b"".join(pieces2)]
        else:
            outs = [base + ".fastq"]
            datas = [b"".join(pieces1)]
        for name, data in zip(outs, datas):
            if os.path.exists(name) and not force:
                raise ValueError(f"{name} exists (use -f to overwrite)")
            with open(name, "wb") as fh:
                fh.write(data)
        return outs


def _slice_records(block, s: int, e: int) -> bytes:
    """Plaintext of records [s, e) of a decoded block.  When the slice
    reaches the block's last record, its final_newline is preserved so
    extracting the tail of a no-trailing-newline input stays byte-exact
    with a full decompress."""
    from fastqueeze_tpu.io.fastq import FastqBlock
    offs = np.cumsum(block.lengths) - block.lengths
    a = int(offs[s])
    b = int(offs[e - 1] + block.lengths[e - 1])
    fnl = block.final_newline if e == block.n_reads else True
    sub = FastqBlock(
        n_reads=e - s, ids=list(block.ids[s:e]), plus=list(block.plus[s:e]),
        seq_flat=block.seq_flat[a:b], qual_flat=block.qual_flat[a:b],
        lengths=block.lengths[s:e], raw_len=0, final_newline=fnl)
    return assemble_block(sub)


def compress_multi(params: CodecParams, in_paths: List[str], out_path: str,
                   dbg: Optional[DebugInfo] = None) -> Dict:
    """Multi-file archive (reference -m mode, SURVEY.md §5: several inputs
    into one archive with a file-list section; that path is bit-rotted in
    the reference binary — decode segfaults — and works here).  Blocks are
    tagged with their input file id; one whole-input MD5 per file."""
    from fastqueeze_tpu.ops.engine import new_input_epoch
    from fastqueeze_tpu.pipeline.frozen import decide_use_model
    new_input_epoch()      # speculative-fetch estimates are per-input
    dbg = dbg or DebugInfo()
    params.multi = 1
    if params.self_align == -1:
        params.self_align = 0      # multi-file blocks never self-align
    block_size = params.block_bytes or params.block_size_mb * (1 << 20)
    writer = ArcWriter(out_path, params,
                       [os.path.basename(x) for x in in_paths], [])
    frozen = None
    total_in = sum(os.path.getsize(x) for x in in_paths)
    if decide_use_model(params, total_in):
        frozen, blob = train_frozen_prefix(params, in_paths[0], dbg)
        writer.set_model(blob)
    idx = 0
    total_raw = 0
    md5s = [hashlib.md5() for _ in in_paths]
    devices = _block_dp_devices(params)

    def items():
        for fid, path in enumerate(in_paths):
            for raw, final_nl in read_blocks(path, block_size):
                yield fid, raw, final_nl

    def work(i, item):
        fid, raw, final_nl = item
        block = parse_block(raw, final_nl)
        if params.lossy_factor > 1.0:
            raw, block = apply_lossy(params, block)
        payload = encode_block(params, block, frozen=frozen)
        return fid, raw, payload, block.n_reads

    for i, (fid, raw, payload, n_reads) in device_parallel(
            items(), work, devices, params.threads):
        md5s[fid].update(raw)       # blocks arrive in order, fids monotone
        writer.add_block(i, payload, BlockInfo(
            payload_len=len(payload), n_reads=n_reads,
            raw_len1=len(raw), md5=hashlib.md5(raw).digest(),
            file_id=fid))
        total_raw += len(raw)
        idx = i + 1
    writer.input_md5s = [m.digest() for m in md5s]
    writer.finalize()
    out_size = os.path.getsize(out_path)
    return {"blocks": idx, "raw": total_raw, "compressed": out_size,
            "files": len(in_paths),
            "ratio": total_raw / out_size if out_size else 0.0}


def _decompress_multi(reader: ArcReader, out_prefix: Optional[str],
                      dbg: DebugInfo, frozen, ref_codes,
                      force: bool, devices=None) -> List[str]:
    params = reader.params
    names = []
    for i, orig in enumerate(reader.file_list):
        if out_prefix:
            names.append(f"{out_prefix}{i}.fastq")
        else:
            names.append(orig)
    for n in names:
        if os.path.exists(n) and not force:
            raise ValueError(f"{n} exists (use -f to overwrite)")

    def decode_one(i, payload):
        block = decode_block(params, payload, frozen=frozen,
                             ref_codes=ref_codes)
        raw = assemble_block(block)
        if hashlib.md5(raw).digest() != reader.blocks[i].md5:
            raise ValueError(f"block {i}: MD5 mismatch (corrupt archive)")
        return raw

    outs = [open(n, "wb") for n in names]
    md5s = [hashlib.md5() for _ in names]
    t0 = time.time()
    try:
        payloads = (reader.read_block(i)
                    for i in range(len(reader.blocks)))
        for i, raw in device_parallel(payloads, decode_one, devices,
                                      params.threads):
            fid = reader.blocks[i].file_id
            outs[fid].write(raw)
            md5s[fid].update(raw)
    finally:
        for o in outs:
            o.close()
    dbg.add("decode_s", time.time() - t0)
    for i, m in enumerate(md5s):
        if i < len(reader.input_md5s) and m.digest() != reader.input_md5s[i]:
            raise ValueError(f"file {i}: whole-input MD5 mismatch")
    return names


def _load_ref_for_decode(params: CodecParams, ref: Optional[str]):
    """Aligned archives need the reference FASTA at decode (but never the
    index — reference parity, SURVEY.md §2.2 "decompression does not");
    wrong/missing references are rejected up front."""
    if not getattr(params, "aligned", 0):
        return None
    if not ref:
        raise ValueError("archive was compressed with a reference; decode "
                         "needs the same FASTA (fastqueeze -d ref.fa arc)")
    from fastqueeze_tpu.align.ref import load_fasta
    r = load_fasta(ref)
    if params.ref_md5 and r.md5 != params.ref_md5:
        raise ValueError(f"wrong reference file: md5 {r.md5} != archive's "
                         f"{params.ref_md5}")
    return r.codes


def _se_out_name(arc_path: str, out_prefix: Optional[str],
                 file_list: List[str]) -> str:
    if out_prefix:
        return out_prefix + ".fastq"
    if file_list:
        return file_list[0]
    return arc_path + ".fastq"
