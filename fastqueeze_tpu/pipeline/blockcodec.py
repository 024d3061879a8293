"""Per-block stream split + entropy coding.

Capability parity with the reference's per-block encode/decode jobs
(SURVEY.md C7/C9/C17: AlignEncodeSEJob::doTask -> EncapFqzComp::doFqzEncode
and DecodeSEJob::decodeData): a block of parsed records is split into
independently coded streams — lengths, read IDs (binned), degenerate
(non-ACGT) bases, 2-bit sequence, quality — each wrapped in a TLV section so
streams are independently seekable inside a block (README.md:12).

All entropy coding runs on-device through the wave-synchronized rANS engine;
ID binning and TLV assembly are host-side (they are tiny).
"""

from __future__ import annotations

import io
import json
from typing import Dict, List, Optional, Tuple

import numpy as np

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.encap import iter_tlv, write_tlv
from fastqueeze_tpu.models.base import (
    FlatModel, Order1ByteModel, QualModel, byte_model,
    qual_model_from_params, seq_model_from_params)
from fastqueeze_tpu.io.fastq import FastqBlock
from fastqueeze_tpu.ops.engine import decode_stream, encode_stream
from fastqueeze_tpu.pipeline.idproc import (
    IdBinSchema, analyze_ids, reconstruct_ids)

TAG_META = 1
TAG_LEN = 2
TAG_DEGCNT = 3
TAG_DEGPOS = 4
TAG_DEGCHR = 5
TAG_IDSCHEMA = 6
TAG_IDVAR = 7
TAG_IDRAW = 8
TAG_PLUSSCHEMA = 9
TAG_PLUSVAR = 10
TAG_PLUSRAW = 11
TAG_SEQ = 12
TAG_QUAL = 13

_VAR_CHUNK = 256  # var byte streams are cut into pseudo-reads for lane ||ism

_BASE_MAP = np.full(256, 255, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    _BASE_MAP[_c] = _i
_BASE_INV = np.frombuffer(b"ACGT", np.uint8)


def _chunk_counts(n: int, chunk: int = _VAR_CHUNK) -> np.ndarray:
    if n == 0:
        return np.zeros(0, np.int64)
    full, rem = divmod(n, chunk)
    counts = [chunk] * full + ([rem] if rem else [])
    return np.asarray(counts, np.int64)


def _code_bytes(p: CodecParams, raw: bytes, order1: bool = True) -> bytes:
    """Entropy-code a small host byte string (chunked into pseudo-reads).
    Falls back to storing raw when coding does not help (marker byte)."""
    if not raw:
        return b"\x00"
    model = byte_model(p, order1=order1)
    counts = _chunk_counts(len(raw))
    flat = np.frombuffer(raw, np.uint8)
    payload = encode_stream(model, p, flat, counts)
    if len(payload) + 1 >= len(raw) + 5:
        return b"\x00" + raw
    return b"\x01" + len(raw).to_bytes(4, "little") + payload


def _decode_bytes(p: CodecParams, blob: bytes, order1: bool = True) -> bytes:
    if blob[:1] == b"\x00":
        return blob[1:]
    n = int.from_bytes(blob[1:5], "little")
    model = byte_model(p, order1=order1)
    counts = _chunk_counts(n)
    flat = decode_stream(model, p, blob[5:], counts)
    return flat.astype(np.uint8).tobytes()


def _two_byte_stream(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """values -> interleaved (lo, hi) symbols, counts=2/item, ctx=[0,1]."""
    n = len(values)
    syms = np.empty(2 * n, np.uint8)
    syms[0::2] = values & 0xFF
    syms[1::2] = (values >> 8) & 0xFF
    counts = np.full(n, 2, np.int64)
    ctx = np.tile(np.array([0, 1], np.uint8), n)
    return syms, counts, ctx


def _qual_alphabet(qmax: int) -> int:
    return ((qmax + 1 + 7) // 8) * 8


def encode_block(p: CodecParams, block: FastqBlock,
                 frozen: Optional[Dict] = None) -> bytes:
    R = block.n_reads
    lengths = block.lengths
    out = io.BytesIO()

    # --- degenerate (non-ACGT) bases (reference: NDege*/Dege* streams) ---
    codes = _BASE_MAP[block.seq_flat]
    dege_mask = codes == 255
    n_dege = int(dege_mask.sum())
    read_of_sym = np.repeat(np.arange(R), lengths)
    pos_in_read = (np.arange(len(codes), dtype=np.int64)
                   - np.repeat(np.cumsum(lengths) - lengths, lengths))
    dege_cnt = np.zeros(R, np.int64)
    if n_dege:
        np.add.at(dege_cnt, read_of_sym[dege_mask], 1)
        if dege_cnt.max() > 254:
            raise ValueError(">254 degenerate bases in one read (unsupported)")

    # --- quality alphabet for this block ---
    qflat = block.qual_flat.astype(np.int32) - 33
    if len(qflat) and (qflat.min() < 0 or qflat.max() > 93):
        raise ValueError("quality characters outside Phred+33 range")
    qmax = int(qflat.max()) if len(qflat) else 0
    if frozen is not None:
        qmax = max(qmax, frozen["qmax"])

    const_len = int(lengths[0]) if R and (lengths == lengths[0]).all() else None
    meta = {
        "R": R,
        "clen": const_len,
        "fnl": block.final_newline,
        "qmax": qmax,
        "nd": n_dege,
    }

    # --- lengths ---
    len_payload = None
    if const_len is None and R:
        if lengths.max() > 0xFFFF:
            raise ValueError("read length > 65535 unsupported")
        syms, counts, ctx = _two_byte_stream(lengths)
        model = FlatModel(alphabet=256, init=p.byte_init, inc=p.byte_inc,
                          cap=p.byte_cap, n_ctx=2)
        len_payload = encode_stream(model, p, syms, counts,
                                    extra_aux={"ctx": ctx})

    # --- IDs (host binning; var fields coded on-device) ---
    schema, var_payload = analyze_ids(block.ids)
    id_sections = []
    if schema is not None:
        id_sections.append((TAG_IDSCHEMA, schema.to_json()))
        if var_payload:
            id_sections.append((TAG_IDVAR, _code_bytes(p, var_payload)))
    else:
        raw = b"\n".join(block.ids) + b"\n" if R else b""
        id_sections.append((TAG_IDRAW, _code_bytes(p, raw)))

    # --- plus lines ---
    plus_sections = []
    if any(block.plus):
        pschema, pvar = analyze_ids(block.plus)
        if pschema is not None:
            plus_sections.append((TAG_PLUSSCHEMA, pschema.to_json()))
            if pvar:
                plus_sections.append((TAG_PLUSVAR, _code_bytes(p, pvar)))
        else:
            raw = b"\n".join(block.plus) + b"\n"
            plus_sections.append((TAG_PLUSRAW, _code_bytes(p, raw)))

    # --- degenerate streams ---
    dege_sections = []
    if n_dege:
        cnt_payload = _code_bytes(
            p, dege_cnt.astype(np.uint8).tobytes(), order1=False)
        dpos = pos_in_read[dege_mask]
        syms, counts, ctx = _two_byte_stream(dpos)
        model = FlatModel(alphabet=256, init=p.byte_init, inc=p.byte_inc,
                          cap=p.byte_cap, n_ctx=2)
        pos_payload = encode_stream(model, p, syms, counts,
                                    extra_aux={"ctx": ctx})
        chr_payload = _code_bytes(
            p, block.seq_flat[dege_mask].tobytes(), order1=False)
        dege_sections = [(TAG_DEGCNT, cnt_payload), (TAG_DEGPOS, pos_payload),
                         (TAG_DEGCHR, chr_payload)]

    # --- sequence (ACGT through the context model) ---
    seq_counts = lengths - dege_cnt
    seq_model = seq_model_from_params(p)
    seq_payload = encode_stream(
        seq_model, p, codes[~dege_mask], seq_counts,
        counts0=frozen["seq_counts"] if frozen else None)

    # --- quality ---
    qmodel = QualModel(alphabet=_qual_alphabet(qmax), init=p.qual_init,
                       inc=p.qual_inc, cap=p.qual_cap, qlevel=p.qlevel,
                       drop_init=p.q_drop_init)
    qual_payload = encode_stream(
        qmodel, p, qflat.astype(np.uint8), lengths,
        counts0=frozen["qual_counts"] if frozen else None)

    # --- assemble TLV ---
    out.write(write_tlv(TAG_META, json.dumps(meta).encode()))
    if len_payload is not None:
        out.write(write_tlv(TAG_LEN, len_payload))
    for tag, payload in dege_sections + id_sections + plus_sections:
        out.write(write_tlv(tag, payload))
    out.write(write_tlv(TAG_SEQ, seq_payload))
    out.write(write_tlv(TAG_QUAL, qual_payload))
    return out.getvalue()


def decode_block(p: CodecParams, payload: bytes,
                 frozen: Optional[Dict] = None) -> FastqBlock:
    sections = dict(iter_tlv(payload))
    meta = json.loads(sections[TAG_META].decode())
    R = meta["R"]
    n_dege = meta["nd"]
    qmax = meta["qmax"]

    # --- lengths ---
    if meta["clen"] is not None:
        lengths = np.full(R, meta["clen"], np.int64)
    elif R:
        model = FlatModel(alphabet=256, init=p.byte_init, inc=p.byte_inc,
                          cap=p.byte_cap, n_ctx=2)
        counts = np.full(R, 2, np.int64)
        ctx = np.tile(np.array([0, 1], np.uint8), R)
        syms = decode_stream(model, p, sections[TAG_LEN], counts,
                             extra_aux={"ctx": ctx})
        lengths = (syms[0::2].astype(np.int64)
                   | (syms[1::2].astype(np.int64) << 8))
    else:
        lengths = np.zeros(0, np.int64)

    # --- degenerate streams ---
    dege_cnt = np.zeros(R, np.int64)
    if n_dege:
        cnt_raw = _decode_bytes(p, sections[TAG_DEGCNT], order1=False)
        dege_cnt = np.frombuffer(cnt_raw, np.uint8).astype(np.int64)
        model = FlatModel(alphabet=256, init=p.byte_init, inc=p.byte_inc,
                          cap=p.byte_cap, n_ctx=2)
        counts = np.full(n_dege, 2, np.int64)
        ctx = np.tile(np.array([0, 1], np.uint8), n_dege)
        syms = decode_stream(model, p, sections[TAG_DEGPOS], counts,
                             extra_aux={"ctx": ctx})
        dpos = (syms[0::2].astype(np.int64)
                | (syms[1::2].astype(np.int64) << 8))
        dchr = np.frombuffer(
            _decode_bytes(p, sections[TAG_DEGCHR], order1=False), np.uint8)

    # --- sequence ---
    seq_counts = lengths - dege_cnt
    seq_model = seq_model_from_params(p)
    acgt = decode_stream(seq_model, p, sections[TAG_SEQ], seq_counts,
                         counts0=frozen["seq_counts"] if frozen else None)
    seq_flat = np.empty(int(lengths.sum()), np.uint8)
    if n_dege:
        read_off = np.cumsum(lengths) - lengths
        dege_abs = np.repeat(read_off, dege_cnt) + dpos
        mask = np.zeros(len(seq_flat), bool)
        mask[dege_abs] = True
        seq_flat[mask] = dchr
        seq_flat[~mask] = _BASE_INV[acgt]
    else:
        seq_flat[:] = _BASE_INV[acgt]

    # --- quality ---
    qmodel = QualModel(alphabet=_qual_alphabet(qmax), init=p.qual_init,
                       inc=p.qual_inc, cap=p.qual_cap, qlevel=p.qlevel,
                       drop_init=p.q_drop_init)
    qsyms = decode_stream(qmodel, p, sections[TAG_QUAL], lengths,
                          counts0=frozen["qual_counts"] if frozen else None)
    qual_flat = (qsyms.astype(np.uint8) + 33)

    # --- IDs ---
    if TAG_IDSCHEMA in sections:
        schema = IdBinSchema.from_json(sections[TAG_IDSCHEMA])
        var = (_decode_bytes(p, sections[TAG_IDVAR])
               if TAG_IDVAR in sections else b"")
        ids = reconstruct_ids(schema, R, var)
    else:
        raw = _decode_bytes(p, sections[TAG_IDRAW])
        ids = raw.split(b"\n")[:-1] if raw else []

    # --- plus lines ---
    if TAG_PLUSSCHEMA in sections:
        pschema = IdBinSchema.from_json(sections[TAG_PLUSSCHEMA])
        pvar = (_decode_bytes(p, sections[TAG_PLUSVAR])
                if TAG_PLUSVAR in sections else b"")
        plus = reconstruct_ids(pschema, R, pvar)
    elif TAG_PLUSRAW in sections:
        raw = _decode_bytes(p, sections[TAG_PLUSRAW])
        plus = raw.split(b"\n")[:-1] if raw else []
    else:
        plus = [b""] * R

    raw_len = (int(lengths.sum()) * 2 + sum(len(i) for i in ids)
               + sum(len(x) for x in plus) + 6 * R
               - (0 if meta["fnl"] else 1))
    return FastqBlock(n_reads=R, ids=ids, plus=plus, seq_flat=seq_flat,
                      qual_flat=qual_flat, lengths=lengths, raw_len=raw_len,
                      final_newline=meta["fnl"])
