"""Frozen-model ("usemodel") mode.

Capability parity with the reference's preprocess model training
(SURVEY.md §2.1 "Frozen-model mode" + §3.4: doPreProcess trains models on a
~34 MB prefix via encode_*_formodel, snapshots them with SaveModelToMem into
the archive's model section, and every block starts coding from the frozen
snapshot — blocks become independently decodable in parallel with
deterministic model state).

TPU-first redesign: training is not a serial coding pass but a single
batched histogram (`engine.train_counts` — one bincount over every
(context, symbol) pair of the prefix at once); the snapshot is the counts
tables themselves, zlib-packed into the container's MODEL section.  Each
block then starts from the frozen tables and keeps adapting *within* the
block (still block-independent, strictly better-adapted than the
reference's fully-frozen coding).
"""

from __future__ import annotations

import io
import json
import zlib
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.encap import iter_tlv, write_tlv
from fastqueeze_tpu.io.fastq import FastqBlock
from fastqueeze_tpu.models.base import QualModel, seq_model_from_params
from fastqueeze_tpu.ops.engine import train_counts

_TAG_META = 1
_TAG_SEQ = 2
_TAG_QUAL = 3


def _qual_alphabet(qmax: int) -> int:
    return ((qmax + 1 + 7) // 8) * 8


def decide_use_model(p: CodecParams, input_bytes: int) -> bool:
    """Reference gate (doCheckSetEncodeOpt @0x408298): scale + Qlevel <= 2.
    Here: on when the input spans multiple blocks (that is when block
    independence pays) unless forced either way."""
    if p.use_model == 1:
        return True
    if p.use_model == -1 or p.qlevel > 2:
        return False
    return input_bytes > 2 * p.block_size_mb * (1 << 20)


def _subsample(block: FastqBlock, target_syms: int) -> FastqBlock:
    """Every-Nth-read subsample: a histogram trainer needs representative
    statistics, not every symbol — caps training cost on huge prefixes."""
    total = int(block.lengths.sum())
    if total <= target_syms or block.n_reads < 4:
        return block
    stride = int(np.ceil(total / target_syms))
    keep = np.zeros(block.n_reads, bool)
    keep[::stride] = True
    sym_keep = np.repeat(keep, block.lengths)
    return FastqBlock(
        n_reads=int(keep.sum()),
        ids=[], plus=[],
        seq_flat=block.seq_flat[sym_keep],
        qual_flat=block.qual_flat[sym_keep],
        lengths=block.lengths[keep],
        raw_len=0, final_newline=True)


def train_frozen(p: CodecParams, block: FastqBlock,
                 target_syms: int = 16 << 20) -> Dict:
    """Train seq + qual frozen tables from a prefix block."""
    from fastqueeze_tpu.pipeline.blockcodec import _BASE_MAP
    block = _subsample(block, target_syms)
    codes = _BASE_MAP[block.seq_flat]
    dege = codes == 255
    lengths = block.lengths
    R = block.n_reads
    dege_cnt = np.zeros(R, np.int64)
    if dege.any():
        np.add.at(dege_cnt, np.repeat(np.arange(R), lengths), dege)
    seq_model = seq_model_from_params(p)
    seq_counts = train_counts(seq_model, p, codes[~dege],
                              lengths - dege_cnt)

    qflat = block.qual_flat.astype(np.int32) - 33
    qmax = int(qflat.max()) if len(qflat) else 0
    qmodel = QualModel(alphabet=_qual_alphabet(qmax), init=p.qual_init,
                       inc=p.qual_inc, cap=p.qual_cap, qlevel=p.qlevel,
                       drop_init=p.q_drop_init)
    qual_counts = train_counts(qmodel, p, qflat.astype(np.uint8), lengths)
    # tables travel (device->host->archive->device) in the narrowest dtype
    # the model cap allows; the engine widens to int32 on device
    return {"qmax": qmax,
            "seq_counts": np.asarray(_narrow(seq_counts, seq_model.cap)),
            "qual_counts": np.asarray(_narrow(qual_counts, qmodel.cap))}


def _narrow(counts, cap: int):
    if cap < (1 << 8):
        return counts.astype(jnp.uint8)
    if cap < (1 << 16):
        return counts.astype(jnp.uint16)
    return counts


def _pack_counts(a: np.ndarray) -> Dict:
    """Minimal-width serialization: table caps bound every count, so u8/u16
    usually suffice; zlib squeezes the (mostly init-valued) remainder."""
    hi = int(a.max()) if a.size else 0
    dt = np.uint8 if hi < 0x100 else (np.uint16 if hi < 0x10000 else np.int32)
    return {"shape": list(a.shape), "dtype": np.dtype(dt).str,
            "blob": zlib.compress(np.ascontiguousarray(a, dt).tobytes(), 1)}


def serialize_frozen(frozen: Dict) -> bytes:
    seq = _pack_counts(np.asarray(frozen["seq_counts"]))
    qual = _pack_counts(np.asarray(frozen["qual_counts"]))
    meta = {"qmax": frozen["qmax"],
            "seq_shape": seq["shape"], "seq_dtype": seq["dtype"],
            "qual_shape": qual["shape"], "qual_dtype": qual["dtype"]}
    out = io.BytesIO()
    out.write(write_tlv(_TAG_META, json.dumps(meta).encode()))
    out.write(write_tlv(_TAG_SEQ, seq["blob"]))
    out.write(write_tlv(_TAG_QUAL, qual["blob"]))
    return out.getvalue()


def deserialize_frozen(blob: bytes) -> Dict:
    sections = dict(iter_tlv(blob))
    meta = json.loads(sections[_TAG_META].decode())
    seq = np.frombuffer(zlib.decompress(sections[_TAG_SEQ]),
                        meta["seq_dtype"])
    qual = np.frombuffer(zlib.decompress(sections[_TAG_QUAL]),
                         meta["qual_dtype"])
    return {"qmax": meta["qmax"],
            "seq_counts": seq.reshape(meta["seq_shape"]),
            "qual_counts": qual.reshape(meta["qual_shape"])}


def fit_qual_alphabet(counts, alphabet: int, init: int):
    """Pad/passthrough the frozen qual table to a block's alphabet (a later
    block may contain higher quality symbols than the training prefix)."""
    have = counts.shape[1]
    if have == alphabet:
        return counts
    if have > alphabet:
        raise ValueError("frozen qual table wider than block alphabet")
    counts = jnp.asarray(counts)
    pad = jnp.full((counts.shape[0], alphabet - have), init, counts.dtype)
    return jnp.concatenate([counts, pad], axis=1)
