"""Self-referential alignment ("-S"): compress each block against a
reference assembled from its OWN reads.

No reference equivalent in SeqArc (its aligned mode needs an external
FASTA; SURVEY.md C13).  The construction that makes this decodable with
zero side data: the per-block reference is exactly the concatenation of
the reads that stay in the entropy-coded SEQ stream — the unmapped,
non-duplicate, degenerate-free reads, in block order.  Decode fills those
reads first, rebuilds the byte-identical reference, and reconstructs every
mapped read through the ordinary alignment streams (pos/rev/mismatch —
the SURVEY.md C16 machinery, unchanged).  No permutation stream, no
stored reference, no new decode kernels; a SPRING-class capability for
high-coverage / near-duplicate data at the cost of one aligner pass.

The encoder policy below is free to change without touching the format
(decode only consumes the outcome): reads are scanned in waves, each wave
aligns against the reference built so far, unmapped eligible reads are
appended, and the CSR index is rebuilt geometrically (once the reference
outgrows the indexed prefix by 50%) so total index-build cost stays ~3x
the final build.  Exact duplicates are already handled by the cheaper
duplicate tier and are neither aligned nor appended.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.io.fastq import FastqBlock

_WAVE0 = 256            # first-wave size: the whole first wave is blind
                        # (no reference yet), so keep it small — the
                        # content it appends is pure redundancy when later
                        # reads cover the same loci
_WAVE = 4096            # steady-state reads aligned per wave
_GROW = 1.5             # rebuild the index when ref >= _GROW * indexed


def ref_eligible(mapped: np.ndarray, sdup: np.ndarray,
                 dege_cnt: np.ndarray, lengths: np.ndarray,
                 k: int) -> np.ndarray:
    """Reads whose bases form the self-reference.  MUST be computed
    identically on encode and decode (both only need per-read facts that
    the archive carries): unmapped, not a seq-duplicate, degenerate-free,
    and at least one seed long."""
    return ~mapped & ~sdup & (dege_cnt == 0) & (lengths >= k)


def _mk_aligner(p: CodecParams, codes: np.ndarray):
    """Aligner over an in-memory code prefix (no FASTA, no MD5)."""
    import dataclasses

    from fastqueeze_tpu.align.hash import Aligner
    from fastqueeze_tpu.align.index import build_from_ref
    from fastqueeze_tpu.align.ref import RefSeq
    ref = RefSeq(codes=codes, amb_mask=np.zeros(len(codes), bool),
                 names=["self"], bounds=np.array([0, len(codes)], np.int64),
                 md5="")
    # force the host-native tiers even under an explicit --mesh: the
    # per-wave index rebuilds would otherwise re-upload device tables
    # every wave (results are bit-identical either way)
    pa = dataclasses.replace(p, mesh_n=0)
    return Aligner(build_from_ref(ref, pa), pa)


def maybe_align_self(p: CodecParams, block: FastqBlock, dbg=None
                     ) -> Tuple[Optional[object], Optional[np.ndarray]]:
    """(AlignResult, ref_codes) for self-referential coding of `block`,
    or (None, None) when too few reads map to pay for the streams
    (min_map_ratio gate, like the external-reference path)."""
    from fastqueeze_tpu.align.hash import AlignResult
    from fastqueeze_tpu.pipeline.blockcodec import _BASE_MAP, dup_masks
    t0 = time.time()
    R = block.n_reads
    lengths = block.lengths
    k = p.seed_len
    codes_flat = _BASE_MAP[block.seq_flat]
    dege_flat = codes_flat == 255
    codes_flat = np.where(dege_flat, 0, codes_flat)
    read_off = np.cumsum(lengths) - lengths

    sdup = np.zeros(R, bool)
    if p.dedup and R > 1:
        s_src, _ = dup_masks(block)
        if s_src is not None:
            sdup = s_src >= 0
    dege_cnt = np.zeros(R, np.int64)
    if dege_flat.any():
        rows_d = np.searchsorted(read_off, np.flatnonzero(dege_flat),
                                 side="right") - 1
        dege_cnt = np.bincount(rows_d, minlength=R).astype(np.int64)
    alignable = (~sdup & (dege_cnt == 0) & (lengths >= k)
                 & (lengths <= p.align_max_len))

    mapped = np.zeros(R, bool)
    pos = np.zeros(R, np.int64)
    is_rev = np.zeros(R, bool)
    lp_max = 32
    if alignable.any():
        lp_max = max(lp_max, _lp_of(int(lengths[alignable].max())))
    mis_mask = np.zeros((R, lp_max), bool)

    ref_parts = []
    ref_len = 0
    indexed = 0
    aligner = None
    s = 0
    wave = _WAVE0
    while s < R:
        rows = np.arange(s, min(s + wave, R))
        s += wave
        wave = min(_WAVE, wave * 2)
        cand = rows[alignable[rows]]
        if len(cand) and ref_len >= k:
            if aligner is None or ref_len >= _GROW * max(indexed, 1):
                ref_codes = (np.concatenate(ref_parts) if ref_parts
                             else np.zeros(0, np.uint8))
                ref_parts = [ref_codes]
                aligner = _mk_aligner(p, ref_codes)
                indexed = ref_len
            idx = (np.repeat(read_off[cand], lengths[cand])
                   + _intra(lengths[cand]))
            sub = aligner.align(codes_flat[idx], dege_flat[idx],
                                lengths[cand])
            hit = sub.mapped
            upd = cand[hit]
            mapped[upd] = True
            pos[upd] = sub.pos[hit]
            is_rev[upd] = sub.is_rev[hit]
            mis_mask[upd, :sub.mis_mask.shape[1]] = sub.mis_mask[hit]
        # unmapped eligible reads of this wave extend the reference,
        # in read order (= the decoder's reconstruction order)
        grow = rows[ref_eligible(mapped[rows], sdup[rows], dege_cnt[rows],
                                 lengths[rows], k)]
        if len(grow):
            idx = (np.repeat(read_off[grow], lengths[grow])
                   + _intra(lengths[grow]))
            ref_parts.append(codes_flat[idx])
            ref_len += int(lengths[grow].sum())
    if dbg is not None:
        dbg.add("selfref_s", time.time() - t0)
    n_mapped = int(mapped.sum())
    n_alignable = int(alignable.sum())
    if n_alignable == 0 or n_mapped / n_alignable < p.min_map_ratio:
        if dbg is not None:
            dbg.add("fqz_blocks", 1)
        return None, None
    if dbg is not None:
        dbg.add("align_blocks", 1)
        dbg.add("mapped_reads", n_mapped)
        dbg.add("selfref_bases", ref_len)
    ref_codes = (np.concatenate(ref_parts) if ref_parts
                 else np.zeros(0, np.uint8))
    return AlignResult(mapped, pos, is_rev, mis_mask), ref_codes


def _lp_of(max_len: int) -> int:
    b = 32
    while b < max_len:
        b = b + (b >> 1) if (b & (b - 1)) == 0 else (b // 3) * 4
    return b


def _intra(lens: np.ndarray) -> np.ndarray:
    offs = np.cumsum(lens) - lens
    return (np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(offs, lens))
