"""Wave-synchronized adaptive interleaved-rANS engine.

This is the TPU-native replacement for the reference's serial per-symbol
adaptive range coder (SURVEY.md §2.1, srcfile:EncapFqzComp.cpp: the inlined
64-bit-low range coder in every encode_*/decode_* plus SIMPLE_MODEL<N>
frequency tables).  Design:

* ``L`` independent rANS lanes (32-bit state, 16-bit renormalization words)
  are coded in lockstep over symbol "waves": wave ``t`` codes symbol ``t`` of
  every lane's sequence.
* Model tables (per-context symbol counts) are **shared** across lanes and
  updated once per wave with a batched scatter-add, then deterministically
  rescaled (halved) when a row total exceeds the model cap.  Encode and
  decode replay the identical integer model walk, so the coder is adaptive
  without any serial dependency inside a wave.
* Counts are quantized to frequencies summing to exactly 2^14 by cumulative
  rounding ``F_i = floor(cum_i * M / C)`` — deterministic, guarantees
  ``f_s >= 1`` for every count >= 1 because row totals are capped at
  ``cap <= M``.  Decode then needs only shifts/masks (no division).
* Each lane emits at most one 16-bit word per symbol (single-renorm regime:
  ``L=2^16`` state floor, 16-bit words, 14-bit frequencies).  Words from all
  lanes go to one shared stream in canonical (wave, lane) order, so the only
  per-lane metadata is the 4-byte final state.

Encode is two passes: pass 1 walks the adaptive models forward recording
(start, freq) per symbol; pass 2 runs the pure rANS arithmetic in reverse
(rANS is LIFO).  Decode is a single forward pass.  All passes are
``lax.scan`` over waves, vectorized over lanes — VPU-friendly, static
shapes, fully inside jit.
"""

from __future__ import annotations

import functools
import math
import struct
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastqueeze_tpu.config import PROB_BITS, RANS_L, RANS_M, CodecParams
from fastqueeze_tpu.models.base import CtxModel
from fastqueeze_tpu.ops.lanes import LaneLayout, aux_grids, from_grid, make_layout, to_grid

_U32 = jnp.uint32
_MASK_M = RANS_M - 1


def init_counts(model: CtxModel) -> jnp.ndarray:
    return jnp.full((model.n_ctx, model.alphabet), model.init, jnp.int32)


def _n_halve(model: CtxModel, L: int) -> int:
    """Static unroll count: halvings needed to bring any post-wave row total
    (<= cap + inc*L + alphabet rounding) back under cap."""
    worst = model.cap + model.inc * L + model.alphabet
    return max(1, math.ceil(math.log2(worst / model.cap)) + 1)


def _quant(rows: jnp.ndarray) -> jnp.ndarray:
    """(L, A) int32 count rows -> (L, A+1) cumulative freqs summing to M."""
    cum = jnp.cumsum(rows, axis=1)
    C = cum[:, -1:]
    cumz = jnp.concatenate([jnp.zeros_like(C), cum], axis=1)
    return (cumz * RANS_M) // C


def _wave_update(counts, ctx, sym, valid, model: CtxModel, n_halve: int):
    """Batched adaptive update: scatter-add increments, rescale over-cap rows.

    Duplicate contexts within a wave accumulate additively (adds commute);
    the halving pass re-gathers post-add rows so duplicate writers store the
    identical value — deterministic on both encode and decode.
    """
    inc = jnp.where(valid, model.inc, 0).astype(jnp.int32)
    counts = counts.at[ctx, sym].add(inc)
    rows = counts[ctx]
    for _ in range(n_halve):
        tot = rows.sum(axis=1, keepdims=True)
        rows = jnp.where(tot > model.cap, (rows + 1) >> 1, rows)
    return counts.at[ctx].set(rows)


def _freeze_invalid(new_state, old_state, valid):
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(valid, n, o), new_state, old_state)


# ---------------------------------------------------------------------------
# Pass 1: forward model walk -> (start, freq) per symbol
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model", "n_halve"))
def _pass1(model: CtxModel, n_halve: int, counts0, ctx_grid, syms, valid):
    """Forward model walk over precomputed contexts.

    ctx_grid/syms/valid: (T, L) grids — contexts are pure functions of
    previous symbols (model.context_grids), so only the adaptive count
    tables walk through the scan.  Returns (start, freq) u16 grids and the
    final counts table."""

    def body(counts, xs):
        ctx, sym, vld = xs
        sym = sym.astype(jnp.int32)
        ctx = ctx.astype(jnp.int32)
        F = _quant(counts[ctx])
        start = jnp.take_along_axis(F, sym[:, None], axis=1)[:, 0]
        end = jnp.take_along_axis(F, sym[:, None] + 1, axis=1)[:, 0]
        counts = _wave_update(counts, ctx, sym, vld, model, n_halve)
        return counts, (start.astype(jnp.uint16),
                        (end - start).astype(jnp.uint16))

    counts, (start, freq) = lax.scan(body, counts0, (ctx_grid, syms, valid))
    return start, freq, counts


@functools.partial(jax.jit, static_argnames=("model",))
def _ctx_grids(model: CtxModel, syms, aux):
    return model.context_grids(syms, aux)


@functools.partial(jax.jit, static_argnames=("model",))
def _train_counts(model: CtxModel, syms, valid, aux):
    """Frozen-model training: one-shot histogram of (context, symbol)
    occurrences (batched over every symbol at once — no wave scan), then a
    deterministic cap rescale.  Replaces the reference's serial
    encode_*_formodel pass (SURVEY.md §3.4) with a pure bincount."""
    ctx = model.context_grids(syms, aux)
    flat = ctx.astype(jnp.int32) * model.alphabet + syms.astype(jnp.int32)
    n = model.n_ctx * model.alphabet
    flat = jnp.where(valid, flat, n).reshape(-1)  # invalid -> spill slot
    hist = jnp.zeros((n + 1,), jnp.int32)
    hist = hist.at[flat].add(model.inc)
    counts = hist[:n].reshape(model.n_ctx, model.alphabet) + model.init
    # deterministic rescale: halve rows (rounding up, keeping >=1) until
    # total <= cap; 24 halvings cover any prefix up to cap * 2^24 symbols
    for _ in range(24):
        tot = counts.sum(axis=1, keepdims=True)
        counts = jnp.where(tot > model.cap, (counts + 1) >> 1, counts)
    return counts


# ---------------------------------------------------------------------------
# Pass 2: reverse rANS arithmetic (pure, model-free)
# ---------------------------------------------------------------------------

@jax.jit
def _pass2(start, freq, valid):
    """(T, L) u16 grids -> (T, L) u16 word grid + emit mask + final states."""
    L = start.shape[1]
    x0 = jnp.full((L,), RANS_L, _U32)

    def body(x, xs):
        s, f, vld = xs
        s = s.astype(_U32)
        f = f.astype(_U32)
        # renormalize: emit one 16-bit word when x >= f << 18 (computed
        # overflow-free as (x >> 18) >= f)
        emit = ((x >> 18) >= f) & vld
        word = (x & 0xFFFF).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        f_safe = jnp.maximum(f, 1)
        q = x // f_safe
        xn = (q << PROB_BITS) + (x - q * f_safe) + s
        return jnp.where(vld, xn, x), (word, emit)

    x_final, (words, emits) = lax.scan(body, x0, (start, freq, valid),
                                       reverse=True)
    return words, emits, x_final


# ---------------------------------------------------------------------------
# Decode: single forward pass
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model", "n_halve"))
def _decode(model: CtxModel, n_halve: int, counts0, lane_state0,
            states, words, valid, aux):
    """words: (W,) u16 padded stream; states: (L,) u32 initial decoder states.
    Returns (T, L) symbol grid and final counts."""
    nwords = words.shape[0]

    def body(carry, xs):
        counts, st, x, off = carry
        vld, aux_t = xs
        ctx = model.context(st, aux_t)
        F = _quant(counts[ctx])
        low = (x & _MASK_M).astype(jnp.int32)
        sym = jnp.sum(F[:, 1:] <= low[:, None], axis=1).astype(jnp.int32)
        start = jnp.take_along_axis(F, sym[:, None], axis=1)[:, 0].astype(_U32)
        end = jnp.take_along_axis(F, sym[:, None] + 1, axis=1)[:, 0].astype(_U32)
        f = end - start
        xn = f * (x >> PROB_BITS) + (x & _MASK_M) - start
        need = (xn < RANS_L) & vld
        rank = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)
        idx = jnp.minimum(off + rank, nwords - 1)
        w = words[idx].astype(_U32)
        xn = jnp.where(need, (xn << 16) | w, xn)
        x = jnp.where(vld, xn, x)
        off = off + jnp.sum(need.astype(jnp.int32))
        counts = _wave_update(counts, ctx, sym, vld, model, n_halve)
        st = _freeze_invalid(model.update(st, sym, aux_t), st, vld)
        return (counts, st, x, off), sym.astype(jnp.uint8)

    (counts, _, x, _), syms = lax.scan(
        body, (counts0, lane_state0, states, jnp.int32(0)), (valid, aux))
    return syms, counts, x


# ---------------------------------------------------------------------------
# Host-facing stream API
# ---------------------------------------------------------------------------

_HDR = struct.Struct("<IIII")  # T, L, n_words, n_symbols


def encode_stream(model: CtxModel, params: CodecParams,
                  flat_syms: np.ndarray, counts_per_read: np.ndarray,
                  extra_aux: Optional[Dict[str, np.ndarray]] = None,
                  counts0: Optional[jnp.ndarray] = None,
                  n_lanes: Optional[int] = None,
                  return_counts: bool = False):
    """Encode one logical stream (read-major flat symbols + per-read counts).

    Returns the serialized payload:
        header(T, L, n_words, n_symbols) | L x u32 final states | words u16[]
    """
    counts_per_read = np.asarray(counts_per_read, np.int64)
    nsym = int(counts_per_read.sum())
    L = n_lanes or params.n_lanes(nsym)
    layout = make_layout(counts_per_read, L)
    valid, aux = aux_grids(layout, with_pos=True)
    if extra_aux:
        for k, v in extra_aux.items():
            aux[k] = to_grid(layout, np.asarray(v))
    syms = to_grid(layout, np.asarray(flat_syms, np.uint8))

    c0 = counts0 if counts0 is not None else init_counts(model)
    nh = _n_halve(model, L)
    syms_dev = jnp.asarray(syms)
    valid_dev = jnp.asarray(valid)
    ctx_grid = _ctx_grids(model, syms_dev, _dev_aux(aux))
    start, freq, counts_out = _pass1(
        model, nh, c0, ctx_grid, syms_dev, valid_dev)
    words, emits, x_final = _pass2(start, freq, valid_dev)

    words_np = np.asarray(words)
    emits_np = np.asarray(emits)
    stream_words = words_np[emits_np]           # (wave, lane) C-order ✓
    payload = (_HDR.pack(layout.T, L, len(stream_words), nsym)
               + np.asarray(x_final).astype("<u4").tobytes()
               + stream_words.astype("<u2").tobytes())
    if return_counts:
        return payload, counts_out
    return payload


def decode_stream(model: CtxModel, params: CodecParams,
                  payload: bytes, counts_per_read: np.ndarray,
                  extra_aux: Optional[Dict[str, np.ndarray]] = None,
                  counts0: Optional[jnp.ndarray] = None,
                  return_counts: bool = False):
    """Inverse of :func:`encode_stream` -> read-major flat symbols."""
    T, L, n_words, nsym = _HDR.unpack_from(payload, 0)
    off = _HDR.size
    states = np.frombuffer(payload, "<u4", L, off).copy()
    off += 4 * L
    words = np.frombuffer(payload, "<u2", n_words, off).copy()

    counts_per_read = np.asarray(counts_per_read, np.int64)
    assert int(counts_per_read.sum()) == nsym, "length stream mismatch"
    layout = make_layout(counts_per_read, L)
    assert layout.T == T, f"layout mismatch T={layout.T} vs {T}"
    valid, aux = aux_grids(layout, with_pos=True)
    if extra_aux:
        for k, v in extra_aux.items():
            aux[k] = to_grid(layout, np.asarray(v))

    # pad the word stream to a power-of-two bucket so the jitted decode is
    # compiled once per bucket, not once per stream length
    bucket = 1024
    while bucket < n_words + 8:
        bucket <<= 1
    words_pad = np.zeros(bucket, np.uint16)
    words_pad[:n_words] = words
    c0 = counts0 if counts0 is not None else init_counts(model)
    nh = _n_halve(model, L)
    syms, counts_out, x_end = _decode(
        model, nh, c0, model.lane_init(L),
        jnp.asarray(states, jnp.uint32), jnp.asarray(words_pad),
        jnp.asarray(valid), _dev_aux(aux))
    flat = from_grid(layout, np.asarray(syms))
    if return_counts:
        return flat, counts_out
    return flat


def _dev_aux(aux: Dict[str, np.ndarray]):
    return {k: jnp.asarray(v) for k, v in aux.items()}


def train_counts(model: CtxModel, params: CodecParams,
                 flat_syms: np.ndarray, counts_per_read: np.ndarray,
                 extra_aux: Optional[Dict[str, np.ndarray]] = None,
                 n_lanes: Optional[int] = None) -> jnp.ndarray:
    """Host-facing frozen-model trainer: histogram a training prefix into a
    capped counts table usable as ``counts0`` by encode/decode."""
    counts_per_read = np.asarray(counts_per_read, np.int64)
    nsym = int(counts_per_read.sum())
    L = n_lanes or params.n_lanes(nsym)
    layout = make_layout(counts_per_read, L)
    valid, aux = aux_grids(layout, with_pos=True)
    if extra_aux:
        for k, v in extra_aux.items():
            aux[k] = to_grid(layout, np.asarray(v))
    syms = to_grid(layout, np.asarray(flat_syms, np.uint8))
    return _train_counts(model, jnp.asarray(syms), jnp.asarray(valid),
                         _dev_aux(aux))
