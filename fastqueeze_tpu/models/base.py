"""Adaptive context models for the wave-synchronized rANS engine.

Capability parity with the reference's model zoo (SURVEY.md §2.1,
srcfile:EncapFqzComp.cpp): SIMPLE_MODEL<N> byte/flag models, the 2-bit
sequence context model (encode_seq @0x421f30: rolling ``(ctx<<2)|base``
over ``slevel+7`` previous bases, reset to 0x007616C7 per read), and the
fqzcomp quality context model (encode_qual @0x422180: q1/q2/Σdrops/pos
formula).

Each model is a hashable frozen dataclass (usable as a jit static arg) with
three pure functions over per-lane state pytrees:

* ``lane_init(L)``   -> state pytree of (L,) arrays
* ``context(state, aux)`` -> (L,) int32 context ids, aux = dict of (L,) arrays
* ``update(state, sym, aux)`` -> next state (the engine freezes state on
  invalid lanes)

The engine guarantees that ``context``/``update`` are called in the exact
same wave order on encode and decode, so adaptive state stays in lockstep.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fastqueeze_tpu.config import SEQ_CTX_START, CodecParams


@dataclass(frozen=True)
class CtxModel:
    """Base: order-0 (single context) adaptive model.

    Two context interfaces:

    * ``context``/``update`` — stateful per-wave walk, used by the DECODER
      (symbols are unknown until decoded).
    * ``context_grids(syms, aux)`` — vectorized (T, L) context construction,
      used by the ENCODER and the frozen-model trainer.  Contexts are pure
      functions of *previous* symbols, so the whole grid is computable
      without the wave scan.  Must agree bit-for-bit with the stateful walk
      (the round-trip tests enforce this).
    """

    alphabet: int
    init: int = 1
    inc: int = 16
    cap: int = 8192
    n_ctx: int = 1

    def lane_init(self, L: int):
        return {"_": jnp.zeros((L,), jnp.int32)}

    def context(self, state, aux):
        return jnp.zeros_like(state["_"])

    def update(self, state, sym, aux):
        return state

    def context_grids(self, syms, aux):
        """syms/aux: (T, L) grids -> (T, L) int32 context ids."""
        return jnp.zeros(syms.shape, jnp.int32)


@dataclass(frozen=True)
class FlatModel(CtxModel):
    """Context supplied externally per symbol via ``aux['ctx']``.

    Used for streams whose context is a pure function of position (e.g.
    length bytes — the reference's 4× SIMPLE_MODEL<256>, SURVEY.md §2.1) or
    precomputed stream metadata.
    """

    def context(self, state, aux):
        return aux["ctx"].astype(jnp.int32)

    def context_grids(self, syms, aux):
        return aux["ctx"].astype(jnp.int32)


@dataclass(frozen=True)
class Order1ByteModel(CtxModel):
    """Context = previous symbol; resets to 0 at each read start."""

    def __post_init__(self):
        object.__setattr__(self, "n_ctx", self.alphabet)

    def lane_init(self, L: int):
        return {"prev": jnp.zeros((L,), jnp.int32)}

    def context(self, state, aux):
        return jnp.where(aux["start"], 0, state["prev"])

    def update(self, state, sym, aux):
        return {"prev": sym.astype(jnp.int32)}

    def context_grids(self, syms, aux):
        prev = jnp.roll(syms.astype(jnp.int32), 1, axis=0).at[0].set(0)
        return jnp.where(aux["start"], 0, prev)


@dataclass(frozen=True)
class SeqModel(CtxModel):
    """2-bit base model: context = previous ``order`` bases.

    Reference: encode_seq @0x421f30 — ``ctx = ((ctx<<2)|base) & NS_MASK``,
    reset to ``0x007616C7 & NS_MASK`` at every read start; 4×u8 counters per
    context, init 3, halve when total > 0xFD (SURVEY.md §2.1).
    """

    order: int = 10

    def __post_init__(self):
        object.__setattr__(self, "n_ctx", 1 << (2 * self.order))

    @property
    def mask(self) -> int:
        return (1 << (2 * self.order)) - 1

    def lane_init(self, L: int):
        return {"h": jnp.full((L,), SEQ_CTX_START & self.mask, jnp.uint32)}

    def _eff(self, state, aux):
        return jnp.where(aux["start"],
                         jnp.uint32(SEQ_CTX_START & self.mask), state["h"])

    def context(self, state, aux):
        return (self._eff(state, aux) & jnp.uint32(self.mask)).astype(jnp.int32)

    def update(self, state, sym, aux):
        h = self._eff(state, aux)
        return {"h": ((h << 2) | sym.astype(jnp.uint32)) & jnp.uint32(self.mask)}

    def context_grids(self, syms, aux):
        """Vectorized equivalent of the rolling-register walk: the context at
        in-read position p is ((MAGIC << 2p) | pack(last min(p, order) bases))
        & mask — built from `order` shifted copies of the symbol grid."""
        pos = aux["pos"].astype(jnp.int32)
        s = syms.astype(jnp.uint32)
        acc = jnp.zeros(syms.shape, jnp.uint32)
        for j in range(1, self.order + 1):
            prev_j = jnp.roll(s, j, axis=0)
            acc = acc | jnp.where(pos >= j, prev_j, jnp.uint32(0)) << (2 * (j - 1))
        magic = jnp.uint32(SEQ_CTX_START & self.mask)
        shift = (jnp.minimum(pos, self.order) * 2).astype(jnp.uint32)
        magic_part = jnp.where(pos < self.order, (magic << shift), jnp.uint32(0))
        return ((acc | magic_part) & jnp.uint32(self.mask)).astype(jnp.int32)


@dataclass(frozen=True)
class QualModel(CtxModel):
    """fqzcomp quality context (reference encode_qual @0x422180).

    ctx  = ((max(q1,q2) << 6) + q1) & 0xFFF
         + 0x1000 * (q1 == q2)                      (qlevel >= 2)
         + ((min(drops, 56) & ~7) << 10)            (qlevel >= 2; bits 13-15)
         + (min(pos >> 3, 15) << 16)                (qlevel >= 3; bits 16-19)

    drops accumulates max(0, q_{i-1} - q_i), starting at q_drop_init per
    read (SURVEY.md §2.1).  n_ctx = 2^16 (qlevel<=2) or 2^20 (qlevel 3).

    Rank-chain scheme (k >= 2, no reference equivalent): the engine codes
    dense quality RANKS, so for small trained alphabets exact conditioning
    on the last k ranks beats the fqzcomp bit-mash:

    ctx  = (((q1'*B + q2')*B ... qk') << (drop_bits+pos_bits))
         | (min(drops >> 3, 2^drop_bits - 1) << pos_bits)
         | min(pos >> 4, 2^pos_bits - 1)

    with qj' = min(qj, B-1), B = ctx_base (the trained rank alphabet —
    later blocks may append OOV ranks; conditioning clamps them).
    n_ctx = B^k << (drop_bits + pos_bits).  Chosen data-driven at
    frozen-train time (pipeline/frozen.py _pick_qctx), serialized in
    CodecParams (qctx_*).
    """

    qlevel: int = 2
    drop_init: int = 5
    k: int = 0                      # 0 = fqzcomp formula; >=2 = rank chain
    ctx_base: int = 0
    drop_bits: int = 0
    pos_bits: int = 0
    hash_bits: int = 0              # >0: Knuth-hash the chain to 2^b rows

    def __post_init__(self):
        if self.k >= 2:
            rows = ((1 << self.hash_bits) if self.hash_bits
                    else self.ctx_base ** self.k)
            n = rows << (self.drop_bits + self.pos_bits)
        else:
            n = (1 << 20) if self.qlevel >= 3 else (1 << 16)
        object.__setattr__(self, "n_ctx", n)

    def lane_init(self, L: int):
        z = jnp.zeros((L,), jnp.int32)
        st = {"q1": z, "q2": z, "drops": z + self.drop_init}
        for j in range(3, self.k + 1):
            st[f"q{j}"] = z
        return st

    def _eff(self, state, aux):
        start = aux["start"]
        q1 = jnp.where(start, 0, state["q1"])
        q2 = jnp.where(start, 0, state["q2"])
        drops = jnp.where(start, self.drop_init, state["drops"])
        qk = [jnp.where(start, 0, state[f"q{j}"])
              for j in range(3, self.k + 1)]
        return q1, q2, drops, qk

    def context(self, state, aux):
        q1, q2, drops, qk = self._eff(state, aux)
        pos = aux["pos"].astype(jnp.int32)
        return self._ctx_of([q1, q2] + qk, drops, pos)

    def update(self, state, sym, aux):
        q1, q2, drops, qk = self._eff(state, aux)
        sym = sym.astype(jnp.int32)
        st = {
            "q1": sym,
            "q2": q1,
            "drops": drops + jnp.maximum(0, q1 - sym),
        }
        prev = q2
        for j in range(3, self.k + 1):
            st[f"q{j}"] = prev
            prev = qk[j - 3]
        return st

    def _ctx_of(self, qs, drops, pos):
        if self.k >= 2:
            b = self.ctx_base
            ctx = jnp.minimum(qs[0], b - 1)
            for qj in qs[1:self.k]:
                ctx = ctx * b + jnp.minimum(qj, b - 1)
            if self.hash_bits:
                # Knuth multiplicative hash on the wrapping uint32 ring,
                # low bits kept (measured better than high bits on real
                # quality data) — bit-identical in jnp (x64 off), numpy, C
                h = (ctx.astype(jnp.uint32) * jnp.uint32(2654435761)
                     ) & jnp.uint32((1 << self.hash_bits) - 1)
                ctx = h.astype(jnp.int32)
            if self.drop_bits:
                ctx = (ctx << self.drop_bits) | jnp.minimum(
                    drops >> 3, (1 << self.drop_bits) - 1)
            if self.pos_bits:
                ctx = (ctx << self.pos_bits) | jnp.minimum(
                    pos >> 4, (1 << self.pos_bits) - 1)
            return ctx
        q1, q2 = qs[0], qs[1]
        if self.qlevel < 3:
            pos = 0
        ctx = ((jnp.maximum(q1, q2) << 6) + q1) & 0xFFF
        if self.qlevel >= 2:
            ctx = ctx + jnp.where(q1 == q2, 0x1000, 0)
            ctx = ctx + ((jnp.minimum(drops, 56) & ~7) << 10)
        if self.qlevel >= 3:
            ctx = ctx + (jnp.minimum(pos >> 3, 15) << 16)
        return ctx

    def context_grids(self, syms, aux):
        """Vectorized q1..qk via in-lane shifts; Σdrops via a segmented
        (per-read) cumulative sum along the wave axis."""
        pos = aux["pos"].astype(jnp.int32)
        q = syms.astype(jnp.int32)
        qs = [jnp.where(pos >= j, jnp.roll(q, j, axis=0), 0)
              for j in range(1, max(self.k, 2) + 1)]
        q1 = qs[0]
        d = jnp.where(pos >= 1, jnp.maximum(0, q1 - q), 0)
        cs = jnp.cumsum(d, axis=0)
        csx = cs - d
        t_idx = jnp.arange(syms.shape[0], dtype=jnp.int32)[:, None]
        start_t = t_idx - pos
        base = jnp.take_along_axis(csx, start_t, axis=0)
        drops = jnp.where(pos >= 1,
                          self.drop_init + jnp.roll(cs, 1, axis=0) - base,
                          self.drop_init)
        return self._ctx_of(qs, drops, pos).astype(jnp.int32)


def seq_model_from_params(p: CodecParams) -> SeqModel:
    return SeqModel(alphabet=4, init=p.seq_init, inc=p.seq_inc,
                    cap=p.seq_cap, order=p.seq_order())


def qual_model_from_params(p: CodecParams) -> QualModel:
    return qual_model_for(p, p.qual_alphabet())


def qual_model_for(p: CodecParams, alphabet: int) -> QualModel:
    """QualModel with the archive's context scheme at a given (per-block)
    alphabet — the single construction point for encode and decode."""
    return QualModel(alphabet=alphabet, init=p.qual_init,
                     inc=p.qual_inc, cap=p.qual_cap, qlevel=p.qlevel,
                     drop_init=p.q_drop_init, k=p.qctx_k,
                     ctx_base=p.qctx_base, drop_bits=p.qctx_drop_bits,
                     pos_bits=p.qctx_pos_bits, hash_bits=p.qctx_hash_bits)


def byte_model(p: CodecParams, order1: bool = True) -> CtxModel:
    cls = Order1ByteModel if order1 else CtxModel
    return cls(alphabet=256, init=p.byte_init, inc=p.byte_inc,
               cap=p.byte_cap, n_ctx=256 if order1 else 1)


def flag_model(p: CodecParams, n_ctx: int = 1) -> CtxModel:
    if n_ctx == 1:
        return CtxModel(alphabet=2, init=p.byte_init, inc=p.byte_inc,
                        cap=p.byte_cap)
    return FlatModel(alphabet=2, init=p.byte_init, inc=p.byte_inc,
                     cap=p.byte_cap, n_ctx=n_ctx)
