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
    """

    qlevel: int = 2
    drop_init: int = 5

    def __post_init__(self):
        object.__setattr__(self, "n_ctx",
                           (1 << 20) if self.qlevel >= 3 else (1 << 16))

    def lane_init(self, L: int):
        z = jnp.zeros((L,), jnp.int32)
        return {"q1": z, "q2": z, "drops": z + self.drop_init}

    def _eff(self, state, aux):
        start = aux["start"]
        q1 = jnp.where(start, 0, state["q1"])
        q2 = jnp.where(start, 0, state["q2"])
        drops = jnp.where(start, self.drop_init, state["drops"])
        return q1, q2, drops

    def context(self, state, aux):
        q1, q2, drops = self._eff(state, aux)
        pos = aux["pos"].astype(jnp.int32) if self.qlevel >= 3 else 0
        return self._ctx_of(q1, q2, drops, pos)

    def update(self, state, sym, aux):
        q1, q2, drops = self._eff(state, aux)
        sym = sym.astype(jnp.int32)
        return {
            "q1": sym,
            "q2": q1,
            "drops": drops + jnp.maximum(0, q1 - sym),
        }

    def _ctx_of(self, q1, q2, drops, pos):
        ctx = ((jnp.maximum(q1, q2) << 6) + q1) & 0xFFF
        if self.qlevel >= 2:
            ctx = ctx + jnp.where(q1 == q2, 0x1000, 0)
            ctx = ctx + ((jnp.minimum(drops, 56) & ~7) << 10)
        if self.qlevel >= 3:
            ctx = ctx + (jnp.minimum(pos >> 3, 15) << 16)
        return ctx

    def context_grids(self, syms, aux):
        """Vectorized q1/q2 via in-lane shifts; Σdrops via a segmented
        (per-read) cumulative sum along the wave axis."""
        pos = aux["pos"].astype(jnp.int32)
        q = syms.astype(jnp.int32)
        q1 = jnp.where(pos >= 1, jnp.roll(q, 1, axis=0), 0)
        q2 = jnp.where(pos >= 2, jnp.roll(q, 2, axis=0), 0)
        d = jnp.where(pos >= 1, jnp.maximum(0, q1 - q), 0)
        cs = jnp.cumsum(d, axis=0)
        csx = cs - d
        t_idx = jnp.arange(syms.shape[0], dtype=jnp.int32)[:, None]
        start_t = t_idx - pos
        base = jnp.take_along_axis(csx, start_t, axis=0)
        drops = jnp.where(pos >= 1,
                          self.drop_init + jnp.roll(cs, 1, axis=0) - base,
                          self.drop_init)
        return self._ctx_of(q1, q2, drops, pos).astype(jnp.int32)


def seq_model_from_params(p: CodecParams) -> SeqModel:
    return SeqModel(alphabet=4, init=p.seq_init, inc=p.seq_inc,
                    cap=p.seq_cap, order=p.seq_order())


def qual_model_from_params(p: CodecParams) -> QualModel:
    return QualModel(alphabet=p.qual_alphabet(), init=p.qual_init,
                     inc=p.qual_inc, cap=p.qual_cap, qlevel=p.qlevel,
                     drop_init=p.q_drop_init)


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
