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
    """Base: order-0 (single context) adaptive model."""

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


@dataclass(frozen=True)
class FlatModel(CtxModel):
    """Context supplied externally per symbol via ``aux['ctx']``.

    Used for streams whose context is a pure function of position (e.g.
    length bytes — the reference's 4× SIMPLE_MODEL<256>, SURVEY.md §2.1) or
    precomputed stream metadata.
    """

    def context(self, state, aux):
        return aux["ctx"].astype(jnp.int32)


@dataclass(frozen=True)
class Order1ByteModel(CtxModel):
    """Context = previous symbol; resets to 0 at each read start."""

    def lane_init(self, L: int):
        return {"prev": jnp.zeros((L,), jnp.int32)}

    def context(self, state, aux):
        return jnp.where(aux["start"], 0, state["prev"])

    def update(self, state, sym, aux):
        return {"prev": sym.astype(jnp.int32)}


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
        ctx = ((jnp.maximum(q1, q2) << 6) + q1) & 0xFFF
        if self.qlevel >= 2:
            ctx = ctx + jnp.where(q1 == q2, 0x1000, 0)
            ctx = ctx + ((jnp.minimum(drops, 56) & ~7) << 10)
        if self.qlevel >= 3:
            pos = aux["pos"].astype(jnp.int32)
            ctx = ctx + (jnp.minimum(pos >> 3, 15) << 16)
        return ctx

    def update(self, state, sym, aux):
        q1, q2, drops = self._eff(state, aux)
        sym = sym.astype(jnp.int32)
        return {
            "q1": sym,
            "q2": q1,
            "drops": drops + jnp.maximum(0, q1 - sym),
        }


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
