"""Host-side serial adaptive range coder for small streams.

Bit-identical twin of native/rangecoder.cpp (role parity: the reference's
per-symbol range coder + SIMPLE_MODEL, SURVEY.md §2.1).  Small per-block
streams (flags, lengths, ID bytes, mismatch metadata) are coded on the host
to avoid paying a device round-trip (~36 ms over the TPU tunnel) per
stream; big streams go through the wave-rANS device engine.

The native C++ implementation is used when available; this module holds the
pure-Python mirror (used as fallback and as the oracle in the cross tests)
plus the dispatch layer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from fastqueeze_tpu.io import native

_TOP = 1 << 24
_M32 = 0xFFFFFFFF


class _Model:
    __slots__ = ("counts", "totals", "A", "inc", "cap")

    def __init__(self, n_ctx: int, alphabet: int, init: int, inc: int,
                 cap: int):
        self.counts = np.full((n_ctx, alphabet), init, np.uint32)
        self.totals = np.full(n_ctx, init * alphabet, np.uint32)
        self.A = alphabet
        self.inc = inc
        self.cap = cap

    def update(self, ctx: int, sym: int) -> None:
        row = self.counts[ctx]
        row[sym] += self.inc
        t = int(self.totals[ctx]) + self.inc
        if t > self.cap:
            np.add(row, 1, out=row)
            np.right_shift(row, 1, out=row)
            t = int(row.sum())
        self.totals[ctx] = t


class _REnc:
    def __init__(self):
        self.low = 0
        self.range = _M32
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if (self.low & _M32) < 0xFF000000 or (self.low >> 32):
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            self.cache_size -= 1
            while self.cache_size:
                self.out.append((0xFF + carry) & 0xFF)
                self.cache_size -= 1
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & _M32

    def encode(self, start: int, size: int, total: int):
        r = self.range // total
        self.low += start * r
        self.range = size * r
        while self.range < _TOP:
            self._shift_low()
            self.range = (self.range << 8) & _M32

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class _RDec:
    def __init__(self, data: bytes):
        self.range = _M32
        self.data = data
        self.pos = 1                      # first encoder byte is always 0
        self.code = 0
        for _ in range(4):
            self.code = ((self.code << 8) | self._get()) & _M32

    def _get(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode_freq(self, total: int):
        r = self.range // total
        v = self.code // r
        return (total - 1 if v >= total else v), r

    def decode_update(self, start: int, size: int, r: int):
        self.code = (self.code - start * r) & _M32
        self.range = size * r
        while self.range < _TOP:
            self.code = ((self.code << 8) | self._get()) & _M32
            self.range = (self.range << 8) & _M32


def _py_encode_ctx(syms, ctx, n_ctx, alphabet, init, inc, cap) -> bytes:
    m = _Model(n_ctx, alphabet, init, inc, cap)
    enc = _REnc()
    zero = np.zeros(len(syms), np.uint32)
    cx = ctx if ctx is not None else zero
    for s, c in zip(syms.tolist(), cx.tolist()):
        row = m.counts[c]
        start = int(row[:s].sum())
        enc.encode(start, int(row[s]), int(m.totals[c]))
        m.update(c, s)
    return enc.flush()


def _py_decode_ctx(data, n, ctx, n_ctx, alphabet, init, inc, cap):
    m = _Model(n_ctx, alphabet, init, inc, cap)
    dec = _RDec(data)
    out = np.empty(n, np.uint8)
    cx = ctx if ctx is not None else np.zeros(n, np.uint32)
    for i in range(n):
        c = int(cx[i])
        row = m.counts[c]
        f, r = dec.decode_freq(int(m.totals[c]))
        start = 0
        s = 0
        while start + int(row[s]) <= f:
            start += int(row[s])
            s += 1
        dec.decode_update(start, int(row[s]), r)
        out[i] = s
        m.update(c, s)
    return out


def _py_encode_o1(syms, alphabet, init, inc, cap) -> bytes:
    m = _Model(alphabet, alphabet, init, inc, cap)
    enc = _REnc()
    prev = 0
    for s in syms.tolist():
        row = m.counts[prev]
        start = int(row[:s].sum())
        enc.encode(start, int(row[s]), int(m.totals[prev]))
        m.update(prev, s)
        prev = s
    return enc.flush()


def _py_decode_o1(data, n, alphabet, init, inc, cap):
    m = _Model(alphabet, alphabet, init, inc, cap)
    dec = _RDec(data)
    out = np.empty(n, np.uint8)
    prev = 0
    for i in range(n):
        row = m.counts[prev]
        f, r = dec.decode_freq(int(m.totals[prev]))
        start = 0
        s = 0
        while start + int(row[s]) <= f:
            start += int(row[s])
            s += 1
        dec.decode_update(start, int(row[s]), r)
        out[i] = s
        m.update(prev, s)
        prev = s
    return out


# ---------------------------------------------------------------------------
# Dispatch layer (native when available)
# ---------------------------------------------------------------------------

def encode_ctx(syms: np.ndarray, ctx: Optional[np.ndarray], n_ctx: int,
               alphabet: int, init: int, inc: int, cap: int) -> bytes:
    syms = np.ascontiguousarray(syms, np.uint8)
    cx = (np.ascontiguousarray(ctx, np.uint32)
          if ctx is not None else None)
    blob = native.rc_encode_ctx(syms, cx, n_ctx, alphabet, init, inc, cap)
    if blob is not None:
        return blob
    return _py_encode_ctx(syms, cx, n_ctx, alphabet, init, inc, cap)


def decode_ctx(data: bytes, n: int, ctx: Optional[np.ndarray], n_ctx: int,
               alphabet: int, init: int, inc: int, cap: int) -> np.ndarray:
    cx = (np.ascontiguousarray(ctx, np.uint32)
          if ctx is not None else None)
    out = native.rc_decode_ctx(data, n, cx, n_ctx, alphabet, init, inc, cap)
    if out is not None:
        return out
    return _py_decode_ctx(data, n, cx, n_ctx, alphabet, init, inc, cap)


def encode_o1(syms: np.ndarray, alphabet: int, init: int, inc: int,
              cap: int) -> bytes:
    syms = np.ascontiguousarray(syms, np.uint8)
    blob = native.rc_encode_o1(syms, alphabet, init, inc, cap)
    if blob is not None:
        return blob
    return _py_encode_o1(syms, alphabet, init, inc, cap)


def decode_o1(data: bytes, n: int, alphabet: int, init: int, inc: int,
              cap: int) -> np.ndarray:
    out = native.rc_decode_o1(data, n, alphabet, init, inc, cap)
    if out is not None:
        return out
    return _py_decode_o1(data, n, alphabet, init, inc, cap)
