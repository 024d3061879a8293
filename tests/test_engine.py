"""Round-trip tests for the wave-synchronized adaptive rANS engine."""

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.models.base import (
    CtxModel, Order1ByteModel, QualModel, SeqModel)
from fastqueeze_tpu.ops.engine import decode_stream, encode_stream

P = CodecParams(lanes_min=16, lanes_max=64, lane_target_symbols=256)


def _roundtrip(model, flat, counts, **kw):
    payload = encode_stream(model, P, flat, counts, **kw)
    back = decode_stream(model, P, payload, counts, **kw)
    np.testing.assert_array_equal(back, flat)
    return payload


def test_order0_uniform():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, 120, size=200)
    flat = rng.integers(0, 256, size=int(counts.sum())).astype(np.uint8)
    model = CtxModel(alphabet=256, init=1, inc=16, cap=8192)
    _roundtrip(model, flat, counts)


def test_order0_skewed_compresses():
    rng = np.random.default_rng(1)
    counts = np.full(300, 100)
    flat = rng.choice(np.arange(4, dtype=np.uint8), p=[0.85, 0.05, 0.05, 0.05],
                      size=int(counts.sum()))
    model = CtxModel(alphabet=4, init=1, inc=16, cap=8192)
    payload = _roundtrip(model, flat, counts)
    # entropy ~0.85 bits/sym -> ~3.2KB of 30K symbols; allow engine overhead
    assert len(payload) < 6000


def test_order1_bytes():
    rng = np.random.default_rng(2)
    counts = rng.integers(0, 60, size=150)
    n = int(counts.sum())
    # Markov-ish: next byte near previous
    flat = np.cumsum(rng.integers(-2, 3, size=n)).astype(np.uint8)
    model = Order1ByteModel(alphabet=256, init=1, inc=16, cap=8192)
    _roundtrip(model, flat, counts)


def test_seq_model():
    rng = np.random.default_rng(3)
    counts = np.full(500, 100)
    n = int(counts.sum())
    # repetitive DNA-like data: repeated motif with noise
    motif = rng.integers(0, 4, size=37)
    flat = np.tile(motif, n // 37 + 1)[:n].astype(np.uint8)
    noise = rng.random(n) < 0.02
    flat[noise] = rng.integers(0, 4, size=int(noise.sum()))
    model = SeqModel(alphabet=4, init=3, inc=1, cap=253, order=8)
    payload = _roundtrip(model, flat, counts)
    assert len(payload) < n / 8  # strongly compressible

def test_qual_model():
    rng = np.random.default_rng(4)
    counts = np.full(400, 100)
    n = int(counts.sum())
    # quality-like data: smooth random walk in [0, 40)
    flat = np.clip(np.cumsum(rng.integers(-3, 4, size=n)) % 80, 0, 39)
    flat = np.abs(flat.astype(np.int64) - 40).astype(np.uint8)
    flat = np.clip(flat, 0, 39)
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    _roundtrip(model, flat, counts)


def test_mode15_transfer_pack_payload_identical(monkeypatch):
    """Skewed dense-rank data rides the 4-bit+exceptions h2d pack (mode
    15); it is a transfer-layer representation only, so the payload must
    be byte-identical to the plain 6-bit pack and round-trip exactly."""
    import fastqueeze_tpu.ops.engine as E
    rng = np.random.default_rng(11)
    counts = np.full(300, 100)
    n = int(counts.sum())
    # real qual ranks are VALUE-sorted, so the frequent symbols sit at
    # HIGH ranks — the pack must pick them by frequency, not position
    flat = np.where(rng.random(n) < 0.94, rng.integers(28, 40, n),
                    rng.integers(0, 28, n)).astype(np.uint8)
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    # honest byte accounting: on a tiny grid the pow-4 sidecar padding
    # outweighs the nibble saving, so the selector must keep the flat
    # pack (it used to pick a LARGER transfer here)
    assert E._pack_for_upload(flat[:4096].reshape(64, 64), 6)[0] == 6
    # shrink the bucket quantum to exercise the sentinel path
    monkeypatch.setattr(
        E, "_exc_bucket", lambda n: -(-max(n, 1) // 256) * 256)
    # confirm the pack-mode selector actually fires on this data
    grid = flat[:4096].reshape(64, 64)
    assert E._pack_for_upload(grid, 6)[0] == 15
    payload15 = _roundtrip(model, flat, counts)
    monkeypatch.setattr(E, "_EXC_FRAC_MAX", -1.0)   # force plain 6-bit
    payload6 = _roundtrip(model, flat, counts)
    assert payload15 == payload6


def test_mode23_transfer_pack_payload_identical(monkeypatch):
    """Binned-qual-like data (few dominant symbols of a <=16 alphabet)
    rides the 2-bit+sidecar pack (mode 23); payload must be byte-equal
    to the plain 4-bit pack."""
    import fastqueeze_tpu.ops.engine as E
    rng = np.random.default_rng(12)
    counts = np.full(200, 100)
    n = int(counts.sum())
    flat = np.where(rng.random(n) < 0.93,
                    rng.choice([5, 7, 2], n, p=[0.5, 0.3, 0.2]),
                    rng.integers(0, 12, n)).astype(np.uint8)
    model = QualModel(alphabet=16, init=1, inc=8, cap=8192, qlevel=2)
    monkeypatch.setattr(
        E, "_exc_bucket", lambda n: -(-max(n, 1) // 256) * 256)
    grid = flat[:4096].reshape(64, 64)
    assert E._pack_for_upload(grid, 4)[0] == 23
    payload23 = _roundtrip(model, flat, counts)
    monkeypatch.setattr(E, "_EXC_FRAC_MAX", -1.0)   # force plain 4-bit
    payload4 = _roundtrip(model, flat, counts)
    assert payload23 == payload4


def test_speculative_words_fetch_identical(monkeypatch):
    """finalize()'s single-round-trip speculative fetch (second block
    onward, primed by _NWORDS_EST) and the deliberately-undersized
    fallback path must serialize byte-identical payloads."""
    import fastqueeze_tpu.ops.engine as E
    rng = np.random.default_rng(13)
    counts = np.full(200, 100)
    flat = rng.integers(0, 40, size=int(counts.sum())).astype(np.uint8)
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    E._NWORDS_EST.clear()
    E._DEXC_EST.clear()
    cold = encode_stream(model, P, flat, counts)     # no estimate yet
    warm = encode_stream(model, P, flat, counts)     # speculative path
    assert warm == cold
    # poison the estimate (and shrink the bucket quantum so the 32k-word
    # floor can't mask it): the speculative fetch under-shoots and the
    # refetch fallback must run and still serialize identical bytes
    monkeypatch.setattr(
        E, "_wbucket",
        lambda n, cap, q=256: min(-(-max(n, 1) // 256) * 256, cap))
    key = next(iter(E._NWORDS_EST))
    E._NWORDS_EST[key] = 1
    short = encode_stream(model, P, flat, counts)
    assert short == cold
    np.testing.assert_array_equal(
        decode_stream(model, P, short, counts), flat)
    E._NWORDS_EST.clear()


def test_sentinel_decode_fetch_identical():
    """Decode d2h sentinel path: cold fetch (plain grid, primes the
    sidecar estimate), warm speculative fetch, poisoned under-fetch and
    dense-data overflow must all reconstruct identical symbols."""
    import fastqueeze_tpu.ops.engine as E
    rng = np.random.default_rng(14)
    counts = np.full(200, 100)
    n = int(counts.sum())
    flat = np.where(rng.random(n) < 0.94, rng.integers(28, 40, n),
                    rng.integers(0, 28, n)).astype(np.uint8)
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    payload = encode_stream(model, P, flat, counts)
    E._DEXC_EST.clear()
    cold = decode_stream(model, P, payload, counts)    # plain, primes est
    np.testing.assert_array_equal(cold, flat)
    assert E._DEXC_EST, "estimate not primed"
    warm = decode_stream(model, P, payload, counts)    # sentinel fetch
    np.testing.assert_array_equal(warm, flat)
    key = next(iter(E._DEXC_EST))
    E._DEXC_EST[key] = 1                               # force under-fetch
    old_q = E._DFETCH_Q
    E._DFETCH_Q = 64       # keep the fetch quantum below the real count
    try:
        short = decode_stream(model, P, payload, counts)
    finally:
        E._DFETCH_Q = old_q
    np.testing.assert_array_equal(short, flat)
    # dense data: sidecar overflows its size/4 cap -> plain fallback
    dense = rng.integers(0, 40, n).astype(np.uint8)
    pd = encode_stream(model, P, dense, counts)
    E._DEXC_EST.clear()
    decode_stream(model, P, pd, counts)                # prime (big est)
    back = decode_stream(model, P, pd, counts)
    np.testing.assert_array_equal(back, dense)
    E._DEXC_EST.clear()


@pytest.mark.slow
def test_frozen_ternary_search_roundtrip():
    """Frozen decode resolves symbols by the ternary-tree descent for
    every alphabet where it saves gathers (A=5/8/40/96 cover the
    un-padded, binned-qual, classic-qual and wide-qual shapes, plus
    clamped padding terciles and zero-frequency tail ranks)."""
    from fastqueeze_tpu.ops.engine import train_counts
    rng = np.random.default_rng(21)
    for A in (5, 8, 40, 96):
        counts = np.full(150, 100)
        n = int(counts.sum())
        flat = np.where(rng.random(n) < 0.9,
                        rng.integers(max(0, A - 12), A, n),
                        rng.integers(0, A, n)).astype(np.uint8)
        model = QualModel(alphabet=A, init=1, inc=8, cap=8192, qlevel=2)
        c0 = train_counts(model, P, flat, counts)
        pay = encode_stream(model, P, flat, counts, counts0=c0,
                            adapt=False)
        back = decode_stream(model, P, pay, counts, counts0=c0,
                             adapt=False)
        np.testing.assert_array_equal(back, flat)


@pytest.mark.slow
def test_qual_model_qlevel3_pos_aux():
    rng = np.random.default_rng(5)
    counts = rng.integers(1, 150, size=100)
    n = int(counts.sum())
    flat = rng.integers(0, 40, size=n).astype(np.uint8)
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=3)
    _roundtrip(model, flat, counts)


def test_variable_lengths_with_zeros():
    rng = np.random.default_rng(6)
    counts = rng.integers(0, 10, size=50)
    counts[::7] = 0
    flat = rng.integers(0, 4, size=int(counts.sum())).astype(np.uint8)
    model = SeqModel(alphabet=4, init=3, inc=1, cap=253, order=4)
    _roundtrip(model, flat, counts)


def test_empty_stream():
    model = CtxModel(alphabet=4, init=1, inc=16, cap=8192)
    counts = np.zeros(5, dtype=np.int64)
    flat = np.zeros(0, dtype=np.uint8)
    _roundtrip(model, flat, counts)


def test_frozen_counts_roundtrip():
    """counts0 passed in (frozen-model mode) must roundtrip too."""
    from fastqueeze_tpu.ops.engine import init_counts
    rng = np.random.default_rng(7)
    model = CtxModel(alphabet=16, init=1, inc=16, cap=4096)
    # train counts on one stream
    counts_a = np.full(50, 64)
    flat_a = rng.integers(0, 16, size=int(counts_a.sum())).astype(np.uint8)
    _, trained = encode_stream(model, P, flat_a, counts_a, return_counts=True)
    # use trained counts as the frozen prior for another stream
    counts_b = np.full(30, 64)
    flat_b = rng.integers(0, 16, size=int(counts_b.sum())).astype(np.uint8)
    payload = encode_stream(model, P, flat_b, counts_b, counts0=trained)
    back = decode_stream(model, P, payload, counts_b, counts0=trained)
    np.testing.assert_array_equal(back, flat_b)


def test_property_roundtrip_random_models():
    """Property test: random alphabets/contexts/params round-trip through
    the wave engine (hypothesis-style, seeded loop to keep CPU time low)."""
    import numpy as np
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.models.base import CtxModel, Order1ByteModel
    from fastqueeze_tpu.ops.engine import decode_stream, encode_stream
    rng = np.random.default_rng(123)
    for trial in range(4):
        A = int(rng.choice([2, 5, 17, 64]))
        R = int(rng.integers(1, 40))
        counts = rng.integers(0, 50, R).astype(np.int64)
        syms = rng.integers(0, A, int(counts.sum())).astype(np.uint8)
        p = CodecParams(lanes_min=8, lanes_max=16, lane_target_symbols=64)
        cls = Order1ByteModel if trial % 2 else CtxModel
        model = cls(alphabet=A, init=1, inc=8, cap=4096,
                    n_ctx=A if trial % 2 else 1)
        payload = encode_stream(model, p, syms, counts)
        back = decode_stream(model, p, payload, counts)
        assert np.array_equal(back, syms), f"trial {trial}"


@pytest.mark.slow
def test_semi_adaptive_roundtrip():
    """adapt_chunk > 0: chunked semi-adaptive walk (snapshot requantized
    every chunk waves) must round-trip across models and ragged lengths."""
    from fastqueeze_tpu.models.base import QualModel, SeqModel
    rng = np.random.default_rng(7)
    p = CodecParams(lanes_min=8, lanes_max=32, lane_target_symbols=256,
                    adapt_chunk=16)
    counts = rng.integers(0, 40, 30)
    n = int(counts.sum())
    for model, hi in ((Order1ByteModel(alphabet=256, init=1, inc=16,
                                       cap=8192), 256),
                      (SeqModel(alphabet=4, init=3, inc=1, cap=253,
                                order=6), 4),
                      (QualModel(alphabet=48, init=1, inc=8, cap=8192,
                                 qlevel=2), 42)):
        flat = rng.integers(0, hi, n).astype(np.uint8)
        payload = encode_stream(model, p, flat, counts)
        out = decode_stream(model, p, payload, counts)
        assert np.array_equal(out, flat)


def test_wide_alphabet_unpacked_transfer():
    """Alphabet > 64 rides the pack-mode-0 (raw) transfer path — e.g.
    full-range PacBio-style qualities with > 64 distinct values."""
    import numpy as np

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.models.base import QualModel
    from fastqueeze_tpu.ops.engine import decode_stream, encode_stream

    rng = np.random.default_rng(9)
    p = CodecParams(lanes_min=16, lanes_max=32, lane_target_symbols=256)
    model = QualModel(alphabet=96, init=1, inc=8, cap=8192, qlevel=2)
    lengths = rng.integers(20, 80, 50)
    syms = rng.integers(0, 93, int(lengths.sum())).astype(np.uint8)
    payload = encode_stream(model, p, syms, lengths)
    back = decode_stream(model, p, payload, lengths)
    assert np.array_equal(back, syms)


@pytest.mark.slow
def test_bitstream_stability_goldens():
    """Pinned payload MD5s for three model configs: the bitstream is
    platform-independent (pure integer walk) and must not drift under
    refactors — an intentional format change updates these hashes
    deliberately (and breaks old archives, so version accordingly)."""
    import hashlib

    import numpy as np

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.models.base import QualModel, seq_model_from_params
    from fastqueeze_tpu.ops.engine import encode_stream

    rng = np.random.default_rng(42)
    p = CodecParams(lanes_min=16, lanes_max=64, lane_target_symbols=512)
    golden = {
        "qual": "d37c93864f1ce2ae92d38ee91a4b5ba8",
        "qual3": "7e701d103395308a8439617841b2c39e",
        "seq": "24d73a8a135bc6405c04c56b46c223f8",
    }
    for name, model, amax in (
            ("qual", QualModel(alphabet=48, init=1, inc=8, cap=8192,
                               qlevel=2), 48),
            ("qual3", QualModel(alphabet=40, init=1, inc=8, cap=8192,
                                qlevel=3), 40),
            ("seq", seq_model_from_params(CodecParams(slevel=0)), 4)):
        lengths = rng.integers(10, 120, 300)
        syms = rng.integers(0, amax, int(lengths.sum())).astype(np.uint8)
        payload = encode_stream(model, p, syms, lengths)
        assert hashlib.md5(payload).hexdigest() == golden[name], name
