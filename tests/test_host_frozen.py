"""Native host frozen coder (native/frozenwave.cpp + ops/host_frozen.py).

The host coder must be BIT-IDENTICAL to the device engine's frozen path —
routing a stream host vs device is an execution choice that can never reach
the bitstream.  These tests cross-check payloads against the XLA engine and
archive bytes across routing modes.
"""

import os

import numpy as np
import pytest

from fastqueeze_tpu.config import RANS_M, CodecParams
from fastqueeze_tpu.models.base import QualModel, SeqModel
from fastqueeze_tpu.ops import host_frozen
from fastqueeze_tpu.ops.engine import encode_stream, decode_stream
from fastqueeze_tpu.io import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")

_P = CodecParams(lanes_min=8, lanes_max=64, lane_target_symbols=256)


def _ragged(rng, R=220, maxlen=80):
    counts = rng.integers(0, maxlen, R).astype(np.int64)
    counts[::13] = 0                      # zero-length reads
    return counts


def _check_equal(model, counts0, syms, counts):
    """Host payload == engine payload; host decode inverts it."""
    ref = encode_stream(model, _P, syms, counts, counts0=counts0,
                        adapt=False)
    cum = host_frozen.quantize(np.asarray(counts0, np.int32))
    got = host_frozen.encode_job(model, _P, syms, counts, cum).finalize()
    assert got == ref
    back = host_frozen.decode_job(model, _P, ref, counts, cum).finalize()
    assert np.array_equal(back, syms)


def test_seq_model_payload_identical():
    rng = np.random.default_rng(1)
    counts = _ragged(rng)
    syms = rng.integers(0, 4, int(counts.sum())).astype(np.uint8)
    m = SeqModel(alphabet=4, init=3, inc=1, cap=253, order=6)
    c0 = rng.integers(1, 50, (m.n_ctx, 4)).astype(np.int32)
    _check_equal(m, c0, syms, counts)


def test_qual_fqz_formula_payload_identical():
    rng = np.random.default_rng(2)
    counts = _ragged(rng)
    n = int(counts.sum())
    q = np.minimum(rng.geometric(0.3, n) - 1, 39).astype(np.uint8)
    m = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2,
                  drop_init=5)
    c0 = rng.integers(1, 30, (m.n_ctx, 40)).astype(np.int32)
    _check_equal(m, c0, q, counts)


def test_qual_hashed_chain_payload_identical():
    rng = np.random.default_rng(3)
    counts = _ragged(rng)
    n = int(counts.sum())
    q = rng.integers(0, 8, n).astype(np.uint8)
    m = QualModel(alphabet=8, init=1, inc=16, cap=8192, qlevel=2,
                  drop_init=5, k=4, ctx_base=8, hash_bits=13, pos_bits=3)
    c0 = rng.integers(1, 30, (m.n_ctx, 8)).astype(np.int32)
    _check_equal(m, c0, q, counts)
    # k=6 deep chain: the raw chain value exceeds 32 bits — jnp int32,
    # numpy int64 and C int64 must wrap mod 2^32 identically pre-hash
    m6 = QualModel(alphabet=8, init=1, inc=16, cap=8192, qlevel=2,
                   drop_init=5, k=6, ctx_base=8, hash_bits=14)
    c6 = rng.integers(1, 30, (m6.n_ctx, 8)).astype(np.int32)
    _check_equal(m6, c6, q, counts)


def test_empty_stream_payload_identical():
    m = SeqModel(alphabet=4, init=3, inc=1, cap=253, order=4)
    c0 = np.full((m.n_ctx, 4), 3, np.int32)
    _check_equal(m, c0, np.zeros(0, np.uint8), np.zeros(0, np.int64))


def test_quantize_matches_numpy_fallback():
    rng = np.random.default_rng(4)
    c = rng.integers(1, 200, (257, 9)).astype(np.int32)
    nat = native.quant_table(c)
    cs = np.cumsum(c.astype(np.int64), axis=1)
    cumz = np.concatenate([np.zeros((257, 1), np.int64), cs], axis=1)
    ref = ((cumz * RANS_M) // cs[:, -1:]).astype(np.uint16)
    assert np.array_equal(nat, ref)


def test_route_policy():
    p = CodecParams()
    sm = SeqModel(alphabet=4, init=3, inc=1, cap=253, order=4)
    assert host_frozen.route(p, sm)               # auto: host
    assert not host_frozen.route(CodecParams(mesh_n=2), sm)   # mesh: device
    assert host_frozen.route(CodecParams(mesh_n=2, frozen_exec=1), sm)
    assert not host_frozen.route(CodecParams(frozen_exec=2), sm)
    # caps past RANS_M could quantize a count to freq 0 -> device only
    wide = SeqModel(alphabet=4, init=3, inc=1, cap=RANS_M + 1, order=4)
    assert not host_frozen.route(p, wide)
    os.environ["FASTQUEEZE_FROZEN_EXEC"] = "device"
    try:
        assert not host_frozen.route(p, sm)
    finally:
        del os.environ["FASTQUEEZE_FROZEN_EXEC"]


def test_archive_bytes_identical_across_routing(tmp_path, monkeypatch):
    """compress_se with host routing == device routing, and the host-routed
    archive round-trips (frozen mode forced on a small input)."""
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress
    src = tmp_path / "in.fq"
    rng = np.random.default_rng(5)
    recs = []
    for i in range(600):
        n = int(rng.integers(40, 90))
        seq = rng.choice(list(b"ACGTN"), n,
                         p=[.24, .24, .24, .24, .04]).astype(np.uint8)
        qual = rng.integers(33 + 2, 33 + 40, n).astype(np.uint8)
        recs.append(b"@r%d\n%s\n+\n%s\n"
                    % (i, seq.tobytes(), qual.tobytes()))
    src.write_bytes(b"".join(recs))
    outs = {}
    for mode in ("host", "device"):
        monkeypatch.setenv("FASTQUEEZE_FROZEN_EXEC", mode)
        p = CodecParams(block_bytes=20000, use_model=1)
        compress_se(p, str(src), str(tmp_path / f"{mode}.fqz"))
        outs[mode] = (tmp_path / f"{mode}.fqz").read_bytes()
    assert outs["host"] == outs["device"]
    monkeypatch.setenv("FASTQUEEZE_FROZEN_EXEC", "host")
    back = decompress(str(tmp_path / "host.fqz"), str(tmp_path / "back"),
                      force=True)
    assert open(back[0], "rb").read() == src.read_bytes()
