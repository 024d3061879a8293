import numpy as np
import pytest

from fastqueeze_tpu.pipeline.lossy import rblock_transform


def test_constant_run_collapses():
    q = np.array([20, 21, 20, 22, 21, 20], np.int32)
    out = rblock_transform(q, np.array([6]), 1.15)
    # whole read is one run (22+1)/(20+1) = 1.095 < 1.15
    assert (out == out[0]).all()
    lo, hi = 20, 22
    gm = round(np.sqrt((lo + 1) * (hi + 1))) - 1
    assert out[0] == gm


def test_breaks_at_large_jump():
    q = np.array([30, 30, 30, 5, 5, 5], np.int32)
    out = rblock_transform(q, np.array([6]), 1.15)
    assert (out[:3] == 30).all()
    assert (out[3:] == 5).all()


def test_factor_one_is_identity():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 40, 100).astype(np.int32)
    out = rblock_transform(q, np.array([50, 50]), 1.0)
    np.testing.assert_array_equal(out, q)


def test_multiple_reads_independent():
    q = np.array([10, 10, 40, 40], np.int32)
    out = rblock_transform(q, np.array([2, 2]), 1.15)
    np.testing.assert_array_equal(out, q)  # runs don't cross read boundary


def test_variable_lengths():
    rng = np.random.default_rng(1)
    lens = rng.integers(1, 30, 50)
    q = rng.integers(0, 40, int(lens.sum())).astype(np.int32)
    out = rblock_transform(q, lens, 1.3)
    assert out.shape == q.shape
    assert (out >= 0).all() and (out <= 40).all()


def test_monotone_value_range():
    """Replacement is between the run min and max."""
    rng = np.random.default_rng(2)
    lens = np.full(20, 100)
    q = rng.integers(10, 30, int(lens.sum())).astype(np.int32)
    out = rblock_transform(q, lens, 1.1)
    assert out.min() >= q.min() - 1
    assert out.max() <= q.max() + 1


def test_lossy_e2e(tmp_path):
    """-l round-trip: output equals the transformed input (reference's
    R-Block is broken — ours must work, SURVEY.md §2.1)."""
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress
    rng = np.random.default_rng(3)
    recs = []
    for i in range(100):
        seq = "".join(rng.choice(list("ACGT"), 80))
        qual = (np.clip(np.cumsum(rng.integers(-1, 2, 80)) % 40, 0, 39)
                + 33).astype(np.uint8)
        recs.append(f"@r.{i}\n{seq}\n+\n{bytes(qual).decode()}\n")
    raw = "".join(recs).encode()
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    p = CodecParams(slevel=0, lanes_min=16, lanes_max=32,
                    lane_target_symbols=512, lossy_factor=1.15)
    arc = str(tmp_path / "out.fqz")
    stats = compress_se(p, str(src), arc)
    outs = decompress(arc, str(tmp_path / "back"), force=True)
    back = open(outs[0], "rb").read()
    assert back != raw            # lossy: qualities changed
    # structure identical: ids+seqs match, quals same length
    a, b = raw.split(b"\n"), back.split(b"\n")
    assert a[0::4] == b[0::4] and a[1::4] == b[1::4]
    # lossless everything-but-qual; qual within run bounds
    lossless = compress_se(CodecParams(slevel=0, lanes_min=16, lanes_max=32,
                                       lane_target_symbols=512),
                           str(src), str(tmp_path / "l.fqz"))
    assert stats["compressed"] < lossless["compressed"]
