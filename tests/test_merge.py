"""Multi-host archive assembly: --part K:N partial archives + --merge.

Reference parity: ``SeqArcFile::mergeFile @0x417790`` (SURVEY.md §2.3 —
"per-block payloads gathered ... merge = concatenation with recorded
lengths").  Each part scans the whole input (whole-input MD5, shared
deterministic frozen model) but encodes only its round-robin share of the
blocks, so merging the parts must reproduce the single-run archive
BYTE-FOR-BYTE — the strongest possible statement of multi-host
correctness, asserted directly here.
"""

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.arcfile import ArcReader, merge_archives
from fastqueeze_tpu.pipeline.driver import compress_se, decompress, extract
from fastqueeze_tpu.pipeline.pe import compress_pe

SMALL = dict(slevel=0, lanes_min=16, lanes_max=32, lane_target_symbols=512)


def _mk_fastq(rng, n, L=50, tag="p"):
    recs = []
    for i in range(n):
        seq = "".join(rng.choice(list("ACGT"), L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(2, 40, L))
        recs.append(f"@{tag}.{i}\n{seq}\n+\n{qual}\n")
    return "".join(recs).encode()


def _params(**kw):
    d = dict(SMALL, block_bytes=4096, **kw)
    return CodecParams(**d)


@pytest.fixture(scope="module")
def se_input(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("merge_se")
    raw = _mk_fastq(np.random.default_rng(11), 400)
    path = tmp / "in.fq"
    path.write_bytes(raw)
    return str(path), raw, tmp


def _compress_parts(tmp, in_path, n_parts, **kw):
    parts = []
    for k in range(n_parts):
        arc_k = str(tmp / f"part{k}.fqz")
        compress_se(_params(**kw), in_path, arc_k, part=(k, n_parts))
        parts.append(arc_k)
    return parts


def test_merge_byte_identical_se(se_input, tmp_path):
    in_path, raw, _ = se_input
    single = str(tmp_path / "single.fqz")
    stats = compress_se(_params(), in_path, single)
    assert stats["blocks"] >= 3, "fixture must span several blocks"
    parts = _compress_parts(tmp_path, in_path, 3)
    # each part holds its round-robin share, tagged as partial
    tot = 0
    for k, pth in enumerate(parts):
        with ArcReader(pth) as r:
            assert r.part == (k, 3)
            tot += len(r.blocks)
    assert tot == stats["blocks"]
    merged = str(tmp_path / "merged.fqz")
    merge_archives(merged, parts)
    assert open(merged, "rb").read() == open(single, "rb").read()
    out = decompress(merged, str(tmp_path / "back"), force=True)
    assert open(out[0], "rb").read() == raw


def test_merge_byte_identical_se_frozen(se_input, tmp_path):
    """Shared frozen model: every part trains the identical model from the
    same input prefix, so the MODEL sections agree and the merge is still
    byte-exact."""
    in_path, raw, _ = se_input
    single = str(tmp_path / "single_f.fqz")
    compress_se(_params(use_model=1), in_path, single)
    parts = []
    for k in range(2):
        arc_k = str(tmp_path / f"fpart{k}.fqz")
        compress_se(_params(use_model=1), in_path, arc_k, part=(k, 2))
        parts.append(arc_k)
    with ArcReader(parts[0]) as r:
        assert r.model_blob is not None
    merged = str(tmp_path / "merged_f.fqz")
    merge_archives(merged, parts)
    assert open(merged, "rb").read() == open(single, "rb").read()
    out = decompress(merged, str(tmp_path / "back_f"), force=True)
    assert open(out[0], "rb").read() == raw


def test_merge_byte_identical_pe(tmp_path):
    rng = np.random.default_rng(12)
    raw1 = _mk_fastq(rng, 300, tag="r1")
    raw2 = _mk_fastq(rng, 300, tag="r2")
    in1, in2 = tmp_path / "pe_1.fq", tmp_path / "pe_2.fq"
    in1.write_bytes(raw1)
    in2.write_bytes(raw2)
    single = str(tmp_path / "pe.fqz")
    stats = compress_pe(_params(), str(in1), str(in2), single)
    assert stats["blocks"] >= 2
    parts = []
    for k in range(2):
        arc_k = str(tmp_path / f"pe_part{k}.fqz")
        compress_pe(_params(), str(in1), str(in2), arc_k, part=(k, 2))
        parts.append(arc_k)
    merged = str(tmp_path / "pe_merged.fqz")
    merge_archives(merged, parts)
    assert open(merged, "rb").read() == open(single, "rb").read()
    outs = decompress(merged, str(tmp_path / "pe_back"), force=True)
    assert open(outs[0], "rb").read() == raw1
    assert open(outs[1], "rb").read() == raw2


def test_partial_archive_refused_by_decode(se_input, tmp_path):
    in_path, _, _ = se_input
    arc = str(tmp_path / "lone.fqz")
    compress_se(_params(), in_path, arc, part=(0, 2))
    with pytest.raises(ValueError, match="partial archive"):
        decompress(arc, str(tmp_path / "nope"), force=True)
    with pytest.raises(ValueError, match="partial archive"):
        extract(arc, str(tmp_path / "nope2"), 0, 5, force=True)


def test_merge_error_cases(se_input, tmp_path):
    in_path, _, _ = se_input
    parts = _compress_parts(tmp_path, in_path, 3)
    # missing part
    with pytest.raises(ValueError, match=r"missing part"):
        merge_archives(str(tmp_path / "m1.fqz"), parts[:2])
    # duplicate part
    with pytest.raises(ValueError, match="duplicate part"):
        merge_archives(str(tmp_path / "m2.fqz"), [parts[0], parts[0],
                                                  parts[1]])
    # non-partial input
    single = str(tmp_path / "s.fqz")
    compress_se(_params(), in_path, single)
    with pytest.raises(ValueError, match="not a partial archive"):
        merge_archives(str(tmp_path / "m3.fqz"), [single])
    # settings mismatch (different slevel -> PARAM differs)
    bad = str(tmp_path / "bad2.fqz")
    compress_se(_params(slevel=1), in_path, bad, part=(2, 3))
    with pytest.raises(ValueError, match="PARAM"):
        merge_archives(str(tmp_path / "m4.fqz"), [parts[0], parts[1], bad])


def test_cli_part_and_merge(se_input, tmp_path, monkeypatch):
    from fastqueeze_tpu import cli
    in_path, raw, _ = se_input
    monkeypatch.chdir(tmp_path)
    single = str(tmp_path / "c_single.fqz")
    base = ["-c", "-1", in_path, "--block-mb", "1", "--slevel", "0", "-f"]
    assert cli.main(base + ["-o", single]) == 0
    parts = []
    for k in range(2):
        arc_k = str(tmp_path / f"c_part{k}.fqz")
        assert cli.main(base + ["--part", f"{k}:2", "-o", arc_k]) == 0
        parts.append(arc_k)
    merged = str(tmp_path / "c_merged.fqz")
    assert cli.main(["--merge"] + parts + ["-o", merged, "-f"]) == 0
    assert open(merged, "rb").read() == open(single, "rb").read()
    # bad --part spellings are rejected up front
    assert cli.main(base + ["--part", "2:2", "-o", "x.fqz"]) == 2
    assert cli.main(base + ["--part", "nope", "-o", "x.fqz"]) == 2


def test_merge_byte_identical_aligned(tmp_path):
    """Aligned-mode parts (reference index + frozen gate untouched) merge
    byte-identically too — prepare_ref stamps identical ref_md5/seed_len
    into every part's PARAM."""
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    rng = np.random.default_rng(19)
    glen = 8000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    B = np.frombuffer(b"ACGT", np.uint8)
    fa = tmp_path / "r.fa"
    fa.write_bytes(b">c\n" + B[genome].tobytes() + b"\n")
    recs = []
    for i in range(400):
        st = int(rng.integers(0, glen - 70))
        r = genome[st:st + 70].copy()
        mp = rng.integers(0, 70, rng.integers(0, 3))
        r[mp] = (r[mp] + 1) % 4
        q = "".join(chr(33 + int(x)) for x in rng.integers(2, 40, 70))
        recs.append(b"@al.%d\n%s\n+\n%s\n" % (i, B[r].tobytes(),
                                              q.encode()))
    fq = tmp_path / "al.fq"
    fq.write_bytes(b"".join(recs))
    single = str(tmp_path / "al.fqz")
    stats = compress_se_aligned(_params(), str(fa), str(fq), single)
    assert stats["blocks"] >= 2 and stats["mapped"] > 300
    parts = []
    for k in range(2):
        pth = str(tmp_path / f"alp{k}.fqz")
        compress_se_aligned(_params(), str(fa), str(fq), pth, part=(k, 2))
        parts.append(pth)
    merged = str(tmp_path / "al_m.fqz")
    merge_archives(merged, parts)
    assert open(merged, "rb").read() == open(single, "rb").read()
    outs = decompress(merged, str(tmp_path / "al_back"), force=True,
                      ref=str(fa))
    assert open(outs[0], "rb").read() == fq.read_bytes()
