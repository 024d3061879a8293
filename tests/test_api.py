"""Library API surface (fastqueeze_tpu.api): one-call compress /
decompress / extract / describe wrappers over the pipeline drivers."""

import numpy as np

from fastqueeze_tpu import api
from fastqueeze_tpu.config import CodecParams

SMALL = dict(slevel=0, lanes_min=16, lanes_max=32, lane_target_symbols=512)


def _fq(rng, n, tag, L=50):
    recs = []
    for i in range(n):
        seq = "".join(rng.choice(list("ACGT"), L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(2, 40, L))
        recs.append(f"@{tag}.{i}\n{seq}\n+\n{qual}\n")
    return "".join(recs).encode()


def test_se_compress_decompress_extract_describe(tmp_path):
    rng = np.random.default_rng(51)
    raw = _fq(rng, 120, "api")
    src = tmp_path / "in.fq"
    src.write_bytes(raw)
    arc = str(tmp_path / "a.fqz")
    stats = api.compress(str(src), arc, params=CodecParams(**SMALL))
    assert stats["compressed"] < stats["raw"]
    info = api.describe(arc)
    assert info["kind"] == "SE" and info["blocks"] >= 1
    assert info["raw_bytes"] == len(raw)
    outs = api.decompress(arc, str(tmp_path / "back"))
    assert open(outs[0], "rb").read() == raw
    outs = api.extract(arc, 5, 3, str(tmp_path / "slice"))
    lines = open(outs[0], "rb").read().split(b"\n")
    assert lines[0] == b"@api.5" and len([x for x in lines if x]) == 12


def test_pe_compress_decompress(tmp_path):
    rng = np.random.default_rng(53)
    r1 = _fq(rng, 80, "p/1")
    r2 = _fq(rng, 80, "p/2")
    s1, s2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    s1.write_bytes(r1)
    s2.write_bytes(r2)
    arc = str(tmp_path / "pe.fqz")
    api.compress((str(s1), str(s2)), arc, params=CodecParams(**SMALL))
    assert api.describe(arc)["kind"] == "PE"
    outs = api.decompress(arc, str(tmp_path / "back"))
    assert open(outs[0], "rb").read() == r1
    assert open(outs[1], "rb").read() == r2
