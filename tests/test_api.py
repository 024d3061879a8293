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


def test_api_part_merge(tmp_path):
    """Library-level multi-host flow: compress(part=...) + merge() is
    byte-identical to a single-run compress()."""
    import numpy as np

    from fastqueeze_tpu import api
    from fastqueeze_tpu.config import CodecParams
    rng = np.random.default_rng(21)
    recs = []
    for i in range(300):
        seq = "".join(rng.choice(list("ACGT"), 60))
        q = "".join(chr(33 + int(x)) for x in rng.integers(2, 40, 60))
        recs.append(f"@a.{i}\n{seq}\n+\n{q}\n")
    src = tmp_path / "in.fq"
    src.write_bytes("".join(recs).encode())
    mk = lambda: CodecParams(slevel=0, block_bytes=4096)  # noqa: E731
    single = str(tmp_path / "s.fqz")
    api.compress(str(src), single, params=mk())
    parts = []
    for k in range(2):
        pth = str(tmp_path / f"p{k}.fqz")
        api.compress(str(src), pth, params=mk(), part=(k, 2))
        parts.append(pth)
    merged = str(tmp_path / "m.fqz")
    stats = api.merge(merged, parts)
    assert stats["parts"] == 2
    assert open(merged, "rb").read() == open(single, "rb").read()
    outs = api.decompress(merged, str(tmp_path / "back"))
    assert open(outs[0], "rb").read() == src.read_bytes()
