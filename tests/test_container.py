import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.container.arcfile import ArcReader, ArcWriter, BlockInfo


def test_archive_roundtrip(tmp_path):
    path = str(tmp_path / "a.fqz")
    p = CodecParams(slevel=5, qlevel=3, qmax=50)
    w = ArcWriter(path, p, ["in1.fq", "in2.fq"], [b"\x01" * 16, b"\x02" * 16],
                  model_blob=b"modeldata")
    # out-of-order block arrival (parallel encoders)
    w.add_block(1, b"BBBB", BlockInfo(0, n_reads=7, raw_len1=100, md5=b"m" * 16))
    w.add_block(0, b"AAA", BlockInfo(0, n_reads=5, raw_len1=80, md5=b"n" * 16))
    w.finalize()

    with ArcReader(path) as r:
        assert r.params.slevel == 5 and r.params.qlevel == 3
        assert r.params.qmax == 50
        assert r.file_list == ["in1.fq", "in2.fq"]
        assert r.input_md5s == [b"\x01" * 16, b"\x02" * 16]
        assert r.model_blob == b"modeldata"
        assert len(r.blocks) == 2
        assert r.read_block(0) == b"AAA"
        assert r.read_block(1) == b"BBBB"
        assert r.blocks[1].n_reads == 7


def test_bad_magic(tmp_path):
    path = tmp_path / "bad.fqz"
    path.write_bytes(b"NOTANARC" + b"\x00" * 100)
    with pytest.raises(ValueError, match="bad magic"):
        ArcReader(str(path))


def test_missing_block_rejected(tmp_path):
    w = ArcWriter(str(tmp_path / "x.fqz"), CodecParams(), [], [])
    w.add_block(1, b"B", BlockInfo(0, 1, 1))
    with pytest.raises(ValueError, match="missing blocks"):
        w.finalize()


def test_params_roundtrip_all_fields():
    p = CodecParams(block_size_mb=7, slevel=9, qmax=80, seed_len=11,
                    max_mis=3, lossy_factor=1.15, is_pe=1)
    q = CodecParams.from_bytes(p.to_bytes())
    assert p == q
