from fastqueeze_tpu.pipeline.idproc import analyze_ids, reconstruct_ids


def _rt(ids):
    schema, var = analyze_ids(ids)
    assert schema is not None
    back = reconstruct_ids(schema, len(ids), var)
    assert back == ids
    return schema, var


def test_sequential_ids_collapse():
    ids = [f"ERR2755197.{i} {i} length=100".encode() for i in range(1, 1001)]
    schema, var = _rt(ids)
    assert var == b""  # fully binned, no variable payload
    assert len(schema.to_json()) < 300


def test_pe_interleaved_ids():
    ids = []
    for i in range(1, 101):
        ids.append(f"SRR1.{i}/1".encode())
        ids.append(f"SRR1.{i}/1".encode())
    schema, var = _rt(ids)
    assert var == b""


def test_stride2_delta():
    ids = []
    for i in range(1, 101):
        ids.append(f"X.{i}.a".encode())
        ids.append(f"X.{i}.a".encode())
    schema, var = _rt(ids)
    assert var == b""


def test_variable_text_field():
    ids = [f"run{i} tile{i * i}".encode() for i in range(50)]
    _rt(ids)


def test_leading_zeros_fall_back_to_text():
    ids = [f"ID{i:05d}".encode() for i in range(100)]
    schema, var = _rt(ids)  # must re-render exactly (leading zeros!)


def test_structure_mismatch_returns_none():
    ids = [b"abc.1", b"abc.2", b"zzz"]
    schema, var = analyze_ids(ids)
    assert schema is None


def test_empty():
    schema, var = analyze_ids([])
    assert schema is not None
    assert reconstruct_ids(schema, 0, b"") == []
