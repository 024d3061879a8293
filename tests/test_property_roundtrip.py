"""Seeded property sweep: random CodecParams x random FASTQ shapes must
round-trip bit-exact through the full pipeline.  Pairwise feature tests
live in their own files; this blaster covers the interaction space
(dedup x self-ref x lossy x frozen x block size x lanes x PE) with a
bounded, reproducible sample (failures print the combo to reproduce)."""

import numpy as np

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.pipeline.driver import compress_se, decompress
from fastqueeze_tpu.pipeline.pe import compress_pe


def _random_fastq(rng, n_reads, var_len=False, with_n=False,
                  coverage=False, dup_every=0, qbins=None, L=60):
    recs = []
    genome = rng.integers(0, 4, 8000).astype(np.uint8)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    for i in range(n_reads):
        Li = int(rng.integers(24, L + 1)) if var_len else L
        if dup_every and i % dup_every == 1 and i > dup_every:
            recs.append(recs[i - dup_every])
            continue
        if coverage:
            pos = int(rng.integers(0, len(genome) - Li))
            r = genome[pos:pos + Li].copy()
            e = rng.random(Li) < 0.01
            r[e] = (r[e] + rng.integers(1, 4, int(e.sum()))) % 4
            if rng.random() < 0.5:
                r = 3 - r[::-1]
        else:
            r = rng.integers(0, 4, Li).astype(np.uint8)
        seq = bytearray(BASES[r].tobytes())
        if with_n and rng.random() < 0.2:
            seq[int(rng.integers(0, Li))] = ord("N")
        if qbins is not None:
            q = np.asarray(qbins, np.uint8)[
                rng.integers(0, len(qbins), Li)] + 33
        else:
            q = rng.integers(0, 41, Li).astype(np.uint8) + 33
        recs.append(b"@p.%d r%d\n" % (i, i) + bytes(seq) + b"\n+\n"
                    + q.tobytes() + b"\n")
    return b"".join(recs)


def _random_params(rng):
    kw = dict(slevel=int(rng.integers(0, 2)), lanes_min=16, lanes_max=64,
              lane_target_symbols=int(rng.choice([256, 512, 2048])),
              threads=int(rng.integers(1, 3)))
    kw["dedup"] = int(rng.integers(0, 2))
    kw["use_model"] = int(rng.choice([0, 1, -1]))
    if rng.random() < 0.3:
        kw["self_align"] = 1
        kw["min_map_ratio"] = 0.0
    if rng.random() < 0.25:
        kw["lossy_factor"] = 1.15
    if rng.random() < 0.3:
        kw["block_bytes"] = int(rng.choice([1 << 15, 1 << 17]))
    if rng.random() < 0.3:
        kw["qlevel"] = int(rng.integers(1, 4))
    return kw


def test_property_roundtrip_se(tmp_path):
    rng = np.random.default_rng(20260820)
    for trial in range(14):
        kw = _random_params(rng)
        raw = _random_fastq(
            rng, n_reads=int(rng.integers(40, 400)),
            var_len=bool(rng.integers(0, 2)),
            with_n=bool(rng.integers(0, 2)),
            coverage=kw.get("self_align", 0) == 1 or rng.random() < 0.3,
            dup_every=int(rng.choice([0, 3])),
            qbins=(2, 12, 24, 37) if rng.random() < 0.5 else None)
        src = tmp_path / f"in{trial}.fq"
        lossy = kw.get("lossy_factor", 0) > 1.0
        src.write_bytes(raw)
        arc = str(tmp_path / f"a{trial}.fqz")
        p = CodecParams(**kw)
        compress_se(p, str(src), arc)
        outs = decompress(arc, str(tmp_path / f"b{trial}"), force=True)
        got = open(outs[0], "rb").read()
        if lossy:
            # lossy quals: sequence/id lines intact, structure preserved
            gl, rl = got.split(b"\n"), raw.split(b"\n")
            assert len(gl) == len(rl), f"trial {trial}: {kw}"
            assert gl[0::4] == rl[0::4] and gl[1::4] == rl[1::4], \
                f"trial {trial}: {kw}"
        else:
            assert got == raw, f"trial {trial}: {kw}"


def test_property_roundtrip_pe(tmp_path):
    rng = np.random.default_rng(20260821)
    for trial in range(6):
        kw = _random_params(rng)
        kw.pop("lossy_factor", None)      # exact-compare PE sweep
        n = int(rng.integers(30, 200))
        raw1 = _random_fastq(rng, n, var_len=bool(rng.integers(0, 2)),
                             coverage=kw.get("self_align", 0) == 1)
        raw2 = _random_fastq(rng, n, var_len=bool(rng.integers(0, 2)),
                             coverage=kw.get("self_align", 0) == 1)
        f1, f2 = tmp_path / f"p1_{trial}.fq", tmp_path / f"p2_{trial}.fq"
        f1.write_bytes(raw1)
        f2.write_bytes(raw2)
        arc = str(tmp_path / f"pe{trial}.fqz")
        compress_pe(CodecParams(**kw), str(f1), str(f2), arc)
        outs = decompress(arc, str(tmp_path / f"pb{trial}"), force=True)
        assert open(outs[0], "rb").read() == raw1, f"trial {trial}: {kw}"
        assert open(outs[1], "rb").read() == raw2, f"trial {trial}: {kw}"
