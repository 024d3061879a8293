"""Headline benchmark: SE entropy-only encode throughput (reads/s).

Baseline (BASELINE.md): the reference SeqArc-1.6 sustains ~98,000 reads/s
(1 thread, x86) on 100 bp reads at ratio 6.39x.  This benchmark compresses
a ~23.7 MB SE input (the bundled 10k-read file x10) end to end (parse +
encode + container write), excluding one warm-up block so jit compiles are
not billed, and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

BASELINE_READS_PER_S = 98_000.0
TEST_FQ = "/root/reference/test/ERR2755197_test_1.fq"


def _device_watchdog(timeout_s: int = 120) -> bool:
    """True if the default JAX backend answers within timeout_s.

    The axon tunnel can go FULLY dead (jax.devices() hangs forever, not
    just slowly) — probing in a subprocess is the only way to bound it.
    Without this, a dead link turns the whole benchmark into a silent
    hang and the round records nothing."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np\n"
             "d = jax.devices()\n"
             "x = jax.device_put(np.ones(1024, np.uint8))\n"
             "np.asarray(x)\n"
             "print(d[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    # --cpu: validation mode — run the whole bench flow on the CPU backend
    # with a 1x input (numbers NOT comparable to baseline; exercises every
    # code path so a bench-script bug can't eat the round's TPU run)
    cpu_mode = "--cpu" in sys.argv
    backend = "tpu"
    if cpu_mode:
        backend = "cpu-validation"
        os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"   # host-ISA AOT
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif not _device_watchdog():
        # The tunnel can be fully dead for hours.  The frozen coding path
        # (the whole benchmark config) executes on the host-native backend
        # (ops/host_frozen.py — bit-identical bitstream), so the measured
        # numbers remain real end-to-end throughput; only device-routed
        # work would change, and this config has none.
        backend = "cpu-fallback(axon-tunnel-dead)"
        os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"   # host-ISA AOT
        import jax
        jax.config.update("jax_platforms", "cpu")
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.blockcodec import encode_block
    from fastqueeze_tpu.pipeline.driver import compress_se

    tmp = tempfile.mkdtemp(prefix="fqzbench")
    src = os.path.join(tmp, "in.fq")
    raw1 = open(TEST_FQ, "rb").read()
    reps = 1 if cpu_mode else 10
    healthy = backend == "tpu"
    with open(src, "wb") as fh:
        for _ in range(reps):
            fh.write(raw1)
    n_reads = 10_000 * reps

    # pre-flight: the tunnel link goes through multi-minute degraded
    # phases (d2h can drop from ~40 MB/s to ~15 KB/s); measuring during
    # one would record garbage.  Probe d2h and wait (bounded) for a
    # healthy phase before benchmarking.
    import jax
    import numpy as np
    probe_host = np.ones(1 << 20, np.uint8)
    deadline = time.time() + (360 if healthy else 0)
    good = 0
    while True:
        dev = jax.device_put(probe_host)
        t0 = time.time()
        np.asarray(dev)
        good = good + 1 if time.time() - t0 < 0.3 else 0
        if good >= 2 or time.time() > deadline:
            break
        if good == 0:       # only wait out a BAD probe; healthy probes
            time.sleep(15)  # run back-to-back

    # threads=1: since the frozen coder went host-native (ops/host_frozen),
    # nothing overlaps a device round-trip any more and extra threads are
    # pure contention on this 1-vCPU host (measured: t1 0.70s, t2 0.98s,
    # t3 0.96s warm)
    p = CodecParams(block_size_mb=8, threads=1)

    # warm-up: one full untimed pass compiles every (model, shape) pair
    # (compilations persist in the on-disk XLA cache for later runs)
    compress_se(p, src, os.path.join(tmp, "warm.fqz"))

    # best-of-5 with a time budget: the link's throughput fluctuates
    # several-fold between runs; report steady-state capability, but do
    # not stall the whole bench if a degraded phase begins mid-run
    dt = None
    budget = time.time() + 300
    for k in range(14):
        t0 = time.time()
        stats = compress_se(p, src, os.path.join(tmp, "out.fqz"))
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
        # stop once a clearly-healthy sample is in hand (more passes only
        # chase noise), or when the time budget is gone.  The threshold
        # tracks current capability (~0.54 s warm since the duplicate
        # tier): the box's wall-clock varies +-60% between phases, so a
        # stale threshold makes the early-stop accept a degraded sample.
        if (k >= 2 and dt < 0.60) or time.time() > budget:
            break
    reads_per_s = n_reads / dt

    from fastqueeze_tpu.pipeline.driver import decompress
    dec_dt = None
    outs = None
    budget = time.time() + 240
    for k in range(14):
        t0 = time.time()
        outs = decompress(os.path.join(tmp, "out.fqz"),
                          os.path.join(tmp, "back"), force=True, threads=1)
        d = time.time() - t0
        dec_dt = d if dec_dt is None else min(dec_dt, d)
        if (k >= 2 and dec_dt < 0.40) or time.time() > budget:
            break
    with open(outs[0], "rb") as fh:
        ok = fh.read(1 << 20) == raw1[:1 << 20]

    # --- stage attribution (one instrumented single-thread pass): where
    # the encode wall time lives — host parse, dispatch (host stream
    # coding + device queueing), and device/transfer wait (finalize).
    from fastqueeze_tpu.utils.metrics import DebugInfo
    dbg = DebugInfo()
    t0 = time.time()
    compress_se(CodecParams(block_size_mb=8, threads=1), src,
                os.path.join(tmp, "stg.fqz"), dbg=dbg)
    stage_wall = time.time() - t0
    stages = {
        "wall_s": round(stage_wall, 3),
        "parse_host_s": round(dbg.vals.get("parse_s", 0.0), 3),
        "dispatch_host_s": round(dbg.vals.get("dispatch_s", 0.0), 3),
        "device_wait_s": round(dbg.vals.get("encode_s", 0.0), 3),
        "train_s": round(dbg.vals.get("train_s", 0.0), 3),
    }

    # --- aligned-SE benchmark (BASELINE.md: reference ~40k reads/s with
    # the synthetic 500 kb ref, 8,050/10,000 mapped) ---
    aligned = _bench_aligned(tmp, raw1)

    print(json.dumps({
        "metric": "se_encode_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        "detail": {
            "input_bytes": stats["raw"],
            "compressed_bytes": stats["compressed"],
            "ratio": round(stats["ratio"], 3),
            "blocks": stats["blocks"],
            "wall_s": round(dt, 3),
            "decode_reads_per_s": round(n_reads / dec_dt, 1),
            "decode_ok": bool(ok),
            "backend": backend,
            "stages": stages,
            "aligned": aligned,
        },
    }))


def _bench_aligned(tmp: str, raw1: bytes) -> dict:
    """Aligned-SE throughput on the synthetic 500 kb reference (the
    BASELINE.md protocol: reference binary ~40k reads/s, 8,050/10k mapped,
    ratio 5.96x).  Measures the full pipeline: parse + align + encode."""
    import time

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from maprate import synthetic_ref
    src1 = os.path.join(tmp, "in1.fq")
    with open(src1, "wb") as fh:
        fh.write(raw1)
    fa = synthetic_ref(parse_block(raw1, True))
    p = CodecParams(block_size_mb=8, threads=1)
    stats = compress_se_aligned(p, fa, src1,
                                os.path.join(tmp, "warm_al.fqz"))  # warm-up
    dt = None
    budget = time.time() + 240
    for k in range(14):
        p = CodecParams(block_size_mb=8, threads=1)
        t0 = time.time()
        stats = compress_se_aligned(p, fa, src1,
                                    os.path.join(tmp, "al.fqz"))
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
        if (k >= 1 and dt < 0.27) or time.time() > budget:
            break
    out = {
        "reads_per_s": round(stats["reads"] / dt, 1),
        "vs_baseline_40k": round(stats["reads"] / dt / 40_000.0, 3),
        "mapped": stats["mapped"],
        "reads": stats["reads"],
        "ratio": round(stats["ratio"], 3),
        "wall_s": round(dt, 3),
    }

    # --- -q long-seed mode (wide 44-bit seeds + one-indel rescue;
    # reference BWA-backed ratio 6.16x, BASELINE.md) ---
    dq = None
    budget = time.time() + 120
    for k in range(8):
        pq = CodecParams(block_size_mb=8, threads=1, seed_len=22,
                         max_indel=3)
        t0 = time.time()
        sq = compress_se_aligned(pq, fa, src1, os.path.join(tmp, "q.fqz"))
        d = time.time() - t0
        dq = d if dq is None else min(dq, d)
        if (k >= 1 and dq < 0.35) or time.time() > budget:
            break
    out["q_mode"] = {"reads_per_s": round(sq["reads"] / dq, 1),
                     "mapped": sq["mapped"], "ratio": round(sq["ratio"], 3)}

    # --- self-referential alignment (-S, no reference equivalent):
    # synthetic 20x-coverage reads, where the block's own unmapped reads
    # act as the reference (decode rebuilds it from the seq stream) ---
    out["self_ref"] = _bench_selfref(tmp)

    # --- PE aligned (reference PE+HASH ratio 5.53x, 12,607/20k mapped) ---
    from fastqueeze_tpu.pipeline.aligned import compress_pe_aligned
    r2 = TEST_FQ.replace("_1.fq", "_2.fq")
    if os.path.exists(r2):
        dp = None
        budget = time.time() + 120
        for k in range(6):
            pp = CodecParams(block_size_mb=8, threads=1)
            t0 = time.time()
            sp = compress_pe_aligned(pp, fa, src1, r2,
                                     os.path.join(tmp, "pe.fqz"))
            d = time.time() - t0
            dp = d if dp is None else min(dp, d)
            if (k >= 1 and dp < 0.72) or time.time() > budget:
                break
        out["pe_aligned"] = {"reads_per_s": round(sp["reads"] / dp, 1),
                             "mapped": sp["mapped"],
                             "ratio": round(sp["ratio"], 3)}
    return out


def _bench_selfref(tmp: str) -> dict:
    import time

    import numpy as np

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import compress_se
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, 60000).astype(np.uint8)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(12000):
        pos = int(rng.integers(0, 60000 - 100))
        r = genome[pos:pos + 100].copy()
        e = rng.random(100) < 0.005
        r[e] = (r[e] + rng.integers(1, 4, int(e.sum()))) % 4
        if rng.random() < 0.5:
            r = 3 - r[::-1]
        q = (rng.integers(30, 41, 100).astype(np.uint8) + 33).tobytes()
        recs.append(b"@r.%d\n" % i + BASES[r].tobytes() + b"\n+\n" + q
                    + b"\n")
    src = os.path.join(tmp, "cov.fq")
    with open(src, "wb") as fh:
        fh.write(b"".join(recs))
    s0 = compress_se(CodecParams(block_size_mb=8, threads=1), src,
                     os.path.join(tmp, "cov0.fqz"))
    p = CodecParams(block_size_mb=8, threads=1, self_align=1)
    t0 = time.time()
    s1 = compress_se(p, src, os.path.join(tmp, "covS.fqz"))
    dt = time.time() - t0
    return {"ratio": round(s1["ratio"], 3),
            "plain_ratio": round(s0["ratio"], 3),
            "reads_per_s": round(12000 / dt, 1)}


if __name__ == "__main__":
    main()
