"""Headline benchmark: SE entropy-only encode throughput (reads/s).

Baseline (BASELINE.md): the reference SeqArc-1.6 sustains ~98,000 reads/s
(1 thread, x86) on 100 bp reads at ratio 6.39x.  This benchmark compresses
a ~23.7 MB SE input (the bundled 10k-read file x10) end to end (parse +
encode + container write) and prints one JSON line.  Detail blocks:

  device       ALWAYS present: either a device-routed series on the real
               chip (FASTQUEEZE_*_EXEC=device) with link metrics, or the
               watchdog/probe evidence that the axon tunnel was down.
  unique_input dup-free fixture at the BASELINE 28.4 MB scale (the x10
               replication inflates ratio/throughput via the duplicate
               tier; this block is the honest coding-quality number, and
               is cross-measured against the reference binary on the
               SAME fixture when it is present on the box).
  aligned      aligned-SE/-q/PE/self-ref throughput incl. aligned DECODE
               timing + round-trip verification.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

BASELINE_READS_PER_S = 98_000.0
TEST_FQ = "/root/reference/test/ERR2755197_test_1.fq"
REF_BIN = "/root/reference/SeqArc-1.6"


def _device_watchdog(timeout_s: int = 120):
    """(ok, evidence) — probe the default JAX backend in a subprocess.

    The axon tunnel can go FULLY dead (jax.devices() hangs forever, not
    just slowly) — probing in a subprocess is the only way to bound it.
    Without this, a dead link turns the whole benchmark into a silent
    hang and the round records nothing."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np\n"
             "d = jax.devices()\n"
             "x = jax.device_put(np.ones(1024, np.uint8))\n"
             "np.asarray(x)\n"
             "print(d[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        ev = {"rc": r.returncode,
              "platform": r.stdout.strip()[-40:],
              "stderr_tail": r.stderr.strip()[-200:]}
        return r.returncode == 0 and "tpu" in r.stdout, ev
    except subprocess.TimeoutExpired:
        return False, {"rc": None, "timeout_s": timeout_s,
                       "error": "watchdog timeout (tunnel hang)"}


def _best_of(fn, n_min: int = 3, n_max: int = 14, budget_s: float = 240.0,
             settle: float = 0.05) -> float:
    """Best-of-N wall time with a self-calibrating stop: keep sampling
    while runs still improve the best by > settle; stop after two
    consecutive non-improving samples once n_min are in hand.  No
    hand-maintained capability constants (the box's wall-clock varies
    +-60% between phases; a stale threshold accepted degraded samples)."""
    best = None
    stale = 0
    t_end = time.time() + budget_s
    for k in range(n_max):
        t0 = time.time()
        fn()
        d = time.time() - t0
        if best is None or d < best * (1.0 - settle):
            stale = 0
        else:
            stale += 1
        best = d if best is None else min(best, d)
        if (k + 1 >= n_min and stale >= 2) or time.time() > t_end:
            break
    return best


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> None:
    # --cpu: validation mode — run the whole bench flow on the CPU backend
    # with a 1x input (numbers NOT comparable to baseline; exercises every
    # code path so a bench-script bug can't eat the round's TPU run)
    cpu_mode = "--cpu" in sys.argv
    backend = "tpu"
    watchdog_ev = None
    if cpu_mode:
        backend = "cpu-validation"
        os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"   # host-ISA AOT
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        ok, watchdog_ev = _device_watchdog()
        if not ok:
            # The tunnel can be fully dead for hours.  The frozen coding
            # path (the whole benchmark config) executes on the
            # host-native backend (ops/host_frozen.py — bit-identical
            # bitstream), so the measured numbers remain real end-to-end
            # throughput; only device-routed work would change.
            backend = "cpu-fallback(axon-tunnel-dead)"
            os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"
            import jax
            jax.config.update("jax_platforms", "cpu")
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress

    tmp = tempfile.mkdtemp(prefix="fqzbench")
    src = os.path.join(tmp, "in.fq")
    raw1 = open(TEST_FQ, "rb").read()
    reps = 1 if cpu_mode else 10
    healthy = backend == "tpu"
    with open(src, "wb") as fh:
        for _ in range(reps):
            fh.write(raw1)
    n_reads = 10_000 * reps
    src_md5 = _md5(src)

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
    # pure contention on this 1-vCPU host
    p = CodecParams(block_size_mb=8, threads=1)

    # warm-up: one full untimed pass compiles every (model, shape) pair
    # (compilations persist in the on-disk XLA cache for later runs)
    stats = compress_se(p, src, os.path.join(tmp, "out.fqz"))
    dt = _best_of(lambda: compress_se(
        CodecParams(block_size_mb=8, threads=1), src,
        os.path.join(tmp, "out.fqz")), budget_s=300)
    reads_per_s = n_reads / dt

    outs_box = {}

    def _dec():
        outs_box["outs"] = decompress(os.path.join(tmp, "out.fqz"),
                                      os.path.join(tmp, "back"), force=True,
                                      threads=1)
    dec_dt = _best_of(_dec, budget_s=240)
    # full-output integrity (interior also rides on per-block MD5s inside
    # decompress; this closes the loop on reassembly)
    ok = _md5(outs_box["outs"][0]) == src_md5

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

    # --- device series: ALWAYS emitted.  Either the device-routed engine
    # measured on the real chip, or the probe log proving the link was
    # down (VERDICT r3 #1: no more silent CPU-only rounds).
    device = _bench_device(tmp, src, n_reads, healthy, cpu_mode,
                           watchdog_ev, src_md5)

    # --- dup-free honest fixture at the BASELINE 28.4 MB scale ---
    unique = _bench_unique(tmp, raw1, cpu_mode)

    # --- aligned-SE benchmark (BASELINE.md: reference ~40k reads/s with
    # the synthetic 500 kb ref, 8,050/10,000 mapped) ---
    aligned = _bench_aligned(tmp, raw1)

    # --- genome-scale aligned validation: 100 Mbp structured-repeat
    # reference (VERDICT r4 #1) via tools/genome_bench.py (subprocess:
    # isolates peak-RSS accounting and shields the round's bench) ---
    genome = _bench_genome(cpu_mode)

    print(json.dumps({
        "metric": "se_encode_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        "detail": {
            "input_bytes": stats["raw"],
            "compressed_bytes": stats["compressed"],
            "ratio": round(stats["ratio"], 3),
            "replicated_x10": True,
            "blocks": stats["blocks"],
            "wall_s": round(dt, 3),
            "decode_reads_per_s": round(n_reads / dec_dt, 1),
            "decode_ok": bool(ok),
            "backend": backend,
            "stages": stages,
            "device": device,
            "unique_input": unique,
            "aligned": aligned,
            "genome": genome,
        },
    }))


def _bench_genome(cpu_mode: bool) -> dict:
    """100 Mbp structured-genome rows (map rate / ratio / index build /
    RSS / sharded-index check) — tools/genome_bench.py in a subprocess.
    The fixture caches in tmp_genome/ so repeat rounds skip generation."""
    args = [sys.executable,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "genome_bench.py")]
    if cpu_mode:
        args += ["--mbp", "4", "--reads", "20000",
                 "--out-dir", tempfile.mkdtemp(prefix="fqzgen")]
    try:
        r = subprocess.run(args, capture_output=True, text=True,
                           timeout=3000)
        if r.returncode != 0:
            return {"error": (r.stderr or r.stdout)[-400:]}
        return json.loads(r.stdout.strip().split("\n")[-1])
    except Exception as e:  # noqa: BLE001
        return {"error": repr(e)[:300]}


def _bench_device(tmp: str, src: str, n_reads: int, healthy: bool,
                  cpu_mode: bool, watchdog_ev, src_md5: str) -> dict:
    """Device-routed series (FASTQUEEZE_*_EXEC=device): the TPU engine
    itself, end to end, plus link metrics — or the link-down evidence."""
    if not healthy and not cpu_mode:
        return {"status": "link-down", "watchdog": watchdog_ev,
                "note": "plain series above ran host-native "
                        "(bit-identical payloads)"}
    import jax
    import numpy as np
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress

    out = {"status": "cpu-validation" if cpu_mode else "measured"}
    # link metrics: h2d / d2h MB/s and synchronous dispatch round-trip
    if not cpu_mode:
        buf = np.ones(4 << 20, np.uint8)
        t0 = time.time()
        dev = jax.device_put(buf)
        dev.block_until_ready()
        out["h2d_mb_s"] = round(4.0 / max(time.time() - t0, 1e-9), 1)
        t0 = time.time()
        np.asarray(dev)
        out["d2h_mb_s"] = round(4.0 / max(time.time() - t0, 1e-9), 1)
        one = jax.device_put(np.zeros(8, np.uint8))
        f = jax.jit(lambda x: x + 1)
        np.asarray(f(one))                      # compile
        t0 = time.time()
        for _ in range(5):
            np.asarray(f(one))
        out["dispatch_ms"] = round((time.time() - t0) / 5 * 1e3, 1)

    env = {"FASTQUEEZE_FROZEN_EXEC": "device",
           "FASTQUEEZE_ADAPT_EXEC": "device",
           "FASTQUEEZE_ALIGN_EXEC": "device"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        arc = os.path.join(tmp, "dev.fqz")
        mk = lambda: CodecParams(block_size_mb=8, threads=3)  # noqa: E731
        compress_se(mk(), src, arc)             # warm compile
        dt = _best_of(lambda: compress_se(mk(), src, arc), n_min=2,
                      n_max=6, budget_s=420)
        out["enc_reads_per_s"] = round(n_reads / dt, 1)
        # device archives must be byte-identical to host-routed ones with
        # the same params (the PARAM section serializes e.g. `threads`,
        # so compare against a fresh host encode, not the headline arc)
        os.environ["FASTQUEEZE_FROZEN_EXEC"] = "host"
        os.environ["FASTQUEEZE_ADAPT_EXEC"] = "host"
        harc = os.path.join(tmp, "devhost.fqz")
        compress_se(mk(), src, harc)
        os.environ.update(env)
        out["payload_identical"] = _md5(arc) == _md5(harc)
        box = {}

        def _dec():
            box["o"] = decompress(arc, os.path.join(tmp, "dback"),
                                  force=True, threads=2)
        decompress(arc, os.path.join(tmp, "dback"), force=True, threads=2)
        ddt = _best_of(_dec, n_min=2, n_max=6, budget_s=300)
        out["dec_reads_per_s"] = round(n_reads / ddt, 1)
        out["dec_ok"] = _md5(box["o"][0]) == src_md5
        # roofline: kernel sym/s x analytic gathers/sym vs the measured
        # gather ceiling (VERDICT r4 #2) — tools/roofline.py subprocess
        # (own process: the kernels time device-only, and a wedged link
        # can't take the bench down with it)
        try:
            rargs = [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tools", "roofline.py")]
            if cpu_mode:
                rargs += ["--small", "--cpu"]
            rr = subprocess.run(rargs, capture_output=True, text=True,
                               timeout=900)
            out["roofline"] = (json.loads(rr.stdout.strip().split("\n")[-1])
                               if rr.returncode == 0
                               else {"error": rr.stderr[-300:]})
        except Exception as e:  # noqa: BLE001
            out["roofline"] = {"error": repr(e)[:200]}
    except Exception as e:  # noqa: BLE001 — record, don't kill the bench
        out["status"] = "error"
        out["error"] = repr(e)[:300]
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return out


def _unique_fixture(tmp: str, raw1: bytes, reps: int) -> str:
    """Dup-free fixture at the BASELINE 28.4 MB scale: the bundled 10k
    reads replicated, every copy per-read mutated (>=1 forced base
    substitution, >=1 forced quality-byte change) so NO exact sequence or
    quality duplicates exist — the duplicate tier contributes nothing and
    the numbers measure pure coding quality.  Deterministic (fixed seed).
    """
    import numpy as np
    lines = raw1.split(b"\n")
    n = len(lines) // 4
    seq = np.frombuffer(b"".join(lines[1::4]), np.uint8).reshape(n, -1)
    qul = np.frombuffer(b"".join(lines[3::4]), np.uint8).reshape(n, -1)
    L = seq.shape[1]
    rng = np.random.default_rng(20260819)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for rep in range(reps):
        s = seq.copy()
        q = qul.copy()
        # forced substitution at one random position per read + ~1 extra
        nmut = 1 + rng.poisson(1.0, n)
        for k in range(int(nmut.max())):
            rows = np.nonzero(nmut > k)[0]
            cols = rng.integers(0, L, rows.size)
            cur = s[rows, cols]
            nb = BASES[rng.integers(0, 4, rows.size)]
            # guarantee a change: bump to the next base when equal
            same = nb == cur
            nb[same] = BASES[(np.searchsorted(BASES, cur[same]) + 1) % 4]
            s[rows, cols] = nb
        # forced quality change: -1 where >33 else +1 (always changes)
        cols = rng.integers(0, L, n)
        rows = np.arange(n)
        cq = q[rows, cols]
        q[rows, cols] = np.where(cq > 33, cq - 1, cq + 1)
        ids = np.char.add("@u.%d." % rep,
                          np.arange(n).astype(str)).astype(bytes)
        body = [b"%s length=%d\n%s\n+\n%s\n" % (
            ids[i], L, s[i].tobytes(), q[i].tobytes()) for i in range(n)]
        recs.append(b"".join(body))
    path = os.path.join(tmp, "uniq.fq")
    with open(path, "wb") as fh:
        fh.write(b"".join(recs))
    return path


def _bench_unique_pe(tmp: str, src: str) -> dict:
    """One-shot PE entropy-only ratio on the dup-free fixture (BASELINE.md
    PE row: reference 5.76x on the bundled pair): even reads -> mate 1,
    odd -> mate 2, same coders as the CLI -1/-2 path."""
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import decompress
    from fastqueeze_tpu.pipeline.pe import compress_pe
    lines = open(src, "rb").read().split(b"\n")
    recs = [b"\n".join(lines[i:i + 4]) + b"\n"
            for i in range(0, len(lines) - 3, 4)]
    p1, p2 = os.path.join(tmp, "pe_1.fq"), os.path.join(tmp, "pe_2.fq")
    with open(p1, "wb") as f:
        f.write(b"".join(recs[0::2]))
    with open(p2, "wb") as f:
        f.write(b"".join(recs[1::2]))
    arc = os.path.join(tmp, "pe.fqz")
    stats = compress_pe(CodecParams(threads=1), p1, p2, arc)
    outs = decompress(arc, os.path.join(tmp, "peback"), force=True,
                      threads=1)
    ok = (_md5(outs[0]) == _md5(p1) and _md5(outs[1]) == _md5(p2))
    return {"ratio": round(stats["ratio"], 3), "dec_ok": ok}


def _bench_unique(tmp: str, raw1: bytes, cpu_mode: bool) -> dict:
    """Honest coding-quality block: no exact duplicates, BASELINE scale
    (28.4 MB, 120k reads), reference binary cross-measured on the SAME
    fixture when present."""
    import numpy as np  # noqa: F401

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress
    reps = 2 if cpu_mode else 12
    src = _unique_fixture(tmp, raw1, reps)
    n_reads = 10_000 * reps
    in_bytes = os.path.getsize(src)
    src_md5 = _md5(src)
    arc = os.path.join(tmp, "uniq.fqz")
    # throughput series: 8 MB blocks (block pipelining engaged, the
    # BASELINE.md 4 MB-block protocol's spirit); the defaults ratio
    # (50 MB blocks -> one block, the CLI experience) is reported
    # separately below — both archives round-trip-verified
    mk = lambda: CodecParams(block_size_mb=8, threads=1)  # noqa: E731
    stats = compress_se(mk(), src, arc)                   # warm
    dt = _best_of(lambda: compress_se(mk(), src, arc), budget_s=240)
    box = {}

    def _dec():
        box["o"] = decompress(arc, os.path.join(tmp, "uback"), force=True,
                              threads=1)
    decompress(arc, os.path.join(tmp, "uback"), force=True, threads=1)
    ddt = _best_of(_dec, budget_s=180)
    arc_d = os.path.join(tmp, "uniq_def.fqz")
    stats_d = compress_se(CodecParams(threads=1), src, arc_d)
    outs_d = decompress(arc_d, os.path.join(tmp, "uback_def"), force=True,
                        threads=1)
    out = {
        "input_bytes": in_bytes,
        "reads": n_reads,
        "ratio": round(stats["ratio"], 3),
        "enc_reads_per_s": round(n_reads / dt, 1),
        "dec_reads_per_s": round(n_reads / ddt, 1),
        "dec_ok": _md5(box["o"][0]) == src_md5,
        "cli_defaults": {
            "ratio": round(stats_d["ratio"], 3),
            "dec_ok": _md5(outs_d[0]) == src_md5,
        },
        "pe": _bench_unique_pe(tmp, src),
    }
    # reference binary on the SAME fixture (apples-to-apples)
    if os.path.exists(REF_BIN) and not cpu_mode:
        try:
            rarc = os.path.join(tmp, "ref_uniq")
            best = None
            for _ in range(2):
                t0 = time.time()
                r = subprocess.run(
                    [REF_BIN, "-c", "-1", src, "-o", rarc, "-f"],
                    capture_output=True, timeout=300, cwd=tmp)
                d = time.time() - t0
                if r.returncode == 0:
                    best = d if best is None else min(best, d)
            if best is not None:
                rsize = os.path.getsize(rarc + ".arc")
                out["reference_bin"] = {
                    "ratio": round(in_bytes / rsize, 3),
                    "enc_reads_per_s": round(n_reads / best, 1),
                    "wall_s": round(best, 3),
                }
        except Exception as e:  # noqa: BLE001
            out["reference_bin"] = {"error": repr(e)[:200]}
    return out


def _bench_aligned(tmp: str, raw1: bytes) -> dict:
    """Aligned-SE throughput on the synthetic 500 kb reference (the
    BASELINE.md protocol: reference binary ~40k reads/s, 8,050/10k mapped,
    ratio 5.96x).  Measures the full pipeline: parse + align + encode,
    plus aligned DECODE timing + round-trip (reference decode: 0.22 s)."""
    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from maprate import synthetic_ref
    src1 = os.path.join(tmp, "in1.fq")
    with open(src1, "wb") as fh:
        fh.write(raw1)
    src1_md5 = _md5(src1)
    fa = synthetic_ref(parse_block(raw1, True))
    arc = os.path.join(tmp, "al.fqz")
    sbox = {}

    def _enc():
        sbox["s"] = compress_se_aligned(
            CodecParams(block_size_mb=8, threads=1), fa, src1, arc)
    _enc()                                                # warm
    dt = _best_of(_enc, budget_s=240)
    stats = sbox["s"]
    obox = {}

    def _dec():
        obox["o"] = decompress(arc, os.path.join(tmp, "alback"),
                               force=True, threads=1, ref=fa)
    _dec()                                                # warm
    al_ddt = _best_of(_dec, budget_s=120)
    out = {
        "reads_per_s": round(stats["reads"] / dt, 1),
        "vs_baseline_40k": round(stats["reads"] / dt / 40_000.0, 3),
        "mapped": stats["mapped"],
        "reads": stats["reads"],
        "ratio": round(stats["ratio"], 3),
        "wall_s": round(dt, 3),
        "decode_reads_per_s": round(stats["reads"] / al_ddt, 1),
        "decode_ok": _md5(obox["o"][0]) == src1_md5,
    }

    # --- -q long-seed mode (wide 44-bit seeds + one-indel rescue;
    # reference BWA-backed ratio 6.16x, BASELINE.md) ---
    qbox = {}

    def _encq():
        qbox["s"] = compress_se_aligned(
            CodecParams(block_size_mb=8, threads=1, seed_len=22,
                        max_indel=3), fa, src1, os.path.join(tmp, "q.fqz"))
    _encq()                                               # warm
    dq = _best_of(_encq, n_min=2, n_max=8, budget_s=120)
    sq = qbox["s"]
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
        pbox = {}

        def _encp():
            pbox["s"] = compress_pe_aligned(
                CodecParams(block_size_mb=8, threads=1), fa, src1, r2,
                os.path.join(tmp, "pe.fqz"))
        _encp()                                           # warm
        dp = _best_of(_encp, n_min=2, n_max=6, budget_s=120)
        sp = pbox["s"]
        out["pe_aligned"] = {"reads_per_s": round(sp["reads"] / dp, 1),
                             "mapped": sp["mapped"],
                             "ratio": round(sp["ratio"], 3)}
    return out


def _bench_selfref(tmp: str) -> dict:
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
    s0 = compress_se(CodecParams(block_size_mb=8, threads=1, self_align=0),
                     src, os.path.join(tmp, "cov0.fqz"))
    p = CodecParams(block_size_mb=8, threads=1, self_align=1)
    t0 = time.time()
    s1 = compress_se(p, src, os.path.join(tmp, "covS.fqz"))
    dt = time.time() - t0
    # auto gate (self_align=-1, the default): must pick -S here (high
    # coverage) and skip it on the telomeric bundled data
    pa = CodecParams(block_size_mb=8, threads=1)
    auto_on = pa.self_align == -1 and compress_se(
        pa, src, os.path.join(tmp, "covA.fqz"))["ratio"] > (
        s0["ratio"] + s1["ratio"]) / 2
    return {"ratio": round(s1["ratio"], 3),
            "plain_ratio": round(s0["ratio"], 3),
            "reads_per_s": round(12000 / dt, 1),
            "auto_picks_selfref": bool(auto_on)}


if __name__ == "__main__":
    main()
