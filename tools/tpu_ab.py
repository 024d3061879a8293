"""TPU A/B harness for the tunnel-bound optimizations.

Runs full compress_se / decompress passes over the replicated bench
input on the real chip and reports reads/s for each configuration:

  base        : current defaults (sentinel packs + speculative fetch on)
  no_sentinel : _EXC_FRAC_MAX = -1 (flat 2/4/6-bit h2d packs)
  no_spec     : speculative words fetch disabled (2 round-trips/stream)
  lane_t=N    : lane_target_symbols sweep (wider lanes amortize the
                wave-scan gathers better; costs L x u32 of final states
                per stream -- encoder-side only, the decoder reads L
                from the payload header)
  dec_t=N     : decode thread sweep

Usage:  python tools/tpu_ab.py [--reps 10] [--quick]
Writes one JSON line per config to stdout; safe to re-run (memoized
training + XLA cache make later configs cheap).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST_FQ = "/root/reference/test/ERR2755197_test_1.fq"


def _sync_probe():
    """Bounded link check (the tunnel can be fully dead)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np\n"
             "x = jax.device_put(np.ones(1<<20, np.uint8))\n"
             "np.asarray(x); print(jax.devices()[0].platform)"],
            capture_output=True, timeout=120, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _best_of(fn, n, budget_s):
    best = None
    t_end = time.time() + budget_s
    for k in range(n):
        t0 = time.time()
        fn()
        d = time.time() - t0
        best = d if best is None else min(best, d)
        if time.time() > t_end:
            break
    return best


def main():
    reps = 10
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    quick = "--quick" in sys.argv
    if "--cpu" in sys.argv:
        # validation mode: exercises every config on the CPU backend with
        # a small input (numbers meaningless; catches harness bugs so the
        # real run can't die mid-sweep)
        os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"
        import jax
        jax.config.update("jax_platforms", "cpu")
        reps, quick = 1, True
    elif not _sync_probe():
        print(json.dumps({"error": "tunnel dead"}))
        return

    # Every configuration here prices the DEVICE engine (that is the whole
    # point of the A/B: plain runs auto-route to the bit-identical host
    # backend, which has its own bench).  Force device routing for the
    # coders and the aligner unless the caller already chose.
    for var in ("FASTQUEEZE_FROZEN_EXEC", "FASTQUEEZE_ADAPT_EXEC",
                "FASTQUEEZE_ALIGN_EXEC"):
        os.environ.setdefault(var, "device")

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.driver import compress_se, decompress
    import fastqueeze_tpu.ops.engine as E

    tmp = tempfile.mkdtemp(prefix="fqzab")
    src = os.path.join(tmp, "in.fq")
    raw = open(TEST_FQ, "rb").read()
    with open(src, "wb") as fh:
        for _ in range(reps):
            fh.write(raw)
    n_reads = (raw.count(b"\n") // 4) * reps
    runs = 2 if quick else 4
    budget = 120 if quick else 240

    def enc(tag, **pkw):
        p = CodecParams(block_size_mb=8, threads=3, **pkw)
        out = os.path.join(tmp, f"{tag}.fqz")
        compress_se(p, src, out)                      # warm compile
        dt = _best_of(lambda: compress_se(
            CodecParams(block_size_mb=8, threads=3, **pkw), src, out),
            runs, budget)
        return out, dt

    def dec(arc, threads):
        decompress(arc, os.path.join(tmp, "back"), force=True,
                   threads=threads)                   # warm
        return _best_of(lambda: decompress(
            arc, os.path.join(tmp, "back"), force=True, threads=threads),
            runs, budget)

    results = {}

    # --- base ---
    arc, dt = enc("base")
    results["base_enc"] = n_reads / dt
    results["base_size"] = os.path.getsize(arc)
    results["base_dec_t2"] = n_reads / dec(arc, 2)
    results["base_dec_t3"] = n_reads / dec(arc, 3)
    print(json.dumps({"cfg": "base", **{k: round(v, 1) for k, v in
                                        results.items()}}), flush=True)

    # --- sentinel packs off ---
    old = E._EXC_FRAC_MAX
    E._EXC_FRAC_MAX = -1.0
    try:
        arc2, dt = enc("nosent")
        r = n_reads / dt
        print(json.dumps({"cfg": "no_sentinel", "enc": round(r, 1),
                          "size": os.path.getsize(arc2)}), flush=True)
    finally:
        E._EXC_FRAC_MAX = old

    # --- speculative fetch off ---
    class _NoEst(dict):                      # .get always misses
        def get(self, k, d=None):
            return None
    orig_get = E._NWORDS_EST
    try:
        E._NWORDS_EST = _NoEst()
        arc3, dt = enc("nospec")
        print(json.dumps({"cfg": "no_spec", "enc": round(n_reads / dt, 1)}),
              flush=True)
    finally:
        E._NWORDS_EST = orig_get

    # --- decode d2h sentinel fetch off ---
    orig_dget = E._DEXC_EST
    try:
        E._DEXC_EST = _NoEst()
        d2 = dec(arc, 2)
        print(json.dumps({"cfg": "no_dec_sentinel",
                          "dec": round(n_reads / d2, 1)}), flush=True)
    finally:
        E._DEXC_EST = orig_dget

    # --- lane-width sweep (encoder-side; decode adapts from header) ---
    for lt in ([2048] if quick else [1024, 2048, 8192, 16384]):
        arc4, dt = enc(f"lt{lt}", lane_target_symbols=lt)
        d2 = dec(arc4, 2)
        print(json.dumps({"cfg": f"lane_t={lt}",
                          "enc": round(n_reads / dt, 1),
                          "dec": round(n_reads / d2, 1),
                          "size": os.path.getsize(arc4)}), flush=True)

    # --- adaptive path (use_model=-1): device wave-scan encode+decode,
    # and the 3-round-old _wave_update_tot question — does running the
    # row-halving fix under lax.cond (skipping ~half the waves' two (L,A)
    # table round-trips) actually win on TPU?  The knob shapes traced HLO,
    # so each arm runs in its own process (XLA disk cache keeps re-runs
    # cheap).
    import subprocess
    adapt_script = (
        "import json, os, sys, time, tempfile\n"
        "sys.path.insert(0, %r)\n"
        "from fastqueeze_tpu.config import CodecParams\n"
        "from fastqueeze_tpu.pipeline.driver import compress_se, decompress\n"
        "src, runs, budget = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])\n"
        "tmp = tempfile.mkdtemp(prefix='fqzwc')\n"
        "out = os.path.join(tmp, 'a.fqz')\n"
        "mk = lambda: CodecParams(block_size_mb=8, threads=3, use_model=-1)\n"
        "compress_se(mk(), src, out)\n"
        "best = None; t_end = time.time() + budget\n"
        "for _ in range(runs):\n"
        "    t0 = time.time(); compress_se(mk(), src, out)\n"
        "    d = time.time() - t0\n"
        "    best = d if best is None else min(best, d)\n"
        "    if time.time() > t_end: break\n"
        "bd = None\n"
        "decompress(out, os.path.join(tmp, 'b'), force=True, threads=2)\n"
        "for _ in range(runs):\n"
        "    t0 = time.time()\n"
        "    decompress(out, os.path.join(tmp, 'b'), force=True, threads=2)\n"
        "    d = time.time() - t0\n"
        "    bd = d if bd is None else min(bd, d)\n"
        "    if time.time() > t_end + budget: break\n"
        "print(json.dumps({'enc_s': best, 'dec_s': bd,"
        " 'size': os.path.getsize(out)}))\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    for cond in ("1", "0"):
        env = dict(os.environ, FASTQUEEZE_WAVE_COND=cond)
        try:
            r = subprocess.run(
                [sys.executable, "-c", adapt_script, src, str(runs),
                 str(budget)],
                capture_output=True, text=True, timeout=1800, env=env)
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() \
                else ""
            d = json.loads(line) if line.startswith("{") else {
                "error": (r.stderr or "no output")[-400:]}
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            d = {"error": repr(e)[:400]}
        out_d = {"cfg": f"adaptive_wave_cond={cond}"}
        if "enc_s" in d:
            out_d["enc"] = round(n_reads / d["enc_s"], 1)
            if d.get("dec_s"):
                out_d["dec"] = round(n_reads / d["dec_s"], 1)
            out_d["size"] = d["size"]
        else:
            out_d.update(d)
        print(json.dumps(out_d), flush=True)

    # --- aligned-SE: aligner batch-size sweep (fewer, larger dispatches
    # vs the ~36 ms round-trip; BASELINE row = 40k reads/s) ---
    from fastqueeze_tpu.align import hash as H
    from fastqueeze_tpu.io.fastq import parse_block
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from maprate import synthetic_ref
    src1 = os.path.join(tmp, "in1.fq")
    with open(src1, "wb") as fh:
        fh.write(raw)
    fa = synthetic_ref(parse_block(raw, True))
    for bsz in ([4096] if quick else [4096, 16384]):
        old_b = H.Aligner.BATCH
        H.Aligner.BATCH = bsz
        try:
            p = CodecParams(block_size_mb=8, threads=2)
            out = os.path.join(tmp, f"al{bsz}.fqz")
            stats = compress_se_aligned(p, fa, src1, out)   # warm
            dt = _best_of(lambda: compress_se_aligned(
                CodecParams(block_size_mb=8, threads=2), fa, src1, out),
                runs, budget)
            print(json.dumps({"cfg": f"aligned_B={bsz}",
                              "enc": round(stats["reads"] / dt, 1),
                              "mapped": stats["mapped"]}), flush=True)
        finally:
            H.Aligner.BATCH = old_b


if __name__ == "__main__":
    main()
