"""End-to-end compress/decompress against a 2.2 Gbp reference — the
REAL beyond-int32 production trigger (no monkeypatch): prepare_ref sees
an index with > 2^31 positions and routes to ShardedAligner over the
8-virtual-device mesh; decode reconstructs mapped reads from the
reference with 4-byte positions.  One JSON line; ~25 min / ~60 GB."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import resource
    import tempfile

    import jax
    jax.config.update("jax_platforms", "cpu")

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.pipeline.aligned import compress_se_aligned
    from fastqueeze_tpu.pipeline.driver import decompress

    G = 2_200_000_000
    tmp = tempfile.mkdtemp(prefix="bigref")
    out = {"ref_bp": G}
    rng = np.random.default_rng(321)
    t0 = time.time()
    codes = rng.integers(0, 4, G, dtype=np.int64).astype(np.uint8)
    fa = os.path.join(tmp, "big.fa")
    letters = np.frombuffer(b"ACGT", np.uint8)
    with open(fa, "wb") as fh:
        fh.write(b">big\n")
        step = 1 << 26
        for s in range(0, G, step):
            chunk = letters[codes[s:s + step]]
            # single long line per chunk write (load_fasta strips \n)
            fh.write(chunk.tobytes())
            fh.write(b"\n")
    out["fasta_s"] = round(time.time() - t0, 1)

    R, L = 3000, 150
    starts = np.concatenate([
        rng.integers((1 << 31), G - L, R // 2),          # beyond int32
        rng.integers(0, 1 << 31, R - R // 2)])
    recs = []
    for i, st in enumerate(starts):
        r = codes[st:st + L].copy()
        err = rng.random(L) < 0.005
        r[err] ^= rng.integers(1, 4, int(err.sum())).astype(np.uint8)
        if i % 3 == 0:
            r = (3 - r)[::-1]
        recs.append(b"@b.%d\n%s\n+\n%s\n"
                    % (i, letters[r].tobytes(), bytes([70]) * L))
    fq = os.path.join(tmp, "reads.fq")
    with open(fq, "wb") as fh:
        fh.write(b"".join(recs))
    del codes
    import gc
    gc.collect()

    t0 = time.time()
    arc = os.path.join(tmp, "big.fqz")
    stats = compress_se_aligned(CodecParams(threads=1), fa, fq, arc)
    out["compress_s"] = round(time.time() - t0, 1)
    out["mapped"] = stats["mapped"]
    out["reads"] = stats["reads"]
    out["ratio"] = round(stats["ratio"], 3)
    t0 = time.time()
    outs = decompress(arc, os.path.join(tmp, "back"), force=True,
                      threads=1, ref=fa)
    out["decode_s"] = round(time.time() - t0, 1)
    out["dec_ok"] = (hashlib.md5(open(outs[0], "rb").read()).digest()
                     == hashlib.md5(open(fq, "rb").read()).digest())
    out["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
