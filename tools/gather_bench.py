"""Scattered-gather ceiling measurement (docs/DESIGN.md §1).

The wave decode and the aligner's candidate verify are bound by
table[idx] scattered gathers; this prints the measured rate on the
current device.  v5e via the axon tunnel measures ~110 M values/s —
that number is the per-chip ceiling quoted in DESIGN.md for table-driven
coding (TPUs have no hardware gather; Pallas/Mosaic lowers dynamic
indexing to the same loads, so a hand kernel cannot beat it).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    n = 12_800_000                                       # ~ frozen-table size
    rng = np.random.default_rng(0)
    # random contents: an iota table folds t[x] -> x and skips the gathers
    table = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    idx = jnp.asarray(rng.integers(0, n, 1 << 22), jnp.int32)

    from jax import lax

    @jax.jit
    def flat(t, i):
        # 8 dependent gathers (the *31 keeps value analysis honest)
        acc = i
        for _ in range(8):
            acc = t[(acc * 31 + i) % t.shape[0]]
        return acc.sum()

    T, L = 1600, 2048
    widx = jnp.asarray(rng.integers(0, n, (T, L)), jnp.int32)

    @jax.jit
    def scanned(t, wi):
        # wave-decode shape: L-wide gathers inside a scan over T waves
        def body(c, x):
            acc = x
            for _ in range(8):
                acc = t[(acc * 31 + x) % t.shape[0]]
            return c + acc.sum(), None
        return lax.scan(body, jnp.int32(0), wi)[0]

    out = {}
    for name, fn, args, count in (
            ("flat", flat, (table, idx), 8 * int(idx.shape[0])),
            ("per_wave_scan", scanned, (table, widx), 8 * T * L)):
        int(fn(*args))   # warm-up; int() forces a real device sync —
        # block_until_ready alone returns early through the async relay
        best = None
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                int(fn(*args))
            dt = (time.time() - t0) / 3
            best = dt if best is None else min(best, dt)
        out[name] = {"values_per_s": round(count / best, 0),
                     "wall_s": round(best, 4)}
    print(json.dumps({
        "metric": "scattered_gather_values_per_s",
        "platform": jax.devices()[0].platform,
        **out,
    }))


if __name__ == "__main__":
    main()
