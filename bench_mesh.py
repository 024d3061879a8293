"""Mesh scaling-efficiency benchmark (BASELINE.md target: >= 80 % reads/s
scaling efficiency from 1 device to N, block-data-parallel).

Runs the block-DP frozen encode step (parallel/mesh.py
encode_blocks_sharded — the same kernel the production pipeline
dispatches per block) over meshes of 1, 2, 4, ... N devices with one
block per device (weak scaling), and reports throughput and efficiency
(throughput_N / (N * throughput_1)).

On real multi-chip hardware this measures ICI-coupled scaling.  On this
box only one tunneled chip exists, so the default run uses the 8-virtual-
device CPU mesh (JAX_PLATFORMS=cpu, xla_force_host_platform_device_count)
— all virtual devices share one physical core, so *wall-clock* efficiency
is bounded by 1/N there; the per-device work constancy check and the
payload-equality invariant (tests/test_mesh.py) are what the CPU run
validates.  Point it at a real slice for true numbers.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    if "--real" not in sys.argv:
        # virtual-device CPU mesh by default (the tunnel exposes only one
        # real chip); pass --real to run on the actual accelerator mesh.
        # The axon sitecustomize imports jax at interpreter start, so env
        # vars alone are too late — switch platform via jax.config before
        # the first device query initializes a backend.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fastqueeze_tpu.models.base import QualModel
    from fastqueeze_tpu.ops import engine
    from fastqueeze_tpu.parallel.mesh import encode_blocks_sharded, make_mesh

    n_dev = len(jax.devices())
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    T, L = 256, 256          # 64k symbols per block
    n_halve = engine._n_halve(model, L)
    counts0 = engine.init_counts(model)
    rng = np.random.default_rng(0)

    results = []
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n)
        B = n                # one block per device: weak scaling
        syms = jnp.asarray(
            rng.integers(0, model.alphabet, (B, T, L)).astype(np.uint8))
        valid = jnp.ones((B, T, L), bool)
        pos = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None, :, None], (B, T, L))
        def sync(arr):
            # a host fetch is the only reliable sync: through the axon
            # relay block_until_ready can return before execution
            return float(jnp.sum(arr))

        # warm-up compile
        w, e, x = encode_blocks_sharded(mesh, model, n_halve, counts0,
                                        syms, valid, pos)
        sync(x)
        best = None
        for _ in range(3):
            t0 = time.time()
            w, e, x = encode_blocks_sharded(mesh, model, n_halve, counts0,
                                            syms, valid, pos)
            sync(x)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        sym_s = B * T * L / best
        results.append({"devices": n, "wall_s": round(best, 4),
                        "syms_per_s": round(sym_s, 1)})
        n *= 2

    base = results[0]["syms_per_s"]
    for r in results:
        r["efficiency"] = round(r["syms_per_s"] / (r["devices"] * base), 3)
    print(json.dumps({
        "metric": "mesh_block_dp_scaling",
        "value": results[-1]["efficiency"],
        "unit": "efficiency_at_max_devices",
        "platform": jax.devices()[0].platform,
        "note": ("virtual CPU devices share one core: wall-clock "
                 "efficiency is bounded by 1/N on this host"
                 if jax.devices()[0].platform == "cpu" else "real mesh"),
        "points": results,
    }))


if __name__ == "__main__":
    main()
