"""fastqueeze_tpu — a TPU-native FASTQ compression framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
SeqArc v1.6 compressor (see SURVEY.md): block-parallel FASTQ compression with
adaptive context models (sequence / quality / name / length / alignment-info
streams), optional reference-based alignment, lossy quality transform, and a
seekable TLV container format.

Key architectural departures from the reference (which is serial, per-symbol
range coding in C++ — SURVEY.md §2.1):

* Entropy coding is an **interleaved rANS** coder over many SIMD lanes, with
  **wave-synchronized adaptive models**: all lanes code symbol ``t`` against
  the model state produced by waves ``< t``, then the model tables are updated
  with the whole wave at once (a batched scatter-add).  Encode and decode
  perform bit-identical integer model walks, so the coder stays adaptive while
  being fully vectorized on the VPU.
* Alignment is batched seed-lookup + gapless XOR/popcount extension over a
  2-bit packed reference, instead of a per-read scalar loop.
* Scale-out is block data-parallelism over a ``jax.sharding.Mesh`` instead of
  pthreads.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: the wave-coder jits once per
    (model, T, L) bucket; caching makes every later process start warm
    (first-ever compile of a shape is 10-40 s on TPU)."""
    if _os.environ.get("FASTQUEEZE_NO_COMPILE_CACHE"):
        return
    # CPU-only runs (tests, dryrun_multichip) must NOT use the persistent
    # cache: XLA:CPU cache payloads are AOT-compiled machine code stamped
    # with the builder's CPU features, and loading an entry whose feature
    # set mismatches the running host (observed on this box even across
    # processes) can SIGILL/SIGSEGV/SIGABRT instead of falling back to a
    # recompile.  TPU executables have no host-ISA dependence, so the
    # warm-start cache stays on for the real backend.
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    import jax
    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "fastqueeze_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compile_cache()

from fastqueeze_tpu.config import CodecParams  # noqa: F401
from fastqueeze_tpu import api  # noqa: F401  (one-call library surface)
