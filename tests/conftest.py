import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4.4).  The axon sitecustomize
# registers the TPU backend at interpreter start and forces
# jax_platforms="axon,cpu", so plain env vars are not enough — override the
# config after importing jax.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU persistent-cache entries are host-ISA-stamped AOT code; loading a
# mismatched entry can SIGILL/ABRT (seen on this box).  Tests always compile
# fresh.
os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; on this box the compile of a fresh kernel after ~120 tests
    segfaults inside backend_compile_and_load (reproduced 4/4 full-suite
    runs at the same test, never in file-level or isolated runs, and
    MALLOC_CHECK_=3 sees nothing — i.e. late-compile breakage from
    executable accumulation, not heap corruption).  Bounding the live
    program count per module keeps every compile early-ish and cheap.
    """
    yield
    import jax
    jax.clear_caches()
