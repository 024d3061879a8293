"""Host-native ADAPTIVE wave coder vs the device engine.

native/adaptwave.cpp must reproduce engine._pass1/_pass2/_decode (the
per-wave adaptive path, chunk = 0) BIT-IDENTICALLY — payload bytes and
decoded symbols — so routing a stream to either backend can never change
an archive.  Mirrors tests/test_host_frozen.py for the frozen path.
"""

import numpy as np
import pytest

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.io import native
from fastqueeze_tpu.models.base import qual_model_for, seq_model_from_params
from fastqueeze_tpu.ops import engine, host_adapt

pytestmark = pytest.mark.skipif(
    native.get_lib() is None
    or not hasattr(native.get_lib(), "fq_adapt_encode"),
    reason="native adaptive coder unavailable")


def _lengths(rng, R):
    lens = rng.integers(0, 150, R).astype(np.int64)
    lens[rng.random(R) < 0.05] = 0          # empty reads exercise the
    return lens                              # lane advance-skip path


@pytest.mark.parametrize("kind", ["seq", "qual"])
def test_adaptive_payload_bit_identical(kind):
    p = CodecParams()
    rng = np.random.default_rng(11)
    lens = _lengths(rng, 300)
    nsym = int(lens.sum())
    if kind == "seq":
        model = seq_model_from_params(p)
        syms = rng.integers(0, 4, nsym).astype(np.uint8)
    else:
        model = qual_model_for(p, 41)
        syms = np.minimum(rng.poisson(6, nsym), 40).astype(np.uint8)

    assert host_adapt.route(p, model)
    pay_dev = engine.encode_stream(model, p, syms, lens, adapt=True)
    pay_host = host_adapt.encode_job(model, p, syms, lens).finalize()
    assert pay_dev == pay_host

    # cross-backend decode: host decodes the device payload and vice versa
    back_host = host_adapt.decode_job(model, p, pay_dev, lens).finalize()
    np.testing.assert_array_equal(back_host, syms)
    back_dev = engine.decode_stream(model, p, pay_host, lens, adapt=True)
    np.testing.assert_array_equal(np.asarray(back_dev), syms)


def test_qlevel3_and_deep_qctx_routes():
    """qlevel 3 (position bits) and a hashed rank-chain scheme both walk
    the QualM mirror; payloads must match the engine exactly."""
    rng = np.random.default_rng(5)
    lens = rng.integers(1, 120, 150).astype(np.int64)
    nsym = int(lens.sum())
    syms = np.minimum(rng.poisson(4, nsym), 15).astype(np.uint8)
    for pp in (CodecParams(qlevel=3),
               CodecParams(qctx_k=4, qctx_base=16, qctx_hash_bits=12),
               # very deep hashed chain (the k=6 candidate scheme): the
               # chain value overflows 32 bits — every backend must wrap
               # mod 2^32 identically before the Knuth hash
               CodecParams(qctx_k=6, qctx_base=16, qctx_hash_bits=14)):
        model = qual_model_for(pp, 16)
        if pp.qlevel > 2:
            # qlevel 3 keeps the fqzcomp formula with pos bits
            assert model.qlevel == 3
        pay_dev = engine.encode_stream(model, pp, syms, lens, adapt=True)
        job = host_adapt.encode_job(model, pp, syms, lens)
        assert job is not None
        assert pay_dev == job.finalize()
        back = host_adapt.decode_job(model, pp, pay_dev, lens).finalize()
        np.testing.assert_array_equal(back, syms)


def test_route_respects_overrides(monkeypatch):
    p = CodecParams()
    model = seq_model_from_params(p)
    monkeypatch.setenv("FASTQUEEZE_ADAPT_EXEC", "device")
    assert not host_adapt.route(p, model)
    monkeypatch.setenv("FASTQUEEZE_ADAPT_EXEC", "host")
    assert host_adapt.route(p, model)
    monkeypatch.delenv("FASTQUEEZE_ADAPT_EXEC")
    # mesh runs keep the device path by default
    assert not host_adapt.route(CodecParams(mesh_n=4), model)
    # semi-adaptive chunked walks are device-only
    assert not host_adapt.route(CodecParams(adapt_chunk=64), model)


def test_corrupt_payload_rejected():
    p = CodecParams()
    model = seq_model_from_params(p)
    rng = np.random.default_rng(2)
    lens = rng.integers(1, 80, 50).astype(np.int64)
    syms = rng.integers(0, 4, int(lens.sum())).astype(np.uint8)
    pay = host_adapt.encode_job(model, p, syms, lens).finalize()
    with pytest.raises(ValueError):
        host_adapt.decode_job(model, p, pay, lens[:-1])


def test_route_rejects_overcap_initial_rows():
    """init * alphabet > cap: the native coder's one-flush full rescale
    diverges from the device's bounded n_halve passes — such streams must
    not take the native fast path (and cap < alphabet could never rescale
    below the all-ones total at all)."""
    from fastqueeze_tpu.models.base import QualModel
    p = CodecParams()
    m = QualModel(alphabet=8, init=4096, inc=8, cap=4096)
    assert not host_adapt.route(p, m)
    m2 = QualModel(alphabet=8, init=1, inc=8, cap=4)   # cap < alphabet
    assert not host_adapt.route(p, m2)
    assert host_adapt.route(p, QualModel(alphabet=8, init=1, inc=8,
                                         cap=8192))


def test_native_rescale_terminates_below_alphabet_cap():
    """Defense in depth for direct native use: cap < alphabet hits the
    all-ones fixed point and must terminate, not spin (pre-fix this hung
    forever).  Run in a subprocess so a regression fails, not hangs."""
    import subprocess
    import sys
    code = (
        "import numpy as np\n"
        "from fastqueeze_tpu.io import native\n"
        "from fastqueeze_tpu.models.base import QualModel\n"
        "from fastqueeze_tpu.ops import host_adapt\n"
        "from fastqueeze_tpu.config import CodecParams\n"
        "m = QualModel(alphabet=8, init=1, inc=8, cap=4)\n"
        "lens = np.full(16, 40, np.int64)\n"
        "syms = np.arange(640, dtype=np.uint8) % 8\n"
        "j = host_adapt.encode_job(m, CodecParams(), syms, lens)\n"
        "print('DONE', 0 if j is None else len(j.finalize()))\n")
    # generous timeout: the subprocess pays a cold jax import while the
    # full suite saturates the 1-vCPU box; a REAL regression spins in
    # flush() forever, so any finite bound distinguishes the two
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=580, text=True, cwd=repo, env=env)
    assert r.returncode == 0 and "DONE" in r.stdout, r.stderr[-500:]


def test_quant_no_int32_overflow():
    """engine._quant must match the host int64 quantizer for row totals
    past 2^17 (the direct int32 cumz*M product overflowed and produced
    negative device tables at validated parameter extremes)."""
    import numpy as np

    from fastqueeze_tpu.ops.host_frozen import quantize

    rng = np.random.default_rng(23)
    rows = np.concatenate([
        np.full((1, 8), 16384, np.int32),             # total 2^17 exactly
        np.full((1, 8), 1 << 19, np.int32),           # total 2^22
        rng.integers(1, 1 << 14, (16, 8)).astype(np.int32),
        np.ones((1, 8), np.int32),
    ])
    dev = np.asarray(engine._quant_full(rows))
    host = quantize(rows).astype(np.int64)
    np.testing.assert_array_equal(dev, host)
    assert int(dev[:, -1].min()) == int(dev[:, -1].max()) == 16384
