"""Device-kernel roofline accounting (VERDICT r4 #2): one JSON line.

BASELINE.md demands the coding inner loop "at speed-of-light per chip";
CLAUDE.md claims the wave scans sit on the scattered-gather ceiling.  This
tool turns both claims into numbers on the CURRENT device:

  1. measures the gather roof (tools/gather_bench.py shapes: flat and
     per-wave-scan) on this chip today;
  2. times the four production kernels DEVICE-ONLY (inputs resident, one
     fused jit per call, sync via scalar fetch — block_until_ready alone
     returns early through the axon async relay):
       frozen encode  (_encode_fused_frozen: 1 packed gather/sym)
       frozen decode  (_decode_fused_frozen: ternary descent,
                       ceil(log3 A) + 1 words gather /sym)
       adaptive encode/decode (_pass1/_decode: a full A-value row fetch
                       + row update per symbol — the reason adaptive
                       trails frozen by ~4x)
       aligner batch  (_align_batch, gapless two-strand)
  3. divides: achieved gathers/s = sym/s x analytic gathers/sym, and the
     fraction of the measured wave-scan roof each kernel reaches.

The per-symbol gather counts are structural (read off the kernel code,
cited inline), so fraction-of-roof ~ 1.0 means the kernel is
transfer-optimal for its algorithm; < 1 quantifies remaining headroom.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _sync_scalar(x) -> float:
    """Force completion through the async relay: fetch one value."""
    return float(np.asarray(x).reshape(-1)[0])


def _time_best(fn, n: int = 5, budget_s: float = 30.0) -> float:
    fn()                                   # warm (compile)
    best = None
    t_end = time.time() + budget_s
    for _ in range(n):
        t0 = time.time()
        fn()
        d = time.time() - t0
        best = d if best is None else min(best, d)
        if time.time() > t_end:
            break
    return best


def _gather_roof(jnp, jax):
    """gather_bench.py shapes, inline (smaller budget)."""
    from jax import lax
    rng = np.random.default_rng(0)
    n = 12_800_000
    table = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    T, L = 800, 2048
    widx = jnp.asarray(rng.integers(0, n, (T, L)), jnp.int32)

    @jax.jit
    def scanned(t, wi):
        def body(c, x):
            acc = x
            for _ in range(8):
                acc = t[(acc * 31 + x) % t.shape[0]]
            return c + acc.sum(), None
        return lax.scan(body, jnp.int32(0), wi)[0]

    idx = jnp.asarray(rng.integers(0, n, 1 << 21), jnp.int32)

    @jax.jit
    def flat(t, i):
        acc = i
        for _ in range(8):
            acc = t[(acc * 31 + i) % t.shape[0]]
        return acc.sum()

    d_scan = _time_best(lambda: _sync_scalar(scanned(table, widx)), n=4)
    d_flat = _time_best(lambda: _sync_scalar(flat(table, idx)), n=4)
    return {"flat_per_s": round(8 * (1 << 21) / d_flat, 0),
            "wave_scan_per_s": round(8 * T * L / d_scan, 0)}


def main() -> None:
    small = "--small" in sys.argv
    if "--cpu" in sys.argv or small:
        os.environ["FASTQUEEZE_NO_COMPILE_CACHE"] = "1"
    import jax
    if "--cpu" in sys.argv:
        # the axon sitecustomize forces jax_platforms="axon,cpu"; env
        # vars alone are not enough (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fastqueeze_tpu.config import CodecParams
    from fastqueeze_tpu.models.base import QualModel
    from fastqueeze_tpu.ops import engine

    out = {"platform": jax.devices()[0].platform,
           "gather_roof": _gather_roof(jnp, jax)}
    roof = out["gather_roof"]["wave_scan_per_s"]

    # --- representative production stream: qual ranks, A=40, qlevel 2 ---
    model = QualModel(alphabet=40, init=1, inc=8, cap=8192, qlevel=2)
    A = model.alphabet
    params = CodecParams()
    rng = np.random.default_rng(1)
    n_reads = 2_000 if small else 40_000
    rl = 100
    counts_per_read = np.full(n_reads, rl, np.int64)
    nsym = n_reads * rl
    # skewed symbols (binned-ish quals)
    flat = rng.choice(np.arange(A, dtype=np.uint8), nsym,
                      p=np.r_[np.full(4, 0.2), np.full(A - 4, 0.2 / (A - 4))])
    L = params.n_lanes(nsym)
    layout = engine.make_layout(counts_per_read, L)
    T = layout.T
    out["stream"] = {"n_sym": nsym, "T": T, "L": L, "alphabet": A}
    grid = engine.to_grid(layout, flat)
    pmode, packed, exc = engine._pack_for_upload(
        grid, engine._pack_mode(model, L))
    syms_dev = jnp.asarray(packed)
    exc_dev = jnp.asarray(exc)
    cg = jnp.asarray(engine._counts_grid(counts_per_read, L))
    c0 = engine.init_counts(model)

    # frozen table: adapt once over the stream so the table is realistic
    _, counts_tr = engine.encode_stream(model, params, flat,
                                        counts_per_read,
                                        return_counts=True)
    counts0 = jnp.asarray(counts_tr)

    def k_enc_frozen():
        wp, nw, xf = engine._encode_fused_frozen(
            model, T, pmode, counts0, syms_dev, cg, exc_dev)
        _sync_scalar(nw)
    d = _time_best(k_enc_frozen)
    # _pass1_frozen: ONE packed (F[s]|F[s+1]) u32 gather per symbol
    # (engine.py _pass1_frozen docstring); _pass2 emits words (writes)
    g = 1
    out["frozen_enc"] = {
        "sym_per_s": round(nsym / d, 0), "gathers_per_sym": g,
        "achieved_gather_per_s": round(nsym * g / d, 0),
        "frac_of_roof": round(nsym * g / d / roof, 3)}

    # frozen decode: payload from the frozen encode
    payload = engine.encode_stream(model, params, flat, counts_per_read,
                                   counts0=counts0, adapt=False)
    hdr = engine._HDR
    T2, L2, n_words, _ = hdr.unpack_from(payload, 0)
    states = np.frombuffer(payload, "<u4", L2, hdr.size)
    words = np.frombuffer(payload, "<u2", n_words, hdr.size + 4 * L2)
    bucket = 1024
    while bucket < n_words + 8:
        bucket <<= 1
    wpad = np.zeros(bucket, np.uint16)
    wpad[:n_words] = words
    states_dev = jnp.asarray(np.asarray(states, np.uint32))
    words_dev = jnp.asarray(wpad)

    def k_dec_frozen():
        syms, sent, n_exc = engine._decode_fused_frozen(
            model, T2, pmode, counts0, model.lane_init(L2), states_dev,
            words_dev, cg)
        _sync_scalar(syms[:1, :1])
    d = _time_best(k_dec_frozen)
    tern_d = 1
    while 3 ** tern_d < A:
        tern_d += 1
    # _decode_frozen: tern_d tree-node gathers + 1 words gather per
    # symbol (renorm fetch runs every wave)
    g = tern_d + 1
    out["frozen_dec"] = {
        "sym_per_s": round(nsym / d, 0), "gathers_per_sym": g,
        "achieved_gather_per_s": round(nsym * g / d, 0),
        "frac_of_roof": round(nsym * g / d / roof, 3)}

    # adaptive encode/decode: the scan fetches a FULL A-value row and
    # scatters a row update per symbol (engine._pass1 body) — the
    # roofline model counts A row values + 1 update per symbol
    nh = engine._n_halve(model, L)

    def k_enc_adapt():
        wp, nw, xf, co = engine._encode_fused_adapt(
            model, nh, T, pmode, c0, syms_dev, cg, exc_dev, 0)
        _sync_scalar(nw)
    d = _time_best(k_enc_adapt, n=3)
    g = A + 1
    out["adaptive_enc"] = {
        "sym_per_s": round(nsym / d, 0), "row_values_per_sym": g,
        "achieved_gather_per_s": round(nsym * g / d, 0),
        "frac_of_roof": round(nsym * g / d / roof, 3)}

    pay_a = engine.encode_stream(model, params, flat, counts_per_read)
    T3, L3, nw3, _ = hdr.unpack_from(pay_a, 0)
    st3 = np.frombuffer(pay_a, "<u4", L3, hdr.size)
    wd3 = np.frombuffer(pay_a, "<u2", nw3, hdr.size + 4 * L3)
    b3 = 1024
    while b3 < nw3 + 8:
        b3 <<= 1
    wp3 = np.zeros(b3, np.uint16)
    wp3[:nw3] = wd3
    st3_dev = jnp.asarray(np.asarray(st3, np.uint32))
    wd3_dev = jnp.asarray(wp3)

    def k_dec_adapt():
        (syms, sent, n_exc), co = engine._decode_fused_adapt(
            model, nh, T3, pmode, c0, model.lane_init(L3), st3_dev,
            wd3_dev, cg, 0)
        _sync_scalar(syms[:1, :1])
    d = _time_best(k_dec_adapt, n=3)
    out["adaptive_dec"] = {
        "sym_per_s": round(nsym / d, 0), "row_values_per_sym": g,
        "achieved_gather_per_s": round(nsym * g / d, 0),
        "frac_of_roof": round(nsym * g / d / roof, 3)}

    # --- aligner batch (gapless, fwd+rc fallback) ---
    from fastqueeze_tpu.align import hash as H
    from fastqueeze_tpu.align.index import build_from_ref
    from fastqueeze_tpu.align.ref import RefSeq
    glen = 500_000 if small else 4_000_000
    ref_codes = rng.integers(0, 4, glen).astype(np.uint8)
    ref = RefSeq(codes=ref_codes, amb_mask=np.zeros(glen, bool),
                 names=["r"], bounds=np.array([0, glen]), md5="r")
    p2 = CodecParams()
    idx = build_from_ref(ref, p2)
    al = H.Aligner(idx, p2)
    R = 1024 if small else 4096
    Lr = 100
    starts = rng.integers(0, glen - Lr, R)
    lp = al._lp_bucket(Lr)
    cgrid = np.zeros((R, lp), np.uint8)
    win = ref_codes[starts[:, None] + np.arange(Lr)]
    mut = rng.random((R, Lr)) < 0.01
    win = np.where(mut, (win + 1) % 4, win)
    rc = rng.random(R) < 0.5
    win[rc] = 3 - win[rc][:, ::-1]
    cgrid[:, :Lr] = win
    dgrid = np.zeros((R, lp), bool)
    lengths = np.full(R, Lr, np.int64)
    cfg = H.AlignConfig(k=idx.k, stride=p2.seed_stride,
                        n_cand=p2.seed_max_occ, max_mis=p2.max_mis,
                        both_strands=p2.both_strands, lp=lp,
                        l1_shift=al._l1_shift,
                        search_steps=al._search_steps, wide=al.wide)
    # already device-resident (Aligner._dev_arrays); _keys is a (hi, lo)
    # tuple in wide mode, so no jnp.asarray re-wrap
    keys_d, offs_d, pos_d, pk_d, l1_d = (
        al._keys, al._offsets, al._positions, al._packed, al._l1)
    cg_d, dg_d = jnp.asarray(cgrid), jnp.asarray(dgrid)
    ln_d = jnp.asarray(lengths.astype(np.int32))

    def k_align():
        m, pos, rev, mm = H._align_batch(
            cfg, keys_d, offs_d, pos_d, pk_d, l1_d, jnp.int32(idx.ref_len),
            cg_d, dg_d, ln_d)
        _sync_scalar(m[:1])
    d = _time_best(k_align, n=3)
    # analytic gathers per read per strand (gapless tier): seed probes
    # ((Lr-k)/stride + 1) x (search_steps key gathers + 1 l1) + n_cand
    # window verifies x (lp/16 + 1 packed words + 1 position) — both
    # strands run when RC reads are present (half here)
    n_seed = (Lr - idx.k) // p2.seed_stride + 1
    g_read = 2 * (n_seed * (cfg.search_steps + 1)
                  + cfg.n_cand * (lp // 16 + 2))
    out["aligner"] = {
        "reads_per_s": round(R / d, 0),
        "gathers_per_read_model": g_read,
        "achieved_gather_per_s": round(R * g_read / d, 0),
        "frac_of_roof": round(R * g_read / d / roof, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
