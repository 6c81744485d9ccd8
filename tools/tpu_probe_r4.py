"""Round-4 perf probe: v1 (cm) vs v2 (cm2) headline routes, in-graph timing.

Protocol = tools/tpu_probe_r3.py's in-graph ``lax.fori_loop`` repetition
(the only trustworthy one on this tunnel): per-step =
``(t(K2) - t(K1)) / (K2 - K1)`` with the loop body salted by a
runtime-zero so XLA cannot hoist or CSE it.

Payloads are EXACTLY bench.py's dense and sparse captures (round-3's
PROBE/BENCH "spread" was partly signal difference: the r3 probe used a
one-train signal; bench's dense point has two trains and ~32k tiny
transients).  Parts (env PROBE_PARTS, default "AB"):

A. Full-graph A/B: ``forward_packed`` route cm (r3 ship) vs cm2 (r4),
   dense + sparse.
B. Prefix bisect of the cm2 graph (streams -> nf -> latch -> edges ->
   tiny/sat/tiers -> short kernel -> long kernel -> full).
C. Noise-floor radix-bits sweep (1/2/4/8) on the cm2 streams, and the
   latch t_blk sweep (1024/2048/4096), both as graph prefixes.

Writes PROBE_r04.json at the repo root.  Single TPU process only.
"""
import json
import os
import sys
import time

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_scalar(x):
    leaf = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")][0]
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].astype(jnp.float32))(leaf))[0])


K1 = int(os.environ.get("PROBE_K1", 5))
K2 = int(os.environ.get("PROBE_K2", 45))
REPS = int(os.environ.get("PROBE_REPS", 3))


def _salted(a, salt):
    idx = (0,) * a.ndim
    if a.dtype == jnp.bool_ or jnp.issubdtype(a.dtype, jnp.integer):
        return a.at[idx].set(a[idx] ^ salt.astype(a.dtype))
    return a.at[idx].add(salt.astype(a.dtype))


def make_looped(fn, n_salt=1):
    @jax.jit
    def run(K, *args):
        def body(i, acc):
            salt = jnp.isnan(acc).astype(jnp.int32) + i * 0
            sargs = tuple(
                _salted(a, salt) if j < n_salt else a
                for j, a in enumerate(args)
            )
            return acc * 0.5 + fn(*sargs)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def graph_time(name, fn, *args, n_salt=1, iters=None, reps=None):
    """Round-4 corrected protocol (KSWEEP_r04.json): distinct K per
    dispatch; pilot-calibrated K1 past the flat region where device
    execution hides under the ~0.43 s transport round trip (differencing
    from inside it under-reports — the round-2/3 bias); median of
    per-rep differences over a >=1.2 s signal span."""
    iters = (K2 - K1) if iters is None else iters
    reps = REPS if reps is None else reps
    run = make_looped(fn, n_salt=n_salt)

    def dispatch(k):
        t0 = time.perf_counter()
        fetch_scalar(run(k, *args))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    fetch_scalar(run(3, *args))
    compile_s = time.perf_counter() - t0
    t_floor = dispatch(4)
    # Geometric pilot: double K until the dispatch clearly exits the flat
    # region (a fixed-K pilot under-runs it for fast graphs -> junk slope
    # -> unbounded K1, the worker-crash mode).  s_est = t/K slightly
    # overestimates the step, keeping K1 and the budget conservative.
    pk = max(8, iters // 4)
    t_pilot = dispatch(pk)
    while t_pilot < 1.6 * t_floor and pk < 4000:
        pk *= 2
        t_pilot = dispatch(pk)
    s_pilot = t_pilot / pk
    # Bound every dispatch to ~8 s of device time (longer crashed the worker).
    budget = max(int(8.0 / s_pilot), 8)
    k1 = min(max(8, int(2.5 * t_floor / s_pilot) + 1), budget)
    span = min(max(iters, int(1.2 / s_pilot) + 1), budget, 4000)
    ests = []
    for r in range(reps):
        t1 = dispatch(k1 + r)
        t2 = dispatch(k1 + span + r)
        ests.append(max(t2 - t1, 1e-9) / span)
    dt = float(np.median(ests))
    spread = (max(ests) - min(ests)) / max(dt, 1e-9)
    log(f"{name:<30s} {dt*1e3:9.3f} ms/iter   (compile {compile_s:.0f}s, "
        f"K1={k1}, span={span}, rep spread {spread*100:.0f}%)")
    return dt


from bench import _make_capture, _quantize  # noqa: E402
from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed_cm2,
)
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums_cm
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats,
)
from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm

log("devices:", jax.devices())
BANDS = 64
FRAMES = int(os.environ.get("PROBE_FRAMES", 262144))
N = BANDS * FRAMES
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(BANDS, pdw_cfg=cfg)
taps = pipe.channelizer.taps_rev
THR = 10.0 ** (cfg.snr_threshold_db / 10.0)
SW = pdwmod._SHORT_WINDOW
P_SLOTS = ((cfg.max_pulses + TILE - 1) // TILE) * TILE

dev = jax.devices()[0]
xq_dense = jax.device_put(np.ascontiguousarray(
    _quantize(_make_capture(N, BANDS))).view(np.int32).ravel(), dev)
xq_sparse = jax.device_put(np.ascontiguousarray(
    _quantize(_make_capture(N, BANDS, sparse=True))).view(np.int32).ravel(),
    dev)

results = {}


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def full_route(route):
    def fn(q):
        nf, _, batch = pipe.forward_packed(q, bit_width=12, route=route)
        return touch(nf, batch.mag, batch.snr_db, batch.freq_offset_hz,
                     batch.toa_idx.astype(jnp.float32))
    return fn


def run_part_a():
    for route in ("cm2", "cm"):
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"A.{route}_{label}", full_route(route), q)
            results[f"A_{route}_{label}_ms"] = round(dt * 1e3, 3)


# ---- cm2 graph stages (hand mirror of dsp/pdw.py:_extract_channelized_cm2)

def stage_streams(q):
    return pallas_channelize_streams_packed_cm2(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)


def stage_nf(mag_cm, bits=4):
    return pdwmod.noise_floor_cm(mag_cm, BANDS, FRAMES, bits=bits)


def stage_latch(mag_cm, nf, t_blk=2048):
    return pallas_latch_cumsums_cm(mag_cm, nf * THR, nf * THR, BANDS,
                                   t_blk=t_blk)


def stage_edges(packed, t_len):
    r = packed.shape[0]
    ranks = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (r, P_SLOTS))
    idx = find_ranks_cm(packed, ranks, t_len)
    return idx[:BANDS], idx[r // 2:r // 2 + BANDS]


def build_prefixes(nf_bits=4, t_blk=2048):
    m, t_len = BANDS, FRAMES

    def b0(q):
        return touch(*stage_streams(q))

    def b1(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        return touch(mag_cm, dph_cm, satcs, stage_nf(mag_cm, nf_bits))

    def b2(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm, nf_bits)
        return touch(mag_cm, dph_cm, satcs, nf,
                     stage_latch(mag_cm, nf, t_blk))

    def b3(q):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm, nf_bits)
        packed = stage_latch(mag_cm, nf, t_blk)
        toa, te = stage_edges(packed, t_len)
        return touch(mag_cm, dph_cm, satcs, nf, packed, toa, te)

    def tail(q, tiers=()):
        mag_cm, dph_cm, satcs = stage_streams(q)
        nf = stage_nf(mag_cm, nf_bits)
        packed = stage_latch(mag_cm, nf, t_blk)
        toa, te = stage_edges(packed, t_len)
        toa, te = jax.lax.optimization_barrier((toa, te))
        plen = te - toa + 1
        valid_slot = toa < t_len
        closed = valid_slot & (te < t_len)
        safe_toa = jnp.minimum(toa, t_len - 1)
        safe_te = jnp.minimum(te, t_len - 1)
        mag_a = jnp.take_along_axis(mag_cm[:m], safe_toa, axis=1)
        mag_b = jnp.take_along_axis(mag_cm[:m], safe_te, axis=1)
        tiny_mag = jnp.where(plen >= 2, 0.5 * (mag_a + mag_b), mag_a)
        tiny_dph = jnp.where(plen >= 2,
                             jnp.take_along_axis(dph_cm[:m], safe_toa, axis=1),
                             jnp.float32(np.nan))
        s_hi = jnp.take_along_axis(satcs[:m], jnp.maximum(safe_te - 1, 0),
                                   axis=1)
        s_lo = jnp.take_along_axis(satcs[:m], safe_toa, axis=1)
        sat_any = (s_hi - s_lo) > 0.5
        is_tiny = closed & (plen <= 2)
        is_short = closed & ~is_tiny & (plen <= SW)
        is_long = valid_slot & ~is_tiny & ~is_short
        acc = [mag_cm, dph_cm, nf, toa, te, tiny_mag, tiny_dph, sat_any,
               is_tiny]
        sentinel = jnp.int32(t_len)
        for sel, window in tiers:
            sel_m = {"short": is_short, "long": is_long}[sel]
            t_sel = jnp.where(sel_m, toa, sentinel)
            e_sel = jnp.where(sel_m, te, sentinel)
            mm, dd, _ = pulse_stats(mag_cm, dph_cm, None, t_sel, e_sel,
                                    window=window, t_len=t_len)
            acc += [mm, dd]
        return touch(*acc)

    return [("b0_streams", b0), ("b1_nf", b1), ("b2_latch", b2),
            ("b3_edges", b3),
            ("b4_tiny_sat", lambda q: tail(q)),
            ("b5_short", lambda q: tail(q, (("short", SW),))),
            ("b6_long", lambda q: tail(
                q, (("short", SW), ("long", cfg.max_pulse_samples)))),
            ("b7_full", full_route("cm2"))]


def run_part_b():
    prev = 0.0
    for name, fn in build_prefixes():
        dt = graph_time("B." + name, fn, xq_dense)
        results["B_" + name + "_ms"] = round(dt * 1e3, 3)
        results["B_marg_" + name + "_ms"] = round((dt - prev) * 1e3, 3)
        prev = dt


def run_part_c():
    for bits in (1, 2, 4, 8):
        _, b1, *_ = build_prefixes(nf_bits=bits)
        dt = graph_time(f"C.nf_bits{bits}", b1[1], xq_dense)
        results[f"C_nf_bits{bits}_ms"] = round(dt * 1e3, 3)
    for t_blk in (1024, 2048, 4096):
        pre = build_prefixes(t_blk=t_blk)
        dt = graph_time(f"C.latch_tblk{t_blk}", pre[2][1], xq_dense)
        results[f"C_latch_tblk{t_blk}_ms"] = round(dt * 1e3, 3)


def run_part_d():
    """Stats-tier variants on the cm2 base, full graph: grid-ungated (the
    part-A cm2), grid-gated (skip dead slots' DMAs behind scalar
    branches), and v1-style flat compaction."""
    for route in ("cm2g", "cm2c"):
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"D.{route}_{label}", full_route(route), q)
            results[f"D_{route}_{label}_ms"] = round(dt * 1e3, 3)


def run_part_e():
    """Full-graph knob A/Bs (the b-prefix graphs elide on this transport —
    only end-to-end numbers are trustworthy): noise-floor radix bits and
    latch t_blk, via in-process wrapping of the route's helpers."""
    import functools as ft

    orig_nf = pdwmod.noise_floor_cm
    for bits in (1, 4):
        pdwmod.noise_floor_cm = ft.partial(orig_nf.__wrapped__ if hasattr(
            orig_nf, "__wrapped__") else orig_nf, bits=bits)
        try:
            dt = graph_time(f"E.nf_bits{bits}_dense", full_route("cm2"),
                            xq_dense)
            results[f"E_nf_bits{bits}_dense_ms"] = round(dt * 1e3, 3)
        finally:
            pdwmod.noise_floor_cm = orig_nf

    import sdr_channelizer_tpu.ops.pallas.latch_kernel as lk

    orig_latch = lk.pallas_latch_cumsums_cm
    for t_blk in (1024, 4096):
        def patched(mag_cm, lead, trail, m_real, t_blk=t_blk):
            return orig_latch(mag_cm, lead, trail, m_real, t_blk=t_blk)
        # dsp.pdw imports the symbol inside the function body from the
        # module, so patching the module attribute reaches the route.
        lk.pallas_latch_cumsums_cm = patched
        try:
            dt = graph_time(f"E.latch_tblk{t_blk}_dense", full_route("cm2"),
                            xq_dense)
            results[f"E_latch_tblk{t_blk}_dense_ms"] = round(dt * 1e3, 3)
        finally:
            lk.pallas_latch_cumsums_cm = orig_latch


def run_part_f():
    """CORRECTED-protocol re-measure of the headline A/B (the A-part ran
    with K1=5 inside the transport flat region and under-reports;
    KSWEEP_r04.json).  These are the honest absolute numbers."""
    for route in ("cm2", "cm"):
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"F.{route}_{label}", full_route(route), q)
            results[f"F_{route}_{label}_ms"] = round(dt * 1e3, 3)


def run_part_g():
    """Corrected-protocol A/Bs on the two biggest corrected-B stages:
    3-pass DFT matmul precision in the streams kernel (vs 6-pass HIGHEST)
    and stats-kernel TILE=128 (vs 256 — halves per-live-tile DMA for the
    mostly-dead tiles of the no-compaction grid).  Module knobs + jit
    cache clears (the inner jits key on shapes, which do not change)."""
    import sdr_channelizer_tpu.ops.pallas.channelizer_kernel as ck
    import sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel as pk

    def clear():
        ck._pallas_fir_dft_streams_cm2.clear_cache()
        pk.pulse_stats.clear_cache()
        pk.pulse_stats_dense.clear_cache()

    orig_prec, orig_tile = ck.DFT_PRECISION, pk.TILE
    variants = [
        ("tile128", orig_prec, 128),
        ("dft3", "bf16x3", 256),
        ("both", "bf16x3", 128),
    ]
    for name, prec, tile in variants:
        ck.DFT_PRECISION, pk.TILE = prec, tile
        clear()
        try:
            for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
                dt = graph_time(f"G.{name}_{label}", full_route("cm2"), q)
                results[f"G_{name}_{label}_ms"] = round(dt * 1e3, 3)
        finally:
            ck.DFT_PRECISION, pk.TILE = orig_prec, orig_tile
            clear()


def run_part_h():
    """Full-graph knob A/Bs on the cm2 route: edge-pin barrier off, and
    rank-search partial-block size 256/1024 (default 512)."""
    base = dict(pin=pdwmod._PIN_EDGES, blk=pdwmod._RANK_BLOCK)
    variants = [("nopin", False, 512), ("rb256", True, 256),
                ("rb1024", True, 1024)]
    for name, pin, blk in variants:
        pdwmod._PIN_EDGES, pdwmod._RANK_BLOCK = pin, blk
        try:
            dt = graph_time(f"H.{name}_dense", full_route("cm2"), xq_dense)
            results[f"H_{name}_dense_ms"] = round(dt * 1e3, 3)
        finally:
            pdwmod._PIN_EDGES = base["pin"]
            pdwmod._RANK_BLOCK = base["blk"]


def run_part_i():
    """Full-graph sweep of the cm2 streams-kernel grid block (frames per
    grid step): per-step sequencing overhead vs VMEM pressure."""
    import sdr_channelizer_tpu.ops.pallas.channelizer_kernel as ck

    base = ck.CM2_BLOCK_FRAMES
    for bf in (512, 2048, 4096):
        ck.CM2_BLOCK_FRAMES = bf
        ck._pallas_fir_dft_streams_cm2.clear_cache()
        try:
            dt = graph_time(f"I.bf{bf}_dense", full_route("cm2"), xq_dense)
            results[f"I_bf{bf}_dense_ms"] = round(dt * 1e3, 3)
        finally:
            ck.CM2_BLOCK_FRAMES = base
            ck._pallas_fir_dft_streams_cm2.clear_cache()


def run_part_j():
    """Full-graph A/B: double-buffered stats-kernel window DMAs (prefetch
    the next live tile's windows during this tile's radix descent)."""
    pdwmod._STATS_DB = True
    try:
        for label, q in (("dense", xq_dense), ("sparse", xq_sparse)):
            dt = graph_time(f"J.statsdb_{label}", full_route("cm2"), q)
            results[f"J_statsdb_{label}_ms"] = round(dt * 1e3, 3)
    finally:
        pdwmod._STATS_DB = False


def main():
    parts = os.environ.get("PROBE_PARTS", "AB")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = os.path.join(repo, "PROBE_r04.json")
    notes = ""
    if os.path.exists(prior):  # accumulate across invocations
        d = json.load(open(prior))
        results.update(d.get("results", {}))
        notes = d.get("notes", "")

    def flush():
        with open(os.path.join(repo, "PROBE_r04.json"), "w") as f:
            json.dump({"shape": {"bands": BANDS, "frames": FRAMES},
                       "payload": "bench.py dense/sparse captures",
                       "protocol": "in-graph fori_loop repetition; F/B/G/"
                                   "H/I/J parts use the corrected "
                                   "out-of-flat-region rule "
                                   "(KSWEEP_r04.json)",
                       "notes": notes,
                       "results": results}, f, indent=1, sort_keys=True)

    for p in parts:
        {"A": run_part_a, "B": run_part_b, "C": run_part_c,
         "D": run_part_d, "E": run_part_e, "F": run_part_f,
         "G": run_part_g, "H": run_part_h, "I": run_part_i,
         "J": run_part_j}[p]()
        flush()
    log("wrote PROBE_r04.json")


if __name__ == "__main__":
    main()
