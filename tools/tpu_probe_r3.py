"""Round-3 perf probe: cm-route bisect + tail variants, in-graph timing.

Measurement protocol — **in-graph repetition** (the only trustworthy one on
this tunnel): the round-2/early-r3 host-side protocols are both broken here:

  * a host loop re-dispatching the SAME (program, args) pair is unreliable —
    several 40-iter loop readings collapsed to 0.00 ms (some transport layer
    elides/caches repeated identical dispatches);
  * salting the args defeats elision but then every dispatch pays a tunnel
    round-trip (~0.4-0.8 s), swamping a ~10 ms step.

So each stage is timed as ONE dispatch that runs K iterations inside the
compiled program via ``lax.fori_loop`` (dynamic K → one compile).  Each
iteration's input is salted with a runtime-opaque zero derived from the
carry (``isnan(acc)`` — always false at run time, unprovable at compile
time), so XLA cannot hoist the body out of the loop or CSE iterations, and
the values flowing through the stage are bit-identical to the unsalted ones.
Per-iteration time = (t(K2) - t(K1)) / (K2 - K1): dispatch, fence, and fetch
overheads cancel exactly in the difference.

Contents:

B. **Fresh prefix bisect of the CURRENT headline graph** (the packed cm
   route: channel-major streams straight out of the channelizer kernel,
   no transpose pass) — BISECT_r02.json predates the cm route.

C. **Tail variants** (micro A/Bs on realistic shapes):
   - rank-search partial-block size 128/256/512 (edges stage);
   - tiny-tier picks: take_along_axis vs blocked take_at_cm;
   - merge gather: flat 1-D fancy index vs blocked row gather;
   - compaction: 3 separate scatters vs one stacked (n, 3) row scatter.

A. **Transport calibration**: the full program timed in-graph (truth) vs
   the two host-side protocols, to quantify how far the old artifacts'
   numbers are off.

Mirrors dsp/pdw.py:_extract_channelized_pallas_stats by hand — a probe,
not a code path.  Writes PROBE_r03.json at the repo root.
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
    """Perturb one element of ``a`` by a runtime-zero, compile-time-opaque
    amount (int/bool: xor 0; float: + 0.0) so the loop body depends on the
    carry without changing any value that flows through the stage."""
    idx = (0,) * a.ndim
    if a.dtype == jnp.bool_ or jnp.issubdtype(a.dtype, jnp.integer):
        return a.at[idx].set(a[idx] ^ salt.astype(a.dtype))
    return a.at[idx].add(salt.astype(a.dtype))


def make_looped(fn, n_salt=1):
    """jit(args..., K) running K salted iterations of ``fn`` in-graph.
    ``fn(*args) -> f32 scalar`` (a `touch` reduction)."""

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


def graph_time(name, fn, *args, n_salt=1, k1=None, k2=None, reps=None):
    """In-graph repetition timing; returns per-iteration seconds."""
    k1 = K1 if k1 is None else k1
    k2 = K2 if k2 is None else k2
    reps = REPS if reps is None else reps
    run = make_looped(fn, n_salt=n_salt)
    t0 = time.perf_counter()
    fetch_scalar(run(k1, *args))
    compile_s = time.perf_counter() - t0
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_scalar(run(k1, *args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fetch_scalar(run(k2, *args))
        t2s.append(time.perf_counter() - t0)
    dt = max((min(t2s) - min(t1s)) / (k2 - k1), 0.0)
    log(f"{name:<28s} {dt*1e3:9.3f} ms/iter   (compile {compile_s:.0f}s, "
        f"t{k1} {min(t1s):.2f}s t{k2} {min(t2s):.2f}s)")
    return dt


from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm, take_at_cm
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed_cm,
)
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats_dense,
)

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

rng = np.random.default_rng(0)
t = np.arange(N)
sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))).astype(np.complex64)
tone = np.exp(2j * np.pi * 1.3e6 / 64e6 * t)
for s in range(137, N - 6400, 64000):
    sig[s:s + 6400] = tone[s:s + 6400]
i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048),
              -2048, 2047).astype(np.int16)
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(),
                    jax.devices()[0])

results = {}


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


# ---------------------------------------------------------------- Part A ---

def full_scalar(q):
    nf, mag, batch = pipe.forward_packed(q, bit_width=12)
    return touch(nf, batch.mag, batch.snr_db, batch.freq_offset_hz,
                 batch.toa_idx.astype(jnp.float32))


def run_part_a():
    """Transport calibration: the two old host-side protocols on the same
    scalar-reduced full program whose in-graph truth is B_c8_full_ms."""
    full = jax.jit(full_scalar)
    out = full(xq)
    fetch_scalar(out)
    fences = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch_scalar(out)
        fences.append(time.perf_counter() - t0)
    fence = min(fences)

    # (a) host loop of 40 identical dispatches (the r2 throughput method).
    t0 = time.perf_counter()
    for _ in range(40):
        out = full(xq)
    fetch_scalar(out)
    dt = max((time.perf_counter() - t0 - fence) / 40, 0.0)
    log(f"{'A.host_loop40':<28s} {dt*1e3:9.2f} ms/step")
    results["A_host_loop40_ms"] = round(dt * 1e3, 2)

    # (b) salted batched-8 (the r2 latency method): chain a salt scalar so
    # dispatches differ, 8 per fence.
    step = jax.jit(lambda q, k: (full_scalar(q), k + 1))
    acc, k = step(xq, jnp.int32(0))
    fetch_scalar(acc)
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            acc, k = step(xq, k)
        fetch_scalar(acc)
        lat.append(max(time.perf_counter() - t0 - fence, 0.0) / 8)
    p50 = float(np.median(lat))
    log(f"{'A.salted_batched8':<28s} {p50*1e3:9.2f} ms/step")
    results["A_salted_batched8_ms"] = round(p50 * 1e3, 2)


# ------------------------------------------------------- Part B prefixes ---

def stage_streams_cm(q):
    return pallas_channelize_streams_packed_cm(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)


def stage_latch(mag, nf):
    return pallas_latch_cumsums(mag, nf * THR, nf * THR)


def stage_edges(cl_cm, ct_cm, m, t_len, block=512):
    ranks2d = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (m, P_SLOTS))
    toa_idx = find_ranks_cm(cl_cm[:m], ranks2d, t_len, block=block)
    te_idx = find_ranks_cm(ct_cm[:m], ranks2d, t_len, block=block)
    return toa_idx, te_idx


def tier_masks(toa_idx, te_idx, t_len, m):
    n_flat = m * P_SLOTS
    flat_toa = toa_idx.reshape(-1)
    flat_te = te_idx.reshape(-1)
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
    plen = flat_te - flat_toa + 1
    valid_slot = flat_toa < t_len
    closed = valid_slot & (flat_te < t_len)
    is_tiny = closed & (plen <= 2)
    is_short = closed & ~is_tiny & (plen <= SW)
    is_long = valid_slot & ~is_tiny & ~is_short
    return (n_flat, flat_toa, flat_te, chan_f, plen, is_tiny, is_short,
            is_long)


def tiny_picks_tala(mag_cm, dph_cm, toa_idx, te_idx, plen2, t_len, m):
    safe_toa2 = jnp.minimum(toa_idx, t_len - 1)
    safe_te2 = jnp.minimum(te_idx, t_len - 1)
    mag_a = jnp.take_along_axis(mag_cm[:m], safe_toa2, axis=1)
    mag_b = jnp.take_along_axis(mag_cm[:m], safe_te2, axis=1)
    tiny_mag = jnp.where(plen2 >= 2, 0.5 * (mag_a + mag_b), mag_a)
    tiny_dph = jnp.where(plen2 >= 2,
                         jnp.take_along_axis(dph_cm[:m], safe_toa2, axis=1),
                         jnp.float32(np.nan))
    return tiny_mag, tiny_dph


def part_scatter(sel, n_flat, flat_toa, flat_te, chan_f, t_len):
    r_sc = jnp.cumsum(sel.astype(jnp.int32)) - 1
    r_sc = jnp.where(sel, r_sc, n_flat)
    base = jnp.full((n_flat,), t_len, jnp.int32)
    return (base.at[r_sc].set(flat_toa, mode="drop"),
            base.at[r_sc].set(flat_te, mode="drop"),
            jnp.zeros((n_flat,), jnp.int32).at[r_sc].set(chan_f, mode="drop"),
            jnp.minimum(r_sc, n_flat - 1))


def part_stacked(sel, n_flat, flat_toa, flat_te, chan_f, t_len):
    """One (n, 3) row scatter instead of three 1-D scatters."""
    r_sc = jnp.cumsum(sel.astype(jnp.int32)) - 1
    r_sc = jnp.where(sel, r_sc, n_flat)
    vals = jnp.stack([flat_toa, flat_te, chan_f], axis=-1)
    base = jnp.concatenate([
        jnp.full((n_flat, 2), t_len, jnp.int32),
        jnp.zeros((n_flat, 1), jnp.int32)], axis=1)
    out = base.at[r_sc].set(vals, mode="drop")
    return out[:, 0], out[:, 1], out[:, 2], jnp.minimum(r_sc, n_flat - 1)


def build_prefixes():
    def c0(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        return touch(mag, mag_cm, dph_cm, sat_cm)

    def c1(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        return touch(mag_cm, dph_cm, sat_cm, nf)

    def c2(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        return touch(mag_cm, dph_cm, sat_cm, nf, cl, ct)

    def c3(q, block=512):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        toa, te = stage_edges(cl, ct, mag.shape[1], mag.shape[0], block)
        return touch(mag_cm, dph_cm, sat_cm, nf, cl, ct, toa, te)

    def c4(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        m, t_len = mag.shape[1], mag.shape[0]
        toa, te = stage_edges(cl, ct, m, t_len)
        tiers = tier_masks(toa, te, t_len, m)
        plen2 = tiers[4].reshape(m, P_SLOTS)
        tm, td = tiny_picks_tala(mag_cm, dph_cm, toa, te, plen2, t_len, m)
        return touch(mag_cm, dph_cm, sat_cm, nf, cl, ct, toa, te, tm, td,
                     tiers[5], tiers[6], tiers[7])

    def c5(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        m, t_len = mag.shape[1], mag.shape[0]
        toa, te = stage_edges(cl, ct, m, t_len)
        tiers = tier_masks(toa, te, t_len, m)
        n_flat, flat_toa, flat_te, chan_f, plen, _, is_s, is_l = tiers
        plen2 = plen.reshape(m, P_SLOTS)
        tm, td = tiny_picks_tala(mag_cm, dph_cm, toa, te, plen2, t_len, m)
        ps = part_scatter(is_s, n_flat, flat_toa, flat_te, chan_f, t_len)
        pl = part_scatter(is_l, n_flat, flat_toa, flat_te, chan_f, t_len)
        return touch(mag_cm, dph_cm, sat_cm, nf, toa, te, tm, td, *ps, *pl)

    def c6(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        m, t_len = mag.shape[1], mag.shape[0]
        toa, te = stage_edges(cl, ct, m, t_len)
        tiers = tier_masks(toa, te, t_len, m)
        n_flat, flat_toa, flat_te, chan_f, plen, _, is_s, is_l = tiers
        plen2 = plen.reshape(m, P_SLOTS)
        tm, td = tiny_picks_tala(mag_cm, dph_cm, toa, te, plen2, t_len, m)
        toa_s, te_s, ch_s, _ = part_scatter(is_s, n_flat, flat_toa, flat_te,
                                            chan_f, t_len)
        pl = part_scatter(is_l, n_flat, flat_toa, flat_te, chan_f, t_len)
        outs_s = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_s, te_s, ch_s,
                                   window=SW, t_len=t_len)
        return touch(nf, toa, te, tm, td, *pl, *outs_s)

    def c7(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        m, t_len = mag.shape[1], mag.shape[0]
        toa, te = stage_edges(cl, ct, m, t_len)
        tiers = tier_masks(toa, te, t_len, m)
        n_flat, flat_toa, flat_te, chan_f, plen, _, is_s, is_l = tiers
        plen2 = plen.reshape(m, P_SLOTS)
        tm, td = tiny_picks_tala(mag_cm, dph_cm, toa, te, plen2, t_len, m)
        toa_s, te_s, ch_s, _ = part_scatter(is_s, n_flat, flat_toa, flat_te,
                                            chan_f, t_len)
        toa_l, te_l, ch_l, _ = part_scatter(is_l, n_flat, flat_toa, flat_te,
                                            chan_f, t_len)
        outs_s = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_s, te_s, ch_s,
                                   window=SW, t_len=t_len)
        outs_l = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_l, te_l, ch_l,
                                   window=cfg.max_pulse_samples, t_len=t_len)
        return touch(nf, toa, te, tm, td, *outs_s, *outs_l)

    return [("c0_streams_cm", c0), ("c1_nf", c1), ("c2_latch", c2),
            ("c3_edges", c3), ("c4_tiny", c4), ("c5_compact", c5),
            ("c6_short_kernel", c6), ("c7_long_kernel", c7),
            ("c8_full", full_scalar)]


def run_part_b():
    times = []
    for name, fn in build_prefixes():
        dt = graph_time("B." + name, fn, xq)
        results["B_" + name + "_ms"] = round(dt * 1e3, 3)
        times.append((name, dt))
    prev = 0.0
    for name, dt in times:
        results["B_marg_" + name + "_ms"] = round((dt - prev) * 1e3, 3)
        prev = dt


# ------------------------------------------------------- Part C variants ---

def run_part_c():
    # Shared inputs for the micro A/Bs, produced once on device.
    @jax.jit
    def front(q):
        mag, mag_cm, dph_cm, sat_cm = stage_streams_cm(q)
        nf = medians.median(mag, axis=0)
        cl, ct = stage_latch(mag, nf)
        return mag_cm, dph_cm, cl, ct

    mag_cm, dph_cm, cl, ct = front(xq)
    fetch_scalar(mag_cm)
    m, t_len = BANDS, FRAMES

    # C1: rank-search block size (both searches, realistic ranks).
    for blk in (128, 256, 512):
        fn = lambda a, b, blk=blk: touch(
            *stage_edges(a, b, m, t_len, block=blk))
        dt = graph_time(f"C.edges_block{blk}", fn, cl, ct)
        results[f"C_edges_block{blk}_ms"] = round(dt * 1e3, 3)

    # Edge indices for the pick/merge micros.
    toa, te = jax.jit(lambda a, b: stage_edges(a, b, m, t_len))(cl, ct)
    fetch_scalar(toa)
    plen2 = te - toa + 1

    # C2: tiny picks — take_along_axis vs blocked take_at_cm.
    dt = graph_time("C.tiny_tala",
                    lambda mc, dc, a, b: touch(*tiny_picks_tala(
                        mc, dc, a, b, plen2, t_len, m)),
                    mag_cm, dph_cm, toa, te)
    results["C_tiny_tala_ms"] = round(dt * 1e3, 3)

    def tiny_blocked(mc, dc, a, b):
        chan = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
        sa = jnp.minimum(a, t_len - 1).reshape(-1)
        sb = jnp.minimum(b, t_len - 1).reshape(-1)
        mag_a = take_at_cm(mc[:m, :t_len], chan, sa).reshape(m, P_SLOTS)
        mag_b = take_at_cm(mc[:m, :t_len], chan, sb).reshape(m, P_SLOTS)
        dph_a = take_at_cm(dc[:m, :t_len], chan, sa).reshape(m, P_SLOTS)
        tiny_mag = jnp.where(plen2 >= 2, 0.5 * (mag_a + mag_b), mag_a)
        tiny_dph = jnp.where(plen2 >= 2, dph_a, jnp.float32(np.nan))
        return touch(tiny_mag, tiny_dph)

    dt = graph_time("C.tiny_blocked", tiny_blocked, mag_cm, dph_cm, toa, te)
    results["C_tiny_blocked_ms"] = round(dt * 1e3, 3)

    # C3: merge gather — flat fancy-index vs blocked row gather.
    n_flat = m * P_SLOTS
    rng2 = np.random.default_rng(1)
    table = jnp.asarray(rng2.standard_normal(2 * n_flat).astype(np.float32))
    rank_c = jnp.asarray(
        rng2.integers(0, 2 * n_flat, size=(m, P_SLOTS)).astype(np.int32))

    dt = graph_time("C.merge_flat",
                    lambda tb, rc: touch(tb[rc], tb[rc] + 1.0, tb[rc] * 2.0),
                    table, rank_c)
    results["C_merge_flat_ms"] = round(dt * 1e3, 3)

    def merge_blocked(tb, rc):
        flat = rc.reshape(-1)
        picks = take_at_cm(tb[None, :], jnp.zeros_like(flat), flat)
        p2 = picks.reshape(m, P_SLOTS)
        return touch(p2, p2 + 1.0, p2 * 2.0)

    dt = graph_time("C.merge_blocked", merge_blocked, table, rank_c)
    results["C_merge_blocked_ms"] = round(dt * 1e3, 3)

    # C4: compaction — 3 scatters vs one stacked row scatter (both tiers).
    tiers_fn = jax.jit(lambda a, b: tier_masks(a, b, t_len, m)[5:])
    is_tiny, is_short, is_long = tiers_fn(toa, te)
    fetch_scalar(is_short)
    flat_toa = toa.reshape(-1)
    flat_te = te.reshape(-1)
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)

    dt = graph_time(
        "C.compact_3scatter",
        lambda s, l: touch(*part_scatter(s, n_flat, flat_toa, flat_te,
                                         chan_f, t_len)[:3],
                           *part_scatter(l, n_flat, flat_toa, flat_te,
                                         chan_f, t_len)[:3]),
        is_short, is_long)
    results["C_compact_3scatter_ms"] = round(dt * 1e3, 3)

    dt = graph_time(
        "C.compact_stacked",
        lambda s, l: touch(*part_stacked(s, n_flat, flat_toa, flat_te,
                                         chan_f, t_len)[:3],
                           *part_stacked(l, n_flat, flat_toa, flat_te,
                                         chan_f, t_len)[:3]),
        is_short, is_long)
    results["C_compact_stacked_ms"] = round(dt * 1e3, 3)


def main():
    parts = os.environ.get("PROBE_PARTS", "BCA")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def flush():
        with open(os.path.join(repo, "PROBE_r03.json"), "w") as f:
            json.dump({"shape": {"bands": BANDS, "frames": FRAMES},
                       "protocol": "in-graph fori_loop repetition, "
                                   f"(t({K2})-t({K1}))/{K2 - K1}, "
                                   f"min of {REPS} reps",
                       "results": results}, f, indent=1, sort_keys=True)

    for p in parts:
        {"A": run_part_a, "B": run_part_b, "C": run_part_c}[p]()
        flush()
    log("wrote PROBE_r03.json")


if __name__ == "__main__":
    main()
