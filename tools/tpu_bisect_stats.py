"""Sub-stage attribution for the stats/emit tail of the packed pipeline.

``tools/tpu_bisect.py`` showed the three-tier stats stage (~7 ms) and the
emit/merge (~2.5 ms) dominate the 12.7 ms step; this probe splits them:
tier masks + tiny-tier gathers / slot compaction (cumsum + scatters) /
dense short kernel / dense long kernel / merge + emit.  Same prefix-
marginal method as tpu_bisect.py (one jit program per prefix, marginal =
difference), mirroring dsp/pdw.py:_extract_channelized_pallas_stats by
hand — a probe, not a code path.

Run directly (no PYTHONPATH override — that disables the TPU platform);
single TPU process only (single-client tunnel, CLAUDE.md).  Writes
BISECT_STATS_r02.json at the repo root.
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


def timeit(name, fn, *args, iters=40):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch_scalar(out)
    compile_s = time.perf_counter() - t0
    fences = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch_scalar(out)
        fences.append(time.perf_counter() - t0)
    fence = min(fences)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    dt = max((time.perf_counter() - t0 - fence) / iters, 0.0)
    log(f"{name:<24s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s, "
        f"fence {fence:.2f}s)")
    return dt


from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed,
)
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums
from sdr_channelizer_tpu.ops.pallas.transpose_kernel import pallas_cm_streams
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats_dense,
)
from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm

log("devices:", jax.devices())
BANDS = 64
FRAMES = int(os.environ.get("BISECT_FRAMES", 262144))
N = BANDS * FRAMES
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(BANDS, pdw_cfg=cfg)
taps = pipe.channelizer.taps_rev
THR = 10.0 ** (cfg.snr_threshold_db / 10.0)
SW = pdwmod._SHORT_WINDOW
W = cfg.max_pulse_samples
P_SLOTS = ((cfg.max_pulses + TILE - 1) // TILE) * TILE

rng = np.random.default_rng(0)
t = np.arange(N)
sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))).astype(np.complex64)
tone = np.exp(2j * np.pi * 1.3e6 / 64e6 * t)
for s in range(137, N - 6400, 64000):
    sig[s:s + 6400] = tone[s:s + 6400]
i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048), -2048, 2047).astype(np.int16)
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(), jax.devices()[0])


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def head(q):
    """Shared prefix: streams -> nf -> latch -> edges -> cm."""
    mag, ph, sat = pallas_channelize_streams_packed(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)
    nf = medians.median(mag, axis=0)
    m, t_len = mag.shape[1], mag.shape[0]
    cl, ct = pallas_latch_cumsums(mag, nf * THR, nf * THR)
    ranks2d = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (m, P_SLOTS))
    toa_idx = find_ranks_cm(cl[:m], ranks2d, t_len)
    te_idx = find_ranks_cm(ct[:m], ranks2d, t_len)
    mag_cm, dph_cm, sat_cm = pallas_cm_streams(mag, ph, sat)
    return nf, toa_idx, te_idx, mag_cm, dph_cm, sat_cm, m, t_len


def tiers(toa_idx, te_idx, m, t_len):
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


def tiny_gathers(mag_cm, dph_cm, flat_toa, flat_te, chan_f, plen, m, t_len):
    t_arr = mag_cm.shape[1]
    safe_toa = jnp.minimum(flat_toa, t_len - 1)
    safe_te = jnp.minimum(flat_te, t_len - 1)
    mag_flat = mag_cm.reshape(-1)
    dph_flat = dph_cm.reshape(-1)
    mag_a = mag_flat[chan_f * t_arr + safe_toa]
    mag_b = mag_flat[chan_f * t_arr + safe_te]
    tiny_mag = jnp.where(plen >= 2, 0.5 * (mag_a + mag_b), mag_a)
    tiny_dph = jnp.where(plen >= 2, dph_flat[chan_f * t_arr + safe_toa],
                         jnp.float32(np.nan))
    return tiny_mag.reshape(m, P_SLOTS), tiny_dph.reshape(m, P_SLOTS)


def tiny_gathers_blocked(mag_cm, dph_cm, flat_toa, flat_te, chan_f, plen,
                         m, t_len):
    """Alt tiny tier: block-slice + one-hot picks (ops.rank_find.take_at_cm)
    instead of elementwise gathers."""
    from sdr_channelizer_tpu.ops.rank_find import take_at_cm

    safe_toa = jnp.minimum(flat_toa, t_len - 1)
    safe_te = jnp.minimum(flat_te, t_len - 1)
    mag_a = take_at_cm(mag_cm, chan_f, safe_toa)
    mag_b = take_at_cm(mag_cm, chan_f, safe_te)
    dph_a = take_at_cm(dph_cm, chan_f, safe_toa)
    tiny_mag = jnp.where(plen >= 2, 0.5 * (mag_a + mag_b), mag_a)
    tiny_dph = jnp.where(plen >= 2, dph_a, jnp.float32(np.nan))
    return tiny_mag.reshape(m, P_SLOTS), tiny_dph.reshape(m, P_SLOTS)


def part_scatter(sel, n_flat, flat_toa, flat_te, chan_f, t_len):
    """Round-1 compaction: cumsum rank + three scatters."""
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    rank = jnp.where(sel, rank, n_flat)
    base = jnp.full((n_flat,), t_len, jnp.int32)
    return (base.at[rank].set(flat_toa, mode="drop"),
            base.at[rank].set(flat_te, mode="drop"),
            jnp.zeros((n_flat,), jnp.int32).at[rank].set(chan_f, mode="drop"),
            jnp.minimum(rank, n_flat - 1))


def part(sel, n_flat, flat_toa, flat_te, chan_f, t_len):
    """Current compaction (dsp/pdw.py): rank search + gathers, no scatters."""
    cum = jnp.cumsum(sel.astype(jnp.float32))
    rank = jnp.minimum(
        jnp.where(sel, cum.astype(jnp.int32) - 1, n_flat), n_flat - 1)
    ranks_f = jnp.arange(1, n_flat + 1, dtype=jnp.float32)
    blk = 256 if n_flat % 512 else 512
    pos = find_ranks_cm(cum[None, :], ranks_f[None, :], n_flat, block=blk)[0]
    unfilled = pos >= n_flat
    safe = jnp.minimum(pos, n_flat - 1)
    return (jnp.where(unfilled, t_len, flat_toa[safe]),
            jnp.where(unfilled, t_len, flat_te[safe]),
            jnp.where(unfilled, 0, chan_f[safe]),
            rank)


# --- prefixes ---

def q0(q):
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    return touch(nf, toa, te, mag_cm, dph_cm, sat_cm)


def q1(q):
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    (n_flat, ftoa, fte, chf, plen, tiny, short, longm) = tiers(toa, te, m, t_len)
    tm, td = tiny_gathers(mag_cm, dph_cm, ftoa, fte, chf, plen, m, t_len)
    return touch(nf, toa, te, mag_cm, dph_cm, sat_cm, tm, td,
                 tiny.astype(jnp.float32))


def q2(q):
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    (n_flat, ftoa, fte, chf, plen, tiny, short, longm) = tiers(toa, te, m, t_len)
    tm, td = tiny_gathers(mag_cm, dph_cm, ftoa, fte, chf, plen, m, t_len)
    toa_s, te_s, ch_s, rank_s = part(short, n_flat, ftoa, fte, chf, t_len)
    toa_l, te_l, ch_l, rank_l = part(longm, n_flat, ftoa, fte, chf, t_len)
    return touch(nf, mag_cm, dph_cm, sat_cm, tm, td, toa_s, te_s, ch_s,
                 rank_s, toa_l, te_l, ch_l, rank_l)


def q2s(q):
    """Alt prefix: the round-1 SCATTER compaction (marginal vs q1 = its
    cost; compare with q2's gather-based marginal)."""
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    (n_flat, ftoa, fte, chf, plen, tiny, short, longm) = tiers(toa, te, m, t_len)
    tm, td = tiny_gathers(mag_cm, dph_cm, ftoa, fte, chf, plen, m, t_len)
    toa_s, te_s, ch_s, rank_s = part_scatter(short, n_flat, ftoa, fte, chf, t_len)
    toa_l, te_l, ch_l, rank_l = part_scatter(longm, n_flat, ftoa, fte, chf, t_len)
    return touch(nf, mag_cm, dph_cm, sat_cm, tm, td, toa_s, te_s, ch_s,
                 rank_s, toa_l, te_l, ch_l, rank_l)


def q3(q):
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    (n_flat, ftoa, fte, chf, plen, tiny, short, longm) = tiers(toa, te, m, t_len)
    tm, td = tiny_gathers(mag_cm, dph_cm, ftoa, fte, chf, plen, m, t_len)
    toa_s, te_s, ch_s, rank_s = part(short, n_flat, ftoa, fte, chf, t_len)
    toa_l, te_l, ch_l, rank_l = part(longm, n_flat, ftoa, fte, chf, t_len)
    outs_s = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_s, te_s, ch_s,
                               window=SW, t_len=t_len)
    return touch(nf, tm, td, rank_s, toa_l, te_l, ch_l, rank_l, *outs_s)


def q4(q):
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    (n_flat, ftoa, fte, chf, plen, tiny, short, longm) = tiers(toa, te, m, t_len)
    tm, td = tiny_gathers(mag_cm, dph_cm, ftoa, fte, chf, plen, m, t_len)
    toa_s, te_s, ch_s, rank_s = part(short, n_flat, ftoa, fte, chf, t_len)
    toa_l, te_l, ch_l, rank_l = part(longm, n_flat, ftoa, fte, chf, t_len)
    outs_s = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_s, te_s, ch_s,
                               window=SW, t_len=t_len)
    outs_l = pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_l, te_l, ch_l,
                               window=W, t_len=t_len)
    return touch(nf, tm, td, rank_s, rank_l, *outs_s, *outs_l)


def q5(q):
    mag, ph, sat = pallas_channelize_streams_packed(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)
    nf = medians.median(mag, axis=0)
    batch = pdwmod.extract_pdws_channelized_streams(
        mag, ph, sat > 0.5, cfg, noise_floor=nf)
    return touch(nf, batch.mag, batch.snr_db, batch.freq_offset_hz,
                 batch.toa_idx.astype(jnp.float32))


results = {}
names = ["q0_head", "q1_tiny_gathers", "q2_compaction", "q3_dense_short",
         "q4_dense_long", "q5_merge_emit"]
fns = [q0, q1, q2, q3, q4, q5]
times = []
for name, fn in zip(names, fns):
    dt = timeit(name, jax.jit(fn), xq)
    times.append(dt)
    results[name + "_ms"] = round(dt * 1e3, 2)

log("--- marginals ---")
marg = {}
prev = 0.0
for name, dt in zip(names, times):
    marg[name] = round((dt - prev) * 1e3, 2)
    log(f"{name:<24s} {marg[name]:9.2f} ms marginal")
    prev = dt

# Scatter-compaction alternative, outside the chain (marginal vs q1).
dt_s = timeit("q2s_scatter_compaction", jax.jit(q2s), xq)
results["q2s_scatter_compaction_ms"] = round(dt_s * 1e3, 2)
marg["q2s_scatter_compaction"] = round((dt_s - times[1]) * 1e3, 2)
log(f"q2s_scatter_compaction   {marg['q2s_scatter_compaction']:9.2f} ms marginal")


# Blocked tiny-gather alternative, outside the chain (marginal vs q0).
def q1g(q):
    nf, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = head(q)
    (n_flat, ftoa, fte, chf, plen, tiny, short, longm) = tiers(toa, te, m, t_len)
    tm, td = tiny_gathers_blocked(mag_cm, dph_cm, ftoa, fte, chf, plen, m, t_len)
    return touch(nf, toa, te, mag_cm, dph_cm, sat_cm, tm, td,
                 tiny.astype(jnp.float32))


dt_g = timeit("q1g_blocked_tiny", jax.jit(q1g), xq)
results["q1g_blocked_tiny_ms"] = round(dt_g * 1e3, 2)
marg["q1g_blocked_tiny"] = round((dt_g - times[0]) * 1e3, 2)
log(f"q1g_blocked_tiny         {marg['q1g_blocked_tiny']:9.2f} ms marginal")

payload = {"shape": {"bands": BANDS, "frames": FRAMES},
           "prefix_ms": results, "marginal_ms": marg}
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "BISECT_STATS_r02.json"), "w") as f:
    json.dump(payload, f, indent=1, sort_keys=True)
log("wrote BISECT_STATS_r02.json")
log("done")
