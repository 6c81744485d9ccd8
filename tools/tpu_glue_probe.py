"""Find which graph edge makes the short-tier stats stage cost 11.6 ms.

Standalone, pulse_stats_dense + its scatter compaction run in ~0.4 ms
(tpu_compact_probe.py), yet the bisect's p4->p5 marginal is 11.6 ms.  The
stage only gets slow in the context of the full prefix graph, so one of
its graph edges is the trigger.  Variants (all share the p4 prefix):

  w0_p5_exact     exact bisect p5 (control; expect ~+11.6 over p4)
  w1_barrier      optimization_barrier around the stats kernel's inputs
  w2_const_slots  slot list from device inputs instead of rank_find edges
  w3_copied_cm    stats reads fresh device arrays, not the cm kernel outs

Run directly (no PYTHONPATH override); single TPU process only.
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
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].astype(jnp.float32))(x))[0])


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
    log(f"{name:<24s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)")
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
BANDS, FRAMES = 64, 262144
N = BANDS * FRAMES
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(BANDS, pdw_cfg=cfg)
taps = pipe.channelizer.taps_rev
THR = 10.0 ** (cfg.snr_threshold_db / 10.0)
SW = pdwmod._SHORT_WINDOW
P_SLOTS = ((cfg.max_pulses + TILE - 1) // TILE) * TILE
N_FLAT = BANDS * P_SLOTS

rng = np.random.default_rng(0)
t = np.arange(N)
sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))).astype(np.complex64)
tone = np.exp(2j * np.pi * 1.3e6 / 64e6 * t)
for s in range(137, N - 6400, 64000):
    sig[s:s + 6400] = tone[s:s + 6400]
i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048), -2048, 2047).astype(np.int16)
dev = jax.devices()[0]
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(), dev)

# Device-input slot list for w2 (toa/te in channel-major sample space).
toa_c = np.full(N_FLAT, FRAMES, np.int32)
te_c = np.full(N_FLAT, FRAMES, np.int32)
ch_c = np.zeros(N_FLAT, np.int32)
r2 = np.random.default_rng(1)
starts = np.sort(r2.choice(FRAMES - 200, 262, replace=False)).astype(np.int32)
toa_c[:262] = starts
te_c[:262] = starts + 100
ch_c[:262] = r2.integers(0, BANDS, 262)
toa_cd, te_cd, ch_cd = (jax.device_put(x, dev) for x in (toa_c, te_c, ch_c))

# Fresh channel-major stream copies for w3.
m_pad = 128
mag_f = np.abs(r2.standard_normal((m_pad, FRAMES))).astype(np.float32) * 0.01
dph_f = r2.standard_normal((m_pad, FRAMES)).astype(np.float32)
sat_f = np.zeros((m_pad, FRAMES), np.float32)
mag_fd, dph_fd, sat_fd = (jax.device_put(x, dev) for x in (mag_f, dph_f, sat_f))


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def prefix_p4(q):
    mag, ph, sat = pallas_channelize_streams_packed(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)
    nf = medians.median(mag, axis=0)
    cl, ct = pallas_latch_cumsums(mag, nf * THR, nf * THR)
    m, t_len = mag.shape[1], mag.shape[0]
    ranks2d = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (m, P_SLOTS))
    toa_idx = find_ranks_cm(cl[:m], ranks2d, t_len)
    te_idx = find_ranks_cm(ct[:m], ranks2d, t_len)
    mag_cm, dph_cm, sat_cm = pallas_cm_streams(mag, ph, sat)
    return (nf, cl, ct, toa_idx, te_idx, mag_cm, dph_cm, sat_cm, m, t_len)


def part_short(toa_idx, te_idx, m, t_len):
    flat_toa = toa_idx.reshape(-1)
    flat_te = te_idx.reshape(-1)
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
    plen = flat_te - flat_toa + 1
    sel = (flat_toa < t_len) & (flat_te < t_len) & (plen <= SW)
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    rank = jnp.where(sel, rank, N_FLAT)
    base = jnp.full((N_FLAT,), t_len, jnp.int32)
    return (base.at[rank].set(flat_toa, mode="drop"),
            base.at[rank].set(flat_te, mode="drop"),
            jnp.zeros((N_FLAT,), jnp.int32).at[rank].set(chan_f, mode="drop"))


def p4(q):
    nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm)


def w0(q):
    nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
    ts, te_, ch = part_short(toa, te, m, t_len)
    mm, dd, ss = pulse_stats_dense(mag_cm, dph_cm, sat_cm, ts, te_, ch,
                                   window=SW, t_len=t_len)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)


def w1(q):
    nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
    ts, te_, ch = part_short(toa, te, m, t_len)
    mag_b, dph_b, sat_b, ts, te_, ch = jax.lax.optimization_barrier(
        (mag_cm, dph_cm, sat_cm, ts, te_, ch))
    mm, dd, ss = pulse_stats_dense(mag_b, dph_b, sat_b, ts, te_, ch,
                                   window=SW, t_len=t_len)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)


def w2(q, ts, te_, ch):
    nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
    mm, dd, ss = pulse_stats_dense(mag_cm, dph_cm, sat_cm, ts, te_, ch,
                                   window=SW, t_len=t_len)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)


def w3(q, mag_x, dph_x, sat_x):
    nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
    ts, te_, ch = part_short(toa, te, m, t_len)
    mm, dd, ss = pulse_stats_dense(mag_x, dph_x, sat_x, ts, te_, ch,
                                   window=SW, t_len=t_len)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)


results = {}
results["p4"] = round(timeit("p4", jax.jit(p4), xq) * 1e3, 2)
results["w0_p5_exact"] = round(timeit("w0_p5_exact", jax.jit(w0), xq) * 1e3, 2)
results["w1_barrier"] = round(timeit("w1_barrier", jax.jit(w1), xq) * 1e3, 2)
results["w2_const_slots"] = round(
    timeit("w2_const_slots", jax.jit(w2), xq, toa_cd, te_cd, ch_cd) * 1e3, 2)
results["w3_copied_cm"] = round(
    timeit("w3_copied_cm", jax.jit(w3), xq, mag_fd, dph_fd, sat_fd) * 1e3, 2)
print(json.dumps(results, indent=1))
