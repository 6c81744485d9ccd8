"""In-graph stage attribution for the fused packed pipeline.

``tools/tpu_profile_r2.py`` times each stage as its OWN jit program, so
every number carries the fixed per-dispatch tunnel overhead (~8-10 ms) and
jit-boundary layout copies — the stages sum to far more than the real
integrated step.  This probe times jit'd PREFIXES of the actual
``forward_packed`` graph instead: ``marginal(k) = time(P_k) - time(P_{k-1})``
is the true in-graph cost of stage k (same XLA scheduling, one dispatch).

Every prefix full-reduces all live intermediates into one f32 scalar so
XLA cannot dead-code-eliminate a stage or slice into it, and the device
fetch stays scalar-sized (complex64/array d2h is broken on this transport).

Run directly (no PYTHONPATH override — that disables the TPU platform);
single TPU process only (single-client tunnel, CLAUDE.md).  Writes
BISECT_r02.json at the repo root.
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
    # The tunnel round-trip fence is ~0.4 s with tens of ms of jitter, so
    # the measured work must be >> the jitter: 40 iterations, fence taken
    # as the min of 3 samples.
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

log("devices:", jax.devices())
BANDS = 64
FRAMES = int(os.environ.get("BISECT_FRAMES", 262144))  # small for CPU checks
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
i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048), -2048, 2047).astype(np.int16)
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(), jax.devices()[0])


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


# --- stage builders (mirrors dsp/pdw.py:_extract_channelized_pallas_stats;
# keep in sync by hand — this is a probe, not a code path) ---

def stage_streams(q):
    return pallas_channelize_streams_packed(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)


def stage_nf(mag):
    return medians.median(mag, axis=0)


def stage_latch(mag, nf):
    return pallas_latch_cumsums(mag, nf * THR, nf * THR)


def stage_edges(cl_cm, ct_cm, m, t_len):
    from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm

    ranks2d = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (m, P_SLOTS))
    toa_idx = find_ranks_cm(cl_cm[:m], ranks2d, t_len)
    te_idx = find_ranks_cm(ct_cm[:m], ranks2d, t_len)
    return toa_idx, te_idx


def stage_stats(mag_cm, dph_cm, sat_cm, toa_idx, te_idx, t_len, m, window):
    n_flat = m * P_SLOTS
    flat_toa = toa_idx.reshape(-1)
    flat_te = te_idx.reshape(-1)
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
    plen = flat_te - flat_toa + 1
    valid_slot = flat_toa < t_len
    closed = valid_slot & (flat_te < t_len)
    # Mirrors dsp/pdw.py's three-tier split: plen <= 2 pulses go through
    # the closed-form gather tier, so only 3 <= plen <= SW hits the kernel.
    is_short = closed & (plen > 2) & (plen <= SW)

    def part(sel):
        rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
        rank = jnp.where(sel, rank, n_flat)
        base = jnp.full((n_flat,), t_len, jnp.int32)
        return (base.at[rank].set(flat_toa, mode="drop"),
                base.at[rank].set(flat_te, mode="drop"),
                jnp.zeros((n_flat,), jnp.int32).at[rank].set(chan_f, mode="drop"))

    toa_s, te_s, ch_s = part(is_short)
    return pulse_stats_dense(mag_cm, dph_cm, sat_cm, toa_s, te_s, ch_s,
                             window=window, t_len=t_len)


# --- prefixes ---

def p0(q):
    mag, ph, sat = stage_streams(q)
    return touch(mag, ph, sat)


def p1(q):
    mag, ph, sat = stage_streams(q)
    nf = stage_nf(mag)
    return touch(mag, ph, sat, nf)


def p2(q):
    mag, ph, sat = stage_streams(q)
    nf = stage_nf(mag)
    cl, ct = stage_latch(mag, nf)
    return touch(mag, ph, sat, nf, cl, ct)


def p3(q):
    mag, ph, sat = stage_streams(q)
    nf = stage_nf(mag)
    cl, ct = stage_latch(mag, nf)
    toa, te = stage_edges(cl, ct, mag.shape[1], mag.shape[0])
    return touch(mag, ph, sat, nf, cl, ct, toa, te)


def p4(q):
    mag, ph, sat = stage_streams(q)
    nf = stage_nf(mag)
    cl, ct = stage_latch(mag, nf)
    toa, te = stage_edges(cl, ct, mag.shape[1], mag.shape[0])
    mag_cm, dph_cm, sat_cm = pallas_cm_streams(mag, ph, sat)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm)


def p5(q):
    mag, ph, sat = stage_streams(q)
    nf = stage_nf(mag)
    cl, ct = stage_latch(mag, nf)
    toa, te = stage_edges(cl, ct, mag.shape[1], mag.shape[0])
    mag_cm, dph_cm, sat_cm = pallas_cm_streams(mag, ph, sat)
    mm, dd, ss = stage_stats(mag_cm, dph_cm, sat_cm, toa, te,
                             mag.shape[0], mag.shape[1], SW)
    return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)


def p6(q):
    mag, ph, sat = stage_streams(q)
    nf = stage_nf(mag)
    batch = pdwmod.extract_pdws_channelized_streams(
        mag, ph, sat > 0.5, cfg, noise_floor=nf)
    return touch(nf, batch.mag, batch.snr_db, batch.freq_offset_hz,
                 batch.toa_idx.astype(jnp.float32))


results = {}
names = ["p0_streams", "p1_nf", "p2_latch", "p3_edges", "p4_cm",
         "p5_stats_short", "p6_full_extract"]
fns = [p0, p1, p2, p3, p4, p5, p6]
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

out, dt = None, timeit("FULL forward_packed",
                       lambda: pipe._jit_forward_packed(xq, bit_width=12))
results["full_packed_ms"] = round(dt * 1e3, 2)
results["full_packed_msps"] = round(N / dt / 1e6, 1)

payload = {"shape": {"bands": BANDS, "frames": FRAMES},
           "prefix_ms": results, "marginal_ms": marg}
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "BISECT_r02.json"), "w") as f:
    json.dump(payload, f, indent=1, sort_keys=True)
log("wrote BISECT_r02.json")
log("done")
