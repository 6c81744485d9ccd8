"""Isolated cost structure of the PDW emit tail on the real TPU.

Questions this answers (each drives a specific round-2 optimization
decision — see STATUS.md "remaining step breakdown"):

1. ``pulse_stats_dense``: fixed overhead vs per-live-tile vs per-DMA cost
   (vary live tiles at fixed slot-list length, and slot-list length at
   fixed live tiles).  Decides whether a gated-tier kernel (slots stay on
   the (M, p_slots) grid, per-slot tier predicate gates the window DMAs)
   can beat the current compact-then-merge structure.
2. Tiny-tier pick formulations: flat 1-D gather (current) vs
   ``take_along_axis`` channel-major vs time-major vs ``take_at_cm``.
3. Channelizer kernel variants, kernel-only: packed vs packed_cm vs
   packed + separate transpose pass; planes cm (explains the
   validate-vs-bisect flagship gap: 25.3 ms planes vs 13.5 ms packed).

Run directly (no PYTHONPATH override); single TPU process only
(single-client tunnel, CLAUDE.md).  Writes STATS_COST_r02.json.
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
    log(f"{name:<32s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)")
    return dt


from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed,
    pallas_channelize_streams_packed_cm,
    pallas_channelize_streams_cm,
    pallas_channelize_streams,
)
from sdr_channelizer_tpu.ops.pallas.transpose_kernel import pallas_cm_streams
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats_dense,
)
from sdr_channelizer_tpu.ops.rank_find import take_at_cm
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

log("devices:", jax.devices())
M = 64
T = int(os.environ.get("PROBE_FRAMES", 262144))  # small for CPU smoke runs
N = M * T
P_SLOTS = 512
N_FLAT = M * P_SLOTS
results = {}

rng = np.random.default_rng(0)

# Channel-major streams shaped like the real pipeline's (128-row padded).
mag_cm = jnp.asarray(rng.random((128, T), np.float32) * 0.01)
dph_cm = jnp.asarray(rng.random((128, T), np.float32))
sat_cm = jnp.zeros((128, T), jnp.float32)

# --- 1. pulse_stats_dense cost structure -------------------------------
# Slot lists with exactly L live tiles (first L*TILE slots are real closed
# pulses of ~100 frames; the rest are sentinel-dead).
def slot_list(n_flat, live_tiles):
    toa = np.full((n_flat,), T, np.int32)
    te = np.full((n_flat,), T, np.int32)
    ch = np.zeros((n_flat,), np.int32)
    n_live = live_tiles * TILE
    if n_live:
        starts = (rng.integers(0, T - 200, n_live)).astype(np.int32)
        toa[:n_live] = starts
        te[:n_live] = starts + 99
        ch[:n_live] = rng.integers(0, M, n_live)
    return jnp.asarray(toa), jnp.asarray(te), jnp.asarray(ch)


# NOTE: the stream arrays must be ARGUMENTS, not closures — jit'd closures
# become embedded constants and the remote-compile request rejects >~100 MB
# bodies (HTTP 413).
f_w256 = jax.jit(lambda mc, dc, sc, a, b, c: pulse_stats_dense(
    mc, dc, sc, a, b, c, window=256, t_len=T))
for lt in (0, 2, 16, 64, 128):
    toa, te, ch = slot_list(N_FLAT, lt)
    dt = timeit(f"stats_dense 32k slots {lt:3d} live", f_w256,
                mag_cm, dph_cm, sat_cm, toa, te, ch)
    results[f"stats_dense_32k_{lt}live_ms"] = round(dt * 1e3, 3)

# Short slot list (512 slots = 2 tiles, both live): fixed overhead probe.
toa, te, ch = slot_list(512, 2)
dt = timeit("stats_dense 512 slots 2 live", f_w256,
            mag_cm, dph_cm, sat_cm, toa, te, ch)
results["stats_dense_512_2live_ms"] = round(dt * 1e3, 3)

# window=1024 (long tier), dead list: the long tier's floor cost.
toa, te, ch = slot_list(N_FLAT, 0)
dt = timeit(
    "stats_dense 32k w1024 0 live",
    jax.jit(lambda mc, dc, sc, a, b, c: pulse_stats_dense(
        mc, dc, sc, a, b, c, window=1024, t_len=T)),
    mag_cm, dph_cm, sat_cm, toa, te, ch)
results["stats_dense_32k_w1024_0live_ms"] = round(dt * 1e3, 3)

# --- 2. tiny-pick formulations ------------------------------------------
mag_tm = jnp.asarray(rng.random((T, M), np.float32))
chan_f = jnp.asarray(np.repeat(np.arange(M, dtype=np.int32), P_SLOTS))
idx_f = jnp.asarray(rng.integers(0, T, N_FLAT).astype(np.int32))
idx_2d = idx_f.reshape(M, P_SLOTS)

dt = timeit("pick flat-1d (current)",
            jax.jit(lambda m, c, i: m.reshape(-1)[c * T + i]),
            mag_cm, chan_f, idx_f)
results["pick_flat1d_ms"] = round(dt * 1e3, 3)

dt = timeit("pick take_along axis1 cm",
            jax.jit(lambda m, i: jnp.take_along_axis(m[:M], i, axis=1)),
            mag_cm, idx_2d)
results["pick_tala1_cm_ms"] = round(dt * 1e3, 3)

dt = timeit("pick take_along axis0 tm",
            jax.jit(lambda m, i: jnp.take_along_axis(m, i.T, axis=0)),
            mag_tm, idx_2d)
results["pick_tala0_tm_ms"] = round(dt * 1e3, 3)

dt = timeit("pick take_at_cm (block gather)",
            jax.jit(lambda m, c, i: take_at_cm(m, c, i)),
            mag_cm, chan_f, idx_f)
results["pick_take_at_cm_ms"] = round(dt * 1e3, 3)

# --- 3. channelizer kernel variants, kernel-only ------------------------
i16 = np.clip(rng.standard_normal((N, 2)) * 200, -2048, 2047).astype(np.int16)
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel())
xr = jax.device_put((i16[:, 0].astype(np.float32) / 2048).copy())
xi = jax.device_put((i16[:, 1].astype(np.float32) / 2048).copy())
pipe = ChannelizerPipeline.create(M, pdw_cfg=PdwConfig.channelized(
    max_pulses=512, max_pulse_samples=1024))
taps = pipe.channelizer.taps_rev

dt = timeit("kernel packed (tm only)",
            jax.jit(lambda q: pallas_channelize_streams_packed(
                q, taps, bit_width=12)), xq)
results["k_packed_tm_ms"] = round(dt * 1e3, 3)

dt = timeit("kernel packed_cm",
            jax.jit(lambda q: pallas_channelize_streams_packed_cm(
                q, taps, bit_width=12)), xq)
results["k_packed_cm_ms"] = round(dt * 1e3, 3)

dt = timeit("kernel packed + transpose",
            jax.jit(lambda q: pallas_cm_streams(
                *pallas_channelize_streams_packed(q, taps, bit_width=12))),
            xq)
results["k_packed_plus_transpose_ms"] = round(dt * 1e3, 3)

dt = timeit("kernel planes (tm only)",
            jax.jit(lambda a, b: pallas_channelize_streams(
                a, b, taps)), xr, xi)
results["k_planes_tm_ms"] = round(dt * 1e3, 3)

dt = timeit("kernel planes_cm",
            jax.jit(lambda a, b: pallas_channelize_streams_cm(
                a, b, taps)), xr, xi)
results["k_planes_cm_ms"] = round(dt * 1e3, 3)

# --- 4. the bench-vs-bisect discrepancy --------------------------------
# Identical program (pipe._jit_forward_packed), two workloads and three
# iteration counts: bisect measured 13.5 ms/step (1 pulse train, 40 iters),
# bench.py 24.5 ms (2 trains, 20 iters), profile_r2 29 ms (1 train, own-jit
# dispatch overhead).  Whichever axis moves the number tells us whether the
# headline is workload-bound or instrument-bound.
def capture_int32(trains):
    t = np.arange(N)
    sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))
           ).astype(np.complex64)
    specs = [(1.3e6, 6400, 64000), (-7.6e6, 3200, 44800)][:trains]
    for f0, pw_n, pri_n in specs:
        tone = np.exp(2j * np.pi * f0 / (M * 1e6) * t).astype(np.complex64)
        for s in range(137, N - pw_n, pri_n):
            sig[s:s + pw_n] = tone[s:s + pw_n]
    q = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048),
                -2048, 2047).astype(np.int16)
    return jax.device_put(np.ascontiguousarray(q).view(np.int32).ravel())

xq1 = capture_int32(1)
xq2 = capture_int32(2)
for name, q in (("1train", xq1), ("2train", xq2)):
    cnt = int(np.asarray(pipe._jit_forward_packed(q, bit_width=12)[2].count).sum())
    log(f"forward_packed {name}: count={cnt}")
    for iters in (10, 40):
        dt = timeit(f"forward_packed {name} x{iters}",
                    lambda qq: pipe._jit_forward_packed(qq, bit_width=12),
                    q, iters=iters)
        results[f"fwd_{name}_i{iters}_ms"] = round(dt * 1e3, 3)

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "STATS_COST_r02.json"), "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
log("wrote STATS_COST_r02.json")
log("done")
