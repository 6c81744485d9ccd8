"""Decompose the pulse_stats kernel's cost on the real TPU.

The round-2 bisect puts the short-tier ``pulse_stats_dense`` call at
11.6 ms of a 22.4 ms step.  Candidate costs: fixed dispatch, dead-tile
scalar branches (the pipeline passes M*max_pulses = 32768 slots = 256
tiles with only ~2 live), per-slot DMA issue/wait, and the 32-step radix
descent per live tile.  This probe times the kernel standalone across a
(live slots, total slots, window) matrix chosen so each cost is the only
variable between two rows.

Run directly (no PYTHONPATH override — that disables the TPU platform);
single TPU process only (single-client tunnel, CLAUDE.md).
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


def timeit(name, fn, iters=40):
    t0 = time.perf_counter()
    out = fn()
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
        out = fn()
    fetch_scalar(out)
    dt = max((time.perf_counter() - t0 - fence) / iters, 0.0)
    log(f"{name:<28s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)")
    return dt


from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats_dense,
)

log("devices:", jax.devices())
M, T = 64, 262144
rng = np.random.default_rng(0)
mag = np.abs(rng.standard_normal((M, T))).astype(np.float32) * 0.01
dph = rng.standard_normal((M, T)).astype(np.float32)
sat = np.zeros((M, T), np.float32)
dev = jax.devices()[0]
mag_d = jax.device_put(mag, dev)
dph_d = jax.device_put(dph, dev)
sat_d = jax.device_put(sat, dev)


def slots(n_live, n_total, seed=1, pw=100):
    r = np.random.default_rng(seed)
    toa = np.full(n_total, T, np.int32)
    te = np.full(n_total, T, np.int32)
    ch = np.zeros(n_total, np.int32)
    if n_live:
        starts = np.sort(r.choice(T - pw - 2, n_live, replace=False)).astype(np.int32)
        toa[:n_live] = starts
        te[:n_live] = starts + pw
        ch[:n_live] = r.integers(0, M, n_live)
    return (jax.device_put(toa, dev), jax.device_put(te, dev),
            jax.device_put(ch, dev))


cases = [
    ("dead_all_tot32768", 0, 32768, 256),
    ("live262_tot32768", 262, 32768, 256),   # pipeline-like
    ("live262_tot512", 262, 512, 256),
    ("live1_tot512", 1, 512, 256),
    ("live128_tot512", 128, 512, 256),
    ("live512_tot512", 512, 512, 256),
    ("w1024_live128_tot512", 128, 512, 1024),
]
results = {}
for name, n_live, n_total, window in cases:
    toa, te, ch = slots(n_live, n_total)
    fn = lambda: pulse_stats_dense(mag_d, dph_d, sat_d, toa, te, ch,
                                   window=window, t_len=T)[0]
    results[name] = round(timeit(name, fn) * 1e3, 3)

print(json.dumps(results, indent=1))
