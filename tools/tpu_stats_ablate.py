"""Split pulse_stats per-tile cost: slot DMA + masks vs the radix descent.

The real bisect workload runs 255 live tiles at ~44 us/tile.  This times
the kernel with all 32768 slots live under (a) the real 32-bit descent,
(b) a 4-bit descent, (c) no descent — by intercepting the in-kernel
fori_loop bound (probe-only hack; results of b/c are wrong, timing only).

Run directly; single TPU process only.
"""
import os
import sys
import time

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch_scalar(x):
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].astype(jnp.float32))(x))[0])


def timeit(name, fn, iters=20):
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
    print(f"{name:<24s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)",
          file=sys.stderr, flush=True)
    return dt


import sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel as psk

M, T = 64, 262144
rng = np.random.default_rng(0)
dev = jax.devices()[0]
mag_d = jax.device_put(np.abs(rng.standard_normal((M, T))).astype(np.float32), dev)
dph_d = jax.device_put(rng.standard_normal((M, T)).astype(np.float32), dev)
sat_d = jax.device_put(np.zeros((M, T), np.float32), dev)

N_TOT = 32768
starts = (np.arange(N_TOT, dtype=np.int64) * 7919 % (T - 300)).astype(np.int32)
toa = jax.device_put(starts, dev)
te = jax.device_put(starts + 2, dev)
ch = jax.device_put((np.arange(N_TOT) % M).astype(np.int32), dev)

real_fori = jax.lax.fori_loop


def patched_fori(maker):
    def fori(lo, hi, body, init):
        if hi == 32:  # the descent loop
            return real_fori(lo, maker, body, init)
        return real_fori(lo, hi, body, init)
    return fori


results = {}
for name, bits in (("descent32", 32), ("descent4", 4), ("descent0", 0)):
    jax.lax.fori_loop = patched_fori(bits)
    try:
        # fresh jit cache per variant
        import functools
        fn = jax.jit(functools.partial(
            psk.pulse_stats_dense.__wrapped__, window=256, interpret=False,
            t_len=T))
        run = lambda: fn(mag_d, dph_d, sat_d, toa, te, ch)[0]
        results[name] = round(timeit(name, run) * 1e3, 3)
    finally:
        jax.lax.fori_loop = real_fori

import json
print(json.dumps(results, indent=1))
