"""Which property of the real slot data makes pulse_stats 10x slower?

Real compacted slots (32.5k live, channel-grouped, paired toa, plen=2)
run the kernel at ~11 ms; synthetic scattered slots (32.8k live,
round-robin channels, plen=3) at ~1.7 ms — both as device params.  This
sweeps one field at a time, and ablates the descent on the real data.

Run directly; single TPU process only.
"""
import functools
import json
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
    print(f"{name:<28s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)",
          file=sys.stderr, flush=True)
    return dt


import sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel as psk

M, T = 64, 262144
N_TOT = 32768
N_LIVE = 32519
rng = np.random.default_rng(0)
dev = jax.devices()[0]
mag_d = jax.device_put(
    np.abs(rng.standard_normal((M, T))).astype(np.float32) * 0.01, dev)
dph_d = jax.device_put(rng.standard_normal((M, T)).astype(np.float32), dev)
sat_d = jax.device_put(np.zeros((M, T), np.float32), dev)

# Real-like: channel-grouped, paired toas (insert edges every 1000 frames).
per_chan = N_LIVE // M  # ~508
toa_real = np.full(N_TOT, T, np.int32)
ch_real = np.zeros(N_TOT, np.int32)
i = 0
for c in range(M):
    for k in range(per_chan // 2):
        toa_real[i] = 7 + k * 1000
        toa_real[i + 1] = 107 + k * 1000
        ch_real[i] = ch_real[i + 1] = c
        i += 2
n_live = i
te_real = np.where(toa_real < T, toa_real + 1, T).astype(np.int32)

toa_scat = np.full(N_TOT, T, np.int32)
toa_scat[:n_live] = (np.arange(n_live, dtype=np.int64) * 7919 % (T - 300)
                     ).astype(np.int32)
ch_rr = np.zeros(N_TOT, np.int32)
ch_rr[:n_live] = np.arange(n_live) % M

fn = jax.jit(functools.partial(
    psk.pulse_stats_dense.__wrapped__, window=256, interpret=False, t_len=T))


def case(toa, te, ch):
    toa_d, te_d, ch_d = (jax.device_put(x, dev) for x in (toa, te, ch))
    return lambda: fn(mag_d, dph_d, sat_d, toa_d, te_d, ch_d)[0]


def te_of(toa, plen):
    return np.where(toa < T, np.minimum(toa + plen - 1, T - 1), T).astype(np.int32)


results = {}
cases = [
    ("a_real", toa_real, te_real, ch_real),
    ("b_real_toa_rr_ch", toa_real, te_real, ch_rr),
    ("c_scat_toa_grouped_ch", toa_scat, te_of(toa_scat, 2), ch_real),
    ("d_scat_rr_plen2", toa_scat, te_of(toa_scat, 2), ch_rr),
    ("e_scat_rr_plen3", toa_scat, te_of(toa_scat, 3), ch_rr),
    ("f_real_toa_plen100", toa_real, te_of(toa_real, 100), ch_real),
]
for name, toa, te, ch in cases:
    results[name] = round(timeit(name, case(toa, te, ch)) * 1e3, 3)

# Descent ablation on the real-like data.
real_fori = jax.lax.fori_loop
for name, bits in (("real_descent4", 4), ("real_descent0", 0)):
    def fori(lo, hi, body, init, _b=bits):
        return real_fori(lo, _b if hi == 32 else hi, body, init)
    jax.lax.fori_loop = fori
    try:
        fn2 = jax.jit(functools.partial(
            psk.pulse_stats_dense.__wrapped__, window=256, interpret=False,
            t_len=T))
        toa_d, te_d, ch_d = (jax.device_put(x, dev)
                             for x in (toa_real, te_real, ch_real))
        results[name] = round(
            timeit(name, lambda: fn2(mag_d, dph_d, sat_d, toa_d, te_d,
                                     ch_d)[0]) * 1e3, 3)
    finally:
        jax.lax.fori_loop = real_fori

print(json.dumps(results, indent=1))
