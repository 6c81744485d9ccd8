"""Attribute the short-tier stats stage cost: scatter compaction vs kernel.

tpu_stats_probe.py showed pulse_stats_dense at <1 ms standalone while the
bisect's p5 marginal is 11.6 ms — the difference must be the XLA glue:
``part()``'s three 32768-element scatters (dsp/pdw.py:558) are the prime
suspect (TPU scatters serialize).  Times the scatter compaction alone, a
searchsorted-based scatter-free alternative, and each followed by the
kernel.

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
    log(f"{name:<28s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)")
    return dt


from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import pulse_stats_dense

log("devices:", jax.devices())
M, T = 64, 262144
P_SLOTS = 512
N_FLAT = M * P_SLOTS
SW = 256
rng = np.random.default_rng(0)
mag = np.abs(rng.standard_normal((M, T))).astype(np.float32) * 0.01
dph = rng.standard_normal((M, T)).astype(np.float32)
sat = np.zeros((M, T), np.float32)
dev = jax.devices()[0]
mag_d, dph_d, sat_d = (jax.device_put(x, dev) for x in (mag, dph, sat))

# Pipeline-like slot grid: ~4 pulses per channel, rest invalid.
toa2 = np.full((M, P_SLOTS), T, np.int32)
te2 = np.full((M, P_SLOTS), T, np.int32)
for c in range(M):
    starts = np.sort(rng.choice(T - 200, 4, replace=False)).astype(np.int32)
    toa2[c, :4] = starts
    te2[c, :4] = starts + 100
toa2_d = jax.device_put(toa2, dev)
te2_d = jax.device_put(te2, dev)
chan_f = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[:, None],
                          (M, P_SLOTS)).reshape(-1)


def select_short(toa_g, te_g):
    flat_toa = toa_g.reshape(-1)
    flat_te = te_g.reshape(-1)
    plen = flat_te - flat_toa + 1
    valid = flat_toa < T
    return flat_toa, flat_te, valid & (flat_te < T) & (plen <= SW)


def part_scatter(toa_g, te_g):
    """dsp/pdw.py:part() — cumsum rank + 3 scatters."""
    flat_toa, flat_te, sel = select_short(toa_g, te_g)
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    rank = jnp.where(sel, rank, N_FLAT)
    base = jnp.full((N_FLAT,), T, jnp.int32)
    return (base.at[rank].set(flat_toa, mode="drop"),
            base.at[rank].set(flat_te, mode="drop"),
            jnp.zeros((N_FLAT,), jnp.int32).at[rank].set(chan_f, mode="drop"))


def part_search(toa_g, te_g):
    """Scatter-free: inv[k] = searchsorted(cumsum(sel), k+1), then 3 gathers."""
    flat_toa, flat_te, sel = select_short(toa_g, te_g)
    cs = jnp.cumsum(sel.astype(jnp.int32))
    inv = jnp.searchsorted(cs, jnp.arange(1, N_FLAT + 1, dtype=jnp.int32))
    live = inv < N_FLAT
    safe = jnp.minimum(inv, N_FLAT - 1)
    return (jnp.where(live, flat_toa[safe], T),
            jnp.where(live, flat_te[safe], T),
            jnp.where(live, chan_f[safe], 0))


def touch(xs):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)


results = {}
f_scatter = jax.jit(lambda a, b: touch(part_scatter(a, b)))
f_search = jax.jit(lambda a, b: touch(part_search(a, b)))
results["part_scatter"] = round(timeit("part_scatter", f_scatter,
                                       toa2_d, te2_d) * 1e3, 3)
results["part_search"] = round(timeit("part_search", f_search,
                                      toa2_d, te2_d) * 1e3, 3)


def stage(partfn):
    def run(toa_g, te_g):
        ts, te_, ch = partfn(toa_g, te_g)
        mm, dd, ss = pulse_stats_dense(mag_d, dph_d, sat_d, ts, te_, ch,
                                       window=SW, t_len=T)
        return touch((mm, dd, ss))
    return jax.jit(run)


results["stage_scatter"] = round(timeit("stage_scatter", stage(part_scatter),
                                        toa2_d, te2_d) * 1e3, 3)
results["stage_search"] = round(timeit("stage_search", stage(part_search),
                                       toa2_d, te2_d) * 1e3, 3)

# Parity: the two compactions must agree exactly.
a = jax.jit(part_scatter)(toa2_d, te2_d)
b = jax.jit(part_search)(toa2_d, te2_d)
for x, y, n in zip(a, b, ("toa", "te", "chan")):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=n)
log("compaction parity OK")

print(json.dumps(results, indent=1))
