"""Per-component TPU timings (scan, edges, noise floor, transposes, extraction).

Run directly (no PYTHONPATH override - that disables the TPU platform);
keep runs under ~9 minutes and never run two TPU processes at once (see
CLAUDE.md).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, functools, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    return float(np.asarray(jax.jit(lambda v: jnp.ravel(v)[:1].real.astype(jnp.float32))(leaves[0]))[0])
def timeit(name, fn, *args, iters=5):
    t0=time.perf_counter(); out = fn(*args); sync(out)
    c = time.perf_counter()-t0
    t0=time.perf_counter(); sync(out); fence=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(out)
    log(f"{name}: {((time.perf_counter()-t0-fence)/iters)*1e3:9.2f} ms (compile {c:.0f}s)")
    return out
from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.ops import medians
t_len, m = 262144, 64
rng = np.random.default_rng(0)
mag = np.abs(rng.standard_normal((t_len, m))).astype(np.float32) * 0.001
for s in range(137, t_len-100, 1000):
    mag[s:s+100, 5] = 1.0
magj = jax.device_put(mag)
ph = jax.device_put(rng.standard_normal((t_len, m)).astype(np.float32))
sat = jax.device_put(np.zeros((t_len, m), np.float32))
nf = jax.device_put(np.full((m,), 0.001, np.float32))
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)

def scans_only(mg, v):
    lead = mg >= v[None]*31.6; trail = mg <= v[None]*31.6
    state = pdwmod.hysteresis_scan(lead, trail, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, m), bool), state[:-1]])
    le = state & ~prev; te_ = ~state & prev
    return jnp.cumsum(le.astype(jnp.int32), axis=0), jnp.cumsum(te_.astype(jnp.int32), axis=0)
cs = timeit("scan+cumsum", jax.jit(scans_only), magj, nf)

def edges_new(mg, v):
    lead = mg >= v[None]*31.6; trail = mg <= v[None]*31.6
    state = pdwmod.hysteresis_scan(lead, trail, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, m), bool), state[:-1]])
    le = state & ~prev; te_ = ~state & prev
    ranks = jnp.arange(1, 513, dtype=jnp.int32)
    def fe(col):
        return jnp.searchsorted(jnp.cumsum(col.astype(jnp.int32)), ranks, side="left").astype(jnp.int32)
    return jax.vmap(fe, in_axes=1)(le), jax.vmap(fe, in_axes=1)(te_)
timeit("edges_searchsorted", jax.jit(edges_new), magj, nf)

timeit("noise_floor", jax.jit(lambda v: medians.median(v, axis=0)), magj)
timeit("transpose3", jax.jit(lambda a, b, c2: (a.T, b.T, c2.T)), magj, ph, sat)
f_full = jax.jit(lambda a, b, c2, v: pdwmod.extract_pdws_channelized_streams(
    a, b, c2 > 0.5, cfg, noise_floor=v))
timeit("extract_full", f_full, magj, ph, sat, nf)
log("done")
