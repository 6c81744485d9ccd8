"""A/B the three round-2 emit-tail formulation changes through the REAL
production graph (``forward_packed``), not hand-built prefixes.

Isolated probes said: tala tiny picks 6x faster, scatter compaction 1.7x
faster, combined merge halves gathers — but the assembled new graph
measured ~22 ms vs the old graph's 12.7 ms.  This probe toggles each
change via the SDR_PDW_* env vars (read at trace time in dsp/pdw.py) with
a fresh pipeline per combo, so XLA scheduling effects are included.

Run directly; single TPU process only (CLAUDE.md).  Writes AB_PROBE.json.
"""
import itertools
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
    log(f"{name:<36s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)")
    return dt


from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

log("devices:", jax.devices())
M = 64
T = int(os.environ.get("PROBE_FRAMES", 262144))
N = M * T

rng = np.random.default_rng(0)
t = np.arange(N)
sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))
       ).astype(np.complex64)
tone = np.exp(2j * np.pi * 1.3e6 / (M * 1e6) * t).astype(np.complex64)
for s in range(137, N - 6400, 64000):
    sig[s:s + 6400] = tone[s:s + 6400]
i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048),
              -2048, 2047).astype(np.int16)
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel())

combos = [
    ("old_flat_rank_two", dict(SDR_PDW_TINY="flat", SDR_PDW_COMPACT="rank",
                               SDR_PDW_MERGE="two")),
    ("new_tala_scatter_combined", dict(SDR_PDW_TINY="tala",
                                       SDR_PDW_COMPACT="scatter",
                                       SDR_PDW_MERGE="combined")),
    ("tala_only", dict(SDR_PDW_TINY="tala", SDR_PDW_COMPACT="rank",
                       SDR_PDW_MERGE="two")),
    ("scatter_only", dict(SDR_PDW_TINY="flat", SDR_PDW_COMPACT="scatter",
                          SDR_PDW_MERGE="two")),
    ("combined_only", dict(SDR_PDW_TINY="flat", SDR_PDW_COMPACT="rank",
                           SDR_PDW_MERGE="combined")),
]

results = {}
counts = {}
for name, env in combos:
    os.environ.update(env)
    pipe = ChannelizerPipeline.create(M, pdw_cfg=PdwConfig.channelized(
        max_pulses=512, max_pulse_samples=1024))
    fn = lambda q: pipe._jit_forward_packed(q, bit_width=12)
    dt = timeit(name, fn, xq)
    counts[name] = int(np.asarray(fn(xq)[2].count).sum())
    results[name + "_ms"] = round(dt * 1e3, 2)

log("counts:", counts)
assert len(set(counts.values())) == 1, counts
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "AB_PROBE.json"), "w") as f:
    json.dump({"shape": {"bands": M, "frames": T}, **results}, f,
              indent=1, sort_keys=True)
log("wrote AB_PROBE.json")
log("done")
