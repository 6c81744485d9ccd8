"""Edge rank-search formulation shootout on the real TPU.

``find_ranks_cm`` (dense two-level rank search) costs ~2.2 ms of the packed
step (BISECT_r02.json p3_edges marginal, two calls over (64, 262144)
cumsums x 512 ranks).  Candidates:

* block size 512 (current) vs 1024 vs 2048 — the partial-block sliced
  gather moves the same bytes but fewer, larger rows;
* ``take_along_axis`` on the middle (block-index) axis instead of the
  vmap'd ``dynamic_index_in_dim`` — the minor-axis ``take_along_axis``
  measured 6x faster than flat gathers for the tiny-tier picks
  (STATS_COST_r02.json), maybe the row gather lowers better too;
* three-level search (4096 -> 64 -> lane compare) — fewer gathered bytes.

All variants are compared for exact equality against the current
formulation on-device before timing.  Run directly (no PYTHONPATH
override); single TPU process only (CLAUDE.md).  Writes EDGES_PROBE.json.
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
    log(f"{name:<28s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)")
    return dt


from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm

M = 64
T = int(os.environ.get("PROBE_FRAMES", 262144))
R = 512

rng = np.random.default_rng(0)
# Realistic latch cumsum: sparse edges -> staircase counts, some channels
# saturating the rank range, some empty.
edges = (rng.random((M, T)) < (np.linspace(0.0002, 0.02, M)[:, None]))
cum = jnp.asarray(np.cumsum(edges, axis=1).astype(np.float32))
ranks = jnp.broadcast_to(
    jnp.arange(1, R + 1, dtype=jnp.float32)[None, :], (M, R))


def fr_tala(cum_cm, ranks_q, t_len, block=512):
    """find_ranks_cm with the partial block fetched by take_along_axis on
    the middle axis (one (M, R, block) gather) instead of vmap'd
    dynamic_index_in_dim."""
    m, t = cum_cm.shape
    n_b = t // block
    cb = cum_cm.reshape(m, n_b, block)
    ends = cb[:, :, block - 1]
    below = ends[:, None, :] < ranks_q[:, :, None]
    full = jnp.sum(below, axis=2).astype(jnp.int32)
    idx = jnp.minimum(full, n_b - 1)
    part = jnp.take_along_axis(cb, idx[:, :, None], axis=1)  # (M, R, block)
    cnt = jnp.sum(part < ranks_q[:, :, None], axis=2).astype(jnp.int32)
    return jnp.minimum(idx * block + cnt, t_len)


def fr_3level(cum_cm, ranks_q, t_len, b1=8192, b2=128):
    """Three-level: coarse block count (dense), then a b1-slice gather is
    replaced by a second dense count over b2-sub-block ends fetched with
    take_along_axis, then the final b2-slice gather."""
    m, t = cum_cm.shape
    b1 = min(b1, t)
    n1 = t // b1
    cb1 = cum_cm.reshape(m, n1, b1)
    ends1 = cb1[:, :, b1 - 1]
    full1 = jnp.sum(ends1[:, None, :] < ranks_q[:, :, None], axis=2
                    ).astype(jnp.int32)
    i1 = jnp.minimum(full1, n1 - 1)
    # sub-block ends within each level-1 block: (M, n1, b1//b2)
    ends2 = cb1.reshape(m, n1, b1 // b2, b2)[:, :, :, b2 - 1]
    e2 = jnp.take_along_axis(ends2, i1[:, :, None], axis=1)  # (M, R, b1//b2)
    full2 = jnp.sum(e2 < ranks_q[:, :, None], axis=2).astype(jnp.int32)
    i2 = jnp.minimum(full2, b1 // b2 - 1)
    cb2 = cum_cm.reshape(m, t // b2, b2)
    part = jnp.take_along_axis(
        cb2, (i1 * (b1 // b2) + i2)[:, :, None], axis=1)  # (M, R, b2)
    cnt = jnp.sum(part < ranks_q[:, :, None], axis=2).astype(jnp.int32)
    return jnp.minimum(i1 * b1 + i2 * b2 + cnt, t_len)


variants = {
    "current_b512": jax.jit(lambda c, r: find_ranks_cm(c, r, T, block=512)),
    "current_b1024": jax.jit(lambda c, r: find_ranks_cm(c, r, T, block=1024)),
    "current_b2048": jax.jit(lambda c, r: find_ranks_cm(c, r, T, block=2048)),
    "tala_b512": jax.jit(lambda c, r: fr_tala(c, r, T, block=512)),
    "tala_b1024": jax.jit(lambda c, r: fr_tala(c, r, T, block=1024)),
    "threelevel_8192_128": jax.jit(lambda c, r: fr_3level(c, r, T)),
}

log("devices:", jax.devices())
ref = None
results = {}
for name, fn in variants.items():
    out = fn(cum, ranks)
    # exact-equality check on device (d2h of i32 works on this transport)
    if ref is None:
        ref = out
        ok = True
    else:
        ok = bool(np.asarray(jax.jit(
            lambda a, b: jnp.all(a == b))(ref, out)))
    dt = timeit(name, fn, cum, ranks)
    results[name + "_ms"] = round(dt * 1e3, 3)
    results[name + "_exact"] = ok
    if not ok:
        log(f"  !! {name} DIVERGES from current_b512")

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(repo, "EDGES_PROBE.json"), "w") as f:
    json.dump({"shape": {"m": M, "t": T, "ranks": R}, **results}, f,
              indent=1, sort_keys=True)
log("wrote EDGES_PROBE.json")
log("done")
