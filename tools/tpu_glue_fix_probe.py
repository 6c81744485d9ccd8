"""Try scatter-free slot compactions in the full prefix graph.

tpu_glue_probe.py + HLO dump traced the 11.6 ms to the scatter-based
compaction feeding the stats kernel's scalar-prefetch operands (XLA
lowers the in-context chain through S(1) relayout copies + kCustom
scatter fusions).  Variants (p4 prefix + short-tier stats stage):

  w0_scatter      control (dsp/pdw.py:part today; expect ~20 ms)
  w4_searchsorted inv[k] = searchsorted(cumsum(sel), k+1) + 3 gathers
  w11_sortcompact sort_key_val on death-keyed ranks

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
xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(),
                    jax.devices()[0])


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


def flat_slots(toa_idx, te_idx, m, t_len):
    flat_toa = toa_idx.reshape(-1)
    flat_te = te_idx.reshape(-1)
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
    plen = flat_te - flat_toa + 1
    sel = (flat_toa < t_len) & (flat_te < t_len) & (plen <= SW)
    return flat_toa, flat_te, chan_f, sel


def part_scatter(toa_idx, te_idx, m, t_len):
    flat_toa, flat_te, chan_f, sel = flat_slots(toa_idx, te_idx, m, t_len)
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    rank = jnp.where(sel, rank, N_FLAT)
    base = jnp.full((N_FLAT,), t_len, jnp.int32)
    return (base.at[rank].set(flat_toa, mode="drop"),
            base.at[rank].set(flat_te, mode="drop"),
            jnp.zeros((N_FLAT,), jnp.int32).at[rank].set(chan_f, mode="drop"))


def part_search(toa_idx, te_idx, m, t_len):
    flat_toa, flat_te, chan_f, sel = flat_slots(toa_idx, te_idx, m, t_len)
    cs = jnp.cumsum(sel.astype(jnp.int32))
    inv = jnp.searchsorted(cs, jnp.arange(1, N_FLAT + 1, dtype=jnp.int32))
    live = inv < N_FLAT
    safe = jnp.minimum(inv, N_FLAT - 1)
    return (jnp.where(live, flat_toa[safe], t_len),
            jnp.where(live, flat_te[safe], t_len),
            jnp.where(live, chan_f[safe], 0))


def part_sort(toa_idx, te_idx, m, t_len):
    flat_toa, flat_te, chan_f, sel = flat_slots(toa_idx, te_idx, m, t_len)
    key = jnp.where(sel, jnp.arange(N_FLAT, dtype=jnp.int32), N_FLAT)
    _, toa_s, te_s, ch_s, sel_s = jax.lax.sort(
        (key, flat_toa, flat_te, chan_f, sel.astype(jnp.int32)), num_keys=1)
    live = sel_s > 0
    return (jnp.where(live, toa_s, t_len), jnp.where(live, te_s, t_len),
            jnp.where(live, ch_s, 0))


def make_w(partfn):
    def w(q):
        nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
        ts, te_, ch = partfn(toa, te, m, t_len)
        mm, dd, ss = pulse_stats_dense(mag_cm, dph_cm, sat_cm, ts, te_, ch,
                                       window=SW, t_len=t_len)
        return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)
    return jax.jit(w)


results = {}
results["w0_scatter"] = round(timeit("w0_scatter", make_w(part_scatter), xq) * 1e3, 2)
results["w4_searchsorted"] = round(
    timeit("w4_searchsorted", make_w(part_search), xq) * 1e3, 2)
results["w11_sortcompact"] = round(
    timeit("w11_sortcompact", make_w(part_sort), xq) * 1e3, 2)

# Parity of the three compactions on the real prefix outputs.
@jax.jit
def slots_all(q):
    nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
    return (part_scatter(toa, te, m, t_len), part_search(toa, te, m, t_len),
            part_sort(toa, te, m, t_len))

a, b, c = slots_all(xq)
for i, nme in enumerate(("toa", "te", "ch")):
    np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(b[i]),
                                  err_msg=f"search {nme}")
    np.testing.assert_array_equal(np.asarray(a[i]), np.asarray(c[i]),
                                  err_msg=f"sort {nme}")
log("compaction parity OK")
print(json.dumps(results, indent=1))
