"""Round-2 TPU attribution run: stage bisection of the fused pipeline,
packed-vs-planes ingest, and the per-kernel parity artifact (KERNELS_r02).

Run directly (no PYTHONPATH override - that disables the TPU platform);
single TPU process only (single-client tunnel, CLAUDE.md).  Writes
KERNELS_r02.json at the repo root and prints stage timings to stderr.
"""
import json
import os
import sys
import time

# Make the repo root importable without PYTHONPATH (which would shadow the
# sitecustomize that enables the TPU platform — CLAUDE.md).
sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].real.astype(jnp.float32))(leaves[0]))[0])


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(out)
    fence = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    # Clamp at 0: the fence (a tunnel round-trip, ~0.4 s) is measured
    # separately and subtracted, so kernels cheaper than the fence jitter
    # can come out negative — report them as 0 ("below measurement noise").
    dt = max((time.perf_counter() - t0 - fence) / iters, 0.0)
    log(f"{name:<28s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)")
    return out, dt


from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams, pallas_channelize_streams_packed,
)
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import TILE, pulse_stats

log("devices:", jax.devices())
BANDS, FRAMES = 64, 262144
N = BANDS * FRAMES
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(BANDS, pdw_cfg=cfg)

rng = np.random.default_rng(0)
t = np.arange(N)
sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))).astype(np.complex64)
tone = np.exp(2j * np.pi * 1.3e6 / 64e6 * t)
for s in range(137, N - 6400, 64000):
    sig[s:s + 6400] = tone[s:s + 6400]

# Quantize like a 12-bit recorder payload; packed int32 view of (N, 2) int16.
i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048), -2048, 2047).astype(np.int16)
xq_np = np.ascontiguousarray(i16).view(np.int32).ravel()
xr_np = (i16[:, 0].astype(np.float32) / 2048.0)
xi_np = (i16[:, 1].astype(np.float32) / 2048.0)

dev = jax.devices()[0]
xq = jax.device_put(xq_np, dev)
xr = jax.device_put(xr_np, dev)
xi = jax.device_put(xi_np, dev)

taps = pipe.channelizer.taps_rev
results = {}

# --- stage bisection (each its own jit; boundaries cost layout copies) ---
f_streams = jax.jit(lambda a, b: pallas_channelize_streams(a, b, taps))
streams, dt = timeit("streams_planes", f_streams, xr, xi)
results["streams_planes_ms"] = dt * 1e3
mag, ph, sat = streams

f_packed = jax.jit(lambda q: pallas_channelize_streams_packed(q, taps, bit_width=12))
_, dt = timeit("streams_packed", f_packed, xq)
results["streams_packed_ms"] = dt * 1e3

# Channel-major kernel variant (the headline path emits the transposed
# detection streams straight from the channelizer pass).
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed_cm,
)
from sdr_channelizer_tpu.ops.pallas.transpose_kernel import pallas_cm_streams

f_packed_cm = jax.jit(lambda q: pallas_channelize_streams_packed_cm(
    q, taps, bit_width=12))
out_cm, dt = timeit("streams_packed_cm", f_packed_cm, xq)
results["streams_packed_cm_ms"] = dt * 1e3

f_nf = jax.jit(lambda v: medians.median(v, axis=0))
nf, dt = timeit("noise_floor", f_nf, mag)
results["noise_floor_ms"] = dt * 1e3

p_slots = ((cfg.max_pulses + TILE - 1) // TILE) * TILE


def scan_edges(mg, v):
    lead = mg >= v[None, :] * 10.0 ** (cfg.snr_threshold_db / 10.0)
    trail = mg <= v[None, :] * 10.0 ** (cfg.snr_threshold_db / 10.0)
    state = pdwmod.hysteresis_scan(lead, trail, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, mg.shape[1]), bool), state[:-1]])
    le = state & ~prev
    te = ~state & prev
    ranks = jnp.arange(1, p_slots + 1, dtype=jnp.int32)

    def fe(col):
        return jnp.searchsorted(jnp.cumsum(col.astype(jnp.int32)), ranks,
                                side="left").astype(jnp.int32)

    return jax.vmap(fe, in_axes=1)(le), jax.vmap(fe, in_axes=1)(te)


f_edges = jax.jit(scan_edges)
(toa_d, te_d), dt = timeit("scan_plus_edges", f_edges, mag, nf)
results["scan_edges_ms"] = dt * 1e3

# Pallas latch kernel (the path the fused pipeline actually takes on TPU)
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums

THR = 10.0 ** (cfg.snr_threshold_db / 10.0)
f_latch = jax.jit(lambda mg, v: pallas_latch_cumsums(mg, v * THR, v * THR))
(cl_d, ct_d), dt = timeit("latch_kernel", f_latch, mag, nf)
results["latch_kernel_ms"] = dt * 1e3


def to_cm(mg, p_, st):
    dph = p_[1:] - p_[:-1]
    dph = jnp.where(dph < -180.0, dph + 360.0, dph)
    dph = jnp.where(dph > 180.0, dph - 360.0, dph)
    dph = jnp.concatenate([dph, jnp.zeros((1, mg.shape[1]), dph.dtype)])
    return mg.T, dph.T, st.T


f_cm = jax.jit(to_cm)
cm, dt = timeit("dph_plus_transposes", f_cm, mag, ph, sat)
results["transpose_ms"] = dt * 1e3
mag_cm, dph_cm, sat_cm = cm

f_stats = jax.jit(lambda a, b, c, u, v: pulse_stats(a, b, c, u, v, window=cfg.max_pulse_samples))
_, dt = timeit("pulse_stats_kernel", f_stats, mag_cm, dph_cm, sat_cm, toa_d, te_d)
results["pulse_stats_ms"] = dt * 1e3

# Cost decomposition probes: short window (rows=3 vs 9) isolates the
# roll-chain / field-size scaling; clamping the te to toa (1-sample
# pulses, same slot count) isolates per-slot DMA-issue + loop overhead.
f_stats256 = jax.jit(lambda a, b, c, u, v: pulse_stats(a, b, c, u, v, window=256))
_, dt = timeit("pulse_stats_w256", f_stats256, mag_cm, dph_cm, sat_cm, toa_d, te_d)
results["pulse_stats_w256_ms"] = dt * 1e3
te_min = jnp.where(te_d < mag_cm.shape[1], toa_d, te_d)
_, dt = timeit("pulse_stats_w256_len1", f_stats256, mag_cm, dph_cm, sat_cm,
               toa_d, te_min)
results["pulse_stats_w256_len1_ms"] = dt * 1e3

f_extract = jax.jit(lambda a, b, c, v: pdwmod.extract_pdws_channelized_streams(
    a, b, c > 0.5, cfg, noise_floor=v))
_, dt = timeit("extract_given_streams", f_extract, mag, ph, sat, nf)
results["extract_full_ms"] = dt * 1e3

# --- full pipelines ---
out_planes, dt = timeit("FULL step_fused(planes)",
                        lambda: pipe.step_fused(xr, xi, bit_width=0))
results["full_planes_ms"] = dt * 1e3
count_planes = int(np.asarray(out_planes[2].count).sum())

out_packed, dt = timeit("FULL forward_packed(int32)",
                        lambda: pipe._jit_forward_packed(xq, bit_width=12))
results["full_packed_ms"] = dt * 1e3
results["full_packed_msps"] = N / (dt or 1) / 1e6
count_packed = int(np.asarray(out_packed[2].count).sum())
log(f"counts: planes={count_planes} packed={count_packed}")

# packed vs planes parity (same quantized capture -> identical batches)
bp, bq = out_planes[2], out_packed[2]
toa_eq = bool(np.array_equal(np.asarray(bp.toa_idx), np.asarray(bq.toa_idx)))
mag_err = float(np.nanmax(np.abs(np.asarray(bp.mag) - np.asarray(bq.mag))))
log(f"packed parity: toa_eq={toa_eq} mag_err={mag_err:.3e}")

# --- per-kernel parity vs numpy oracle (KERNELS_r02.json) ---
kernels = {}

# streams kernel oracle on a small slice
ns = 64 * 4096
frames = xr_np[:ns].reshape(-1, 64) + 1j * xi_np[:ns].reshape(-1, 64)
p_, m_ = taps.shape
padded = np.concatenate([np.zeros((p_ - 1, m_), np.complex64), frames])
u = np.zeros_like(frames)
for pp in range(p_):
    u += taps[pp] * padded[p_ - 1 - pp : p_ - 1 - pp + len(frames)]
from sdr_channelizer_tpu.dsp.channelizer import dft_matrix
y = u @ dft_matrix(64, shifted=True).astype(np.complex64)
mag_o = np.abs(y).astype(np.float32)
ph_o = np.rad2deg(np.angle(y)).astype(np.float32)

mg_s, ph_s, sat_s = jax.jit(lambda a, b: pallas_channelize_streams(a, b, taps))(
    xr[:ns], xi[:ns])
sync((mg_s, ph_s))
mag_err_k = float(np.max(np.abs(np.asarray(mg_s) - mag_o)))
ph_d = np.abs(np.asarray(ph_s) - ph_o)
ph_err_k = float(np.max(np.where(ph_d > 180, np.abs(ph_d - 360), ph_d)))
kernels["channelize_streams"] = {
    "max_abs_err_mag": mag_err_k, "max_abs_err_phase_deg": ph_err_k,
    "msps": round(N / results["streams_planes_ms"] * 1e3 / 1e6, 1),
}
log(f"streams kernel parity: mag {mag_err_k:.2e}, phase {ph_err_k:.2e} deg")

kernels["channelize_streams_packed"] = {
    "toa_equal_vs_planes": toa_eq, "max_abs_err_mag_vs_planes": mag_err,
    "msps": round(N / results["streams_packed_ms"] * 1e3 / 1e6, 1),
}

# cm kernel parity vs the two-kernel composition (errors on-device; the
# composition is the route the interpret-mode tests pin against the XLA
# oracle, so equality here transfers that chain to Mosaic lowering).
def cm_errs(q):
    mg, p_, st = pallas_channelize_streams_packed(q, taps, bit_width=12)
    ref_cm = pallas_cm_streams(mg, p_, st)
    mg2, mcm, dcm, scm = pallas_channelize_streams_packed_cm(
        q, taps, bit_width=12)
    t_ = mg.shape[0]
    errs = [jnp.max(jnp.abs(mg2 - mg))]
    for got, ref in zip((mcm, dcm, scm), ref_cm):
        errs.append(jnp.max(jnp.abs(got[:, :t_] - ref[:, :t_])))
    return jnp.stack(errs)


e_cm = jax.jit(cm_errs)(xq)
sync((e_cm,))
e_cm = [float(v) for v in np.asarray(e_cm)]
kernels["channelize_streams_packed_cm"] = {
    "max_abs_err_mag_tm": e_cm[0], "max_abs_err_mag_cm": e_cm[1],
    "max_abs_err_dph_cm": e_cm[2], "max_abs_err_sat_cm": e_cm[3],
    "msps": round(N / results["streams_packed_cm_ms"] * 1e3 / 1e6, 1),
}
log(f"cm kernel parity vs composition: {e_cm}")

# latch kernel parity vs the XLA associative-scan cumsums (two independent
# formulations; errors compared on-device, scalar fetch only)
def xla_cums(mg, v):
    lead = mg >= v[None, :] * THR
    trail = mg <= v[None, :] * THR
    state = pdwmod.hysteresis_scan(lead, trail, axis=0)
    prev = jnp.concatenate([jnp.zeros((1, mg.shape[1]), bool), state[:-1]])
    le = state & ~prev
    te = ~state & prev
    return (jnp.cumsum(le.astype(jnp.float32), axis=0),
            jnp.cumsum(te.astype(jnp.float32), axis=0))


def latch_errs(mg, v, cl, ct):
    # Latch kernel outputs are channel-major (128-lane padded, T-padded).
    cx, tx = xla_cums(mg, v)
    m_, t_ = mg.shape[1], mg.shape[0]
    return (jnp.max(jnp.abs(cl[:m_, :t_].T - cx)),
            jnp.max(jnp.abs(ct[:m_, :t_].T - tx)))


err_l, err_t = jax.jit(latch_errs)(mag, nf, cl_d, ct_d)
sync((err_l,))
err_l, err_t = float(np.asarray(err_l)), float(np.asarray(err_t))
kernels["latch"] = {
    "max_abs_err_lead_cumsum": err_l, "max_abs_err_trail_cumsum": err_t,
    "ms_per_step": round(results["latch_kernel_ms"], 2),
}
log(f"latch kernel parity: lead {err_l:.2e}, trail {err_t:.2e}")

# pulse_stats oracle: numpy masked medians over the device edge lists
toa_h, te_h = np.asarray(toa_d), np.asarray(te_d)
mag_h, dph_h = np.asarray(mag_cm), np.asarray(dph_cm)
got_mm, got_dd, _ = jax.jit(
    lambda a, b, c, u, v: pulse_stats(a, b, c, u, v, window=cfg.max_pulse_samples)
)(mag_cm, dph_cm, sat_cm, toa_d, te_d)
sync((got_mm,))
got_mm, got_dd = np.asarray(got_mm), np.asarray(got_dd)
errs_m, errs_d = [0.0], [0.0]
t_len = mag_h.shape[1]
for c in range(mag_h.shape[0]):
    for s in range(p_slots):
        i0, i1 = int(toa_h[c, s]), int(te_h[c, s])
        if i0 >= t_len or i1 >= t_len:
            break
        w = min(i1 - i0 + 1, cfg.max_pulse_samples)
        errs_m.append(abs(float(np.median(mag_h[c, i0:i0 + w])) - got_mm[c, s]))
        d = dph_h[c, i0:i0 + max(w - 1, 0)]
        if d.size:
            errs_d.append(abs(float(np.median(d)) - got_dd[c, s]))
kernels["pulse_stats"] = {
    "max_abs_err_mag": float(max(errs_m)), "max_abs_err_dph_deg": float(max(errs_d)),
    "ms_per_step": round(results["pulse_stats_ms"], 2),
}
log(f"pulse_stats parity: mag {max(errs_m):.2e}, dph {max(errs_d):.2e}")

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
payload = {
    "device": f"{dev.platform}:{dev.device_kind}",
    "shape": {"bands": BANDS, "frames": FRAMES},
    "kernels": kernels,
    "stages_ms": {k: round(v, 2) for k, v in results.items()},
}
with open(os.path.join(repo, "KERNELS_r02.json"), "w") as f:
    json.dump(payload, f, indent=1, sort_keys=True)
log("wrote KERNELS_r02.json")
log("done")
