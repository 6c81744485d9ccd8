"""Ground-truth validation + timing of the fused pipeline on the real TPU.

Writes VALIDATE_r05.json (round-5 refresh of the round-4 list):

1. Small-scale ground truth through ``extract_fused`` (auto route = the v2
   cm2 tail): recovered pulse count / PW / freq vs the synth spec.
2. The **fine-grained M=560 operating point** (0.1 MHz bins at 56 Msps,
   ``generate_channelized_training_iq.m:95-96``): ground truth + in-graph
   Msps on the packed route.
3. The **int8 packed ingest** (8-bit recorders are half the reference's
   capture surface): ground truth at M=64 + in-graph Msps.
4. Packed spectrogram timing (``stft_power_packed`` — device-side dequant).

Timing protocol = in-graph ``lax.fori_loop`` repetition (host loops are
untrustworthy over this tunnel; see bench.py docstring).

Run directly (no PYTHONPATH override — that disables the TPU platform);
never run two TPU processes at once (see CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_scalar(x):
    leaf = [v for v in jax.tree.leaves(x) if hasattr(v, "dtype")][0]
    return float(np.asarray(jax.jit(
        lambda v: jnp.ravel(v)[:1].astype(jnp.float32))(leaf))[0])


def graph_time(name, fn, *args, iters=60, reps=2):
    """In-graph per-iteration seconds — bench.py's round-4 protocol:
    distinct K per dispatch (elision), pilot-calibrated K1 past the
    flat region where execution hides under the ~0.43 s transport round
    trip (KSWEEP_r04.json), median of per-rep differences."""
    @jax.jit
    def run(K, *a):
        def body(i, acc):
            salt = jnp.isnan(acc).astype(jnp.int32) + i * 0
            q = a[0].at[(0,) * a[0].ndim].set(
                a[0][(0,) * a[0].ndim] ^ salt.astype(a[0].dtype))
            return acc * 0.5 + fn(q, *a[1:])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    def dispatch(k):
        t0 = time.perf_counter()
        fetch_scalar(run(k, *args))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    fetch_scalar(run(3, *args))
    compile_s = time.perf_counter() - t0
    t_floor = dispatch(4)
    # Geometric pilot: double K until the dispatch clearly exits the flat
    # region (a fixed-K pilot under-runs it for fast graphs -> junk slope
    # -> unbounded K1, the worker-crash mode).  s_est = t/K slightly
    # overestimates the step, keeping K1 and the budget conservative.
    pk = max(8, iters // 4)
    t_pilot = dispatch(pk)
    while t_pilot < 1.6 * t_floor and pk < 4000:
        pk *= 2
        t_pilot = dispatch(pk)
    s_pilot = t_pilot / pk
    # Bound every dispatch to ~8 s of device time (longer crashed the worker).
    budget = max(int(8.0 / s_pilot), 8)
    k1 = min(max(8, int(2.5 * t_floor / s_pilot) + 1), budget)
    span = min(max(iters, int(1.2 / s_pilot) + 1), budget, 4000)
    ests = []
    for r in range(reps):
        t1 = dispatch(k1 + r)
        t2 = dispatch(k1 + span + r)
        ests.append(max(t2 - t1, 1e-9) / span)
    dt = float(np.median(ests))
    log(f"{name:<26s} {dt*1e3:9.3f} ms/iter (compile {compile_s:.0f}s, "
        f"floor {t_floor*1e3:.0f} ms, K1={k1}, span={span})")
    return dt


from sdr_channelizer_tpu.config import PdwConfig, bands_for_bin_width
from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.models import ChannelizerPipeline
from sdr_channelizer_tpu.signal.synth import (
    PulseTrainSpec, pulse_train, pulse_starts,
)

log("devices:", jax.devices())
dev = jax.devices()[0]
results = {"device": f"{dev.platform}:{dev.device_kind}"}


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def check_truth(pipe, spec, m, bit_width, label, freq_tol, pw_tol=0.15):
    iq = pulse_train(spec, seed=7)
    n = len(iq) // m * m
    samples = np.ascontiguousarray(iqpacket.from_complex(iq[:n], bit_width))
    t0 = time.perf_counter()
    p = pipe.extract_fused(samples, bit_width=bit_width,
                           fs=spec.sample_rate_sps, sample_start_time=0.0)
    wall = time.perf_counter() - t0
    # Strong pulses in the tone's own bin (edge transients in far bins are
    # real detections — the dense-bench regime — not ground-truth pulses).
    strong = (p["snr"] > 25) & (np.abs(p["freq"] - spec.frequency_hz)
                                < freq_tol)
    truth = len(pulse_starts(spec))
    assert strong.sum() == truth, (label, strong.sum(), truth)
    assert abs(np.median(p["pw"][strong]) - spec.pulse_width_sec) \
        < pw_tol * spec.pulse_width_sec
    log(f"{label}: GROUND TRUTH OK ({int(strong.sum())} pulses, "
        f"compile+run {wall:.1f}s)")
    results[label] = {"pulses": int(strong.sum()),
                      "compile_plus_run_s": round(wall, 1)}


# ---- 1. small-scale truth, 12-bit, M=8 (the round-1..3 gate, cm2 route)
spec8 = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=4e-3,
                       frequency_hz=2.3e6, pulse_width_sec=100e-6,
                       pri_sec=500e-6, start_index=1234, noise_std=3e-3)
pipe8 = ChannelizerPipeline.create(
    8, pdw_cfg=PdwConfig.channelized(max_pulses=32, max_pulse_samples=512))
check_truth(pipe8, spec8, 8, 12, "truth_m8_int12", freq_tol=0.5e6)

# ---- 2. int8 packed ingest truth (SC8_Q7 recorders), M=8
check_truth(pipe8, spec8, 8, 8, "truth_m8_int8", freq_tol=0.5e6)

# ---- 3. fine-grained M=560 (0.1 MHz bins at 56 Msps) truth + timing
FS = 56e6
M560 = bands_for_bin_width(FS, 0.1e6)
assert M560 == 560, M560
spec560 = PulseTrainSpec(sample_rate_sps=FS, duration_sec=30e-3,
                         frequency_hz=7.3e6, pulse_width_sec=400e-6,
                         pri_sec=2000e-6, start_index=3001, noise_std=3e-3)
cfg560 = PdwConfig.channelized(max_pulses=64, max_pulse_samples=256)
pipe560 = ChannelizerPipeline.create(M560, pdw_cfg=cfg560)
check_truth(pipe560, spec560, M560, 12, "truth_m560_int12",
            freq_tol=0.049e6, pw_tol=0.25)

# Timing at a production-scale M=560 shape: 0.25 s of 56 Msps = 14M samples.
frames560 = 25088  # 14.05M samples, multiple of the kernel block grid
n560 = frames560 * M560
rng = np.random.default_rng(0)
sig = (0.001 * (rng.standard_normal(n560) + 1j * rng.standard_normal(n560))
       ).astype(np.complex64)
t = np.arange(n560)
tone = np.exp(2j * np.pi * 7.3e6 / FS * t)
for s in range(137, n560 - 22400, 112000):
    sig[s:s + 22400] = tone[s:s + 22400]
q560 = jax.device_put(np.ascontiguousarray(
    iqpacket.from_complex(sig, 12)).view(np.int32).ravel(), dev)


def fwd560(q):
    nf, _, batch = pipe560.forward_packed(q, bit_width=12)
    return touch(nf, batch.mag, batch.snr_db,
                 batch.toa_idx.astype(jnp.float32))


dt = graph_time("m560_packed_step", fwd560, q560)
results["m560_packed"] = {
    "bands": M560, "samples": n560, "ms_per_step": round(dt * 1e3, 2),
    "msps": round(n560 / dt / 1e6, 1),
}

# ---- 4. int8 packed at the flagship M=64 shape: in-graph Msps
from bench import _make_capture

BANDS, FRAMES = 64, 262144
N = BANDS * FRAMES
cap = _make_capture(N, BANDS)
q8 = jax.device_put(np.ascontiguousarray(
    iqpacket.from_complex(cap, 8)).view(np.int16).ravel(), dev)
pipe64 = ChannelizerPipeline.create(
    BANDS, pdw_cfg=PdwConfig.channelized(max_pulses=512,
                                         max_pulse_samples=1024))


def fwd8(q):
    nf, _, batch = pipe64.forward_packed(q, bit_width=8)
    return touch(nf, batch.mag, batch.snr_db,
                 batch.toa_idx.astype(jnp.float32))


dt = graph_time("m64_int8_packed_step", fwd8, q8)
results["m64_int8_packed"] = {
    "samples": N, "ms_per_step": round(dt * 1e3, 2),
    "msps": round(N / dt / 1e6, 1),
}

# ---- 5. packed spectrogram (hamming-768, zero overlap) timing
from sdr_channelizer_tpu.dsp.spectrogram import stft_power_packed

q12 = jax.device_put(np.ascontiguousarray(
    iqpacket.from_complex(cap, 12)).view(np.int32).ravel(), dev)
dt = graph_time(
    "spectrogram_packed", lambda q: touch(stft_power_packed(q, 12)), q12)
results["spectrogram_packed"] = {
    "samples": N, "window": 768, "ms_per_step": round(dt * 1e3, 2),
    "msps": round(N / dt / 1e6, 1),
}

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
path = os.path.join(repo, "VALIDATE_r05.json")
if os.path.exists(path):  # merge: other tools add entries (tpu_int8_point)
    merged = json.load(open(path))
    merged.update(results)
    results = merged
with open(path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
log("wrote VALIDATE_r05.json")
log(json.dumps(results, indent=1, sort_keys=True))
