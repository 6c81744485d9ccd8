"""M=560 headline treatment (VERDICT r4 next #3).

The fine-grained 0.1 MHz-bin configuration
(``generate_channelized_training_iq.m:95-104``) got one smoke test in
round 4 (15 pulses, 655 Msps).  This campaign gives it the M=64
treatment on the real TPU:

1. **Rich truth set** at production scale (0.25 s of 56 Msps = 14.05 M
   samples): six pulse trains across distinct bins covering every stats
   tier — tiny (1-2 frame transients), short, long (> _SHORT_WINDOW
   frames), plus a full-scale train that clips the ADC (saturation flags)
   — each train checked pulse-count-exact against ``pulse_starts``.
2. **Dense + sparse operating points**: the bench-style worst case
   (full-scale mid-transition tones -> every channel catches transients)
   and the fixture regime, timed with the corrected in-graph protocol.
3. **Knob sweep at this shape**: streams-kernel block_frames
   {512, 1024, 2048}, transpose_first on/off, stats batch_tiles {1, 0},
   rank-search block {128, 256} — full-graph A/B, ship the winner.

Writes M560_r05.json.  Single TPU process only.
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


def graph_time(name, fn, *args, reps=2):
    @jax.jit
    def run(K, *a):
        def body(i, acc):
            salt = jnp.isnan(acc).astype(jnp.int32) + i * 0
            q = a[0].at[0].set(a[0][0] ^ salt)
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
    pk, t_pilot = 16, dispatch(16)
    while t_pilot < 1.6 * t_floor and pk < 4000:
        pk *= 2
        t_pilot = dispatch(pk)
    s_pilot = t_pilot / pk
    budget = max(int(8.0 / s_pilot), 8)
    k1 = min(max(8, int(2.5 * t_floor / s_pilot) + 1), budget)
    span = min(max(40, int(1.2 / s_pilot) + 1), budget, 4000)
    ests = []
    for r in range(reps):
        t1 = dispatch(k1 + r)
        t2 = dispatch(k1 + span + r)
        ests.append(max(t2 - t1, 1e-9) / span)
    dt = float(np.median(ests))
    log(f"{name:<28s} {dt*1e3:9.3f} ms/iter (compile {compile_s:.0f}s, "
        f"K1={k1}, span={span})")
    return dt


from sdr_channelizer_tpu.config import PdwConfig, bands_for_bin_width
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.models import ChannelizerPipeline
from sdr_channelizer_tpu.ops.pallas import channelizer_kernel as ck
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_starts

log("devices:", jax.devices())
dev = jax.devices()[0]
results = {"device": f"{dev.platform}:{dev.device_kind}"}

FS = 56e6
M560 = bands_for_bin_width(FS, 0.1e6)
assert M560 == 560, M560
FRAMES = 25088          # 14.05 M samples = 0.251 s at 56 Msps
N = FRAMES * M560
DUR = N / FS
cfg = PdwConfig.channelized(max_pulses=128, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(M560, pdw_cfg=cfg)


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


# ---------------------------------------------------------------- truth ---
# Six trains across distinct bins; PWs span every stats tier at the
# 0.1 MHz frame rate (10 us/frame): 15 us ~ tiny (1-2 frames), 0.5/1 ms
# short, 4/6 ms long (> 256 frames), 20 us tiny-short boundary.  The
# amp-2.0 train clips the ADC -> saturated flags.  PRIs are co-prime-ish
# so pulses interleave across the capture.
# Note on the ADC limiter: the 13.71 MHz train drives the ADC into
# clipping (saturation-flag coverage), and clipping is a hard limiter —
# during each burst it splatters broadband intermodulation into every bin
# and compresses co-occurring pulses, so trains that overlap the bursts
# fragment (measured identically at 2.0x and 1.02x drive).  That is
# faithful clipped-ADC physics, so the truth metric below checks ON-TIME
# CONSERVATION per bin (total recovered pulse width == transmitted width)
# plus a count lower bound, which fragmentation preserves, instead of
# exact fragment counts.
TRAINS = [
    # (freq_hz, pw_sec, pri_sec, amp, start_index)
    (7.30e6, 4.0e-3, 12.0e-3, 0.30, 3001),
    (-11.07e6, 0.5e-3, 5.1e-3, 0.20, 40013),
    (19.92e6, 15e-6, 2.3e-3, 0.50, 8117),
    (-24.55e6, 1.0e-3, 7.7e-3, 0.15, 100003),
    (3.14e6, 6.0e-3, 17.0e-3, 0.25, 260007),
    (13.71e6, 20e-6, 3.9e-3, 1.02, 50021),   # clips: saturation coverage
]


def build_truth_capture():
    rng = np.random.default_rng(0)
    iq = (0.003 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))
          ).astype(np.complex64)
    t = np.arange(N)
    specs = []
    for f0, pw, pri, amp, s0 in TRAINS:
        spec = PulseTrainSpec(sample_rate_sps=FS, duration_sec=DUR,
                              frequency_hz=f0, pulse_width_sec=pw,
                              pri_sec=pri, start_index=s0)
        specs.append(spec)
        tone = (amp * np.exp(2j * np.pi * f0 / FS * t)).astype(np.complex64)
        pw_n = int(round(pw * FS))
        for s in pulse_starts(spec):
            iq[s:s + pw_n] += tone[s:s + pw_n]
    return iq, specs


iq, specs = build_truth_capture()
samples = np.ascontiguousarray(iqpacket.from_complex(iq, 12))
truth_counts = [len(pulse_starts(s)) for s in specs]
log("truth pulses per train:", truth_counts, "total", sum(truth_counts))

t0 = time.perf_counter()
p = pipe.extract_fused(samples, bit_width=12, fs=FS, sample_start_time=0.0)
wall = time.perf_counter() - t0
bin_hz = FS / M560
train_stats = []
ok_all = True
for (f0, pw, pri, amp, s0), spec, want in zip(TRAINS, specs, truth_counts):
    sel = (np.abs(p["freq"] - f0) < 0.6 * bin_hz) & (p["snr"] > 15)
    got = int(sel.sum())
    pw_med = float(np.median(p["pw"][sel])) if got else 0.0
    sum_pw = float(np.sum(p["pw"][sel])) if got else 0.0
    want_on = want * pw
    sat_frac = float(np.mean(p["sat"][sel])) if got else 0.0
    # On-time conservation in the train's +-0.6-bin frequency window
    # (robust to limiter fragmentation, see TRAINS note) + count lower
    # bound.  Upper band 2.3x: a tone on/near a bin EDGE is detected in
    # BOTH adjacent bins with the SAME PDW frequency estimate (the
    # -24.55 MHz train sits exactly on an edge and doubles) — the
    # reference channelized extractor has no dedup either
    # (create_pdws_channelized.m emits per-bin).  Sub-filter-span pulses
    # (< ~14 frames) broaden to the channelizer impulse response, hence
    # the 160 us/pulse floor.
    min_on = want_on * 0.8
    max_on = 2.3 * max(want_on, want * 160e-6)
    ok = got >= want and min_on <= sum_pw <= max_on
    ok_all &= ok
    train_stats.append({
        "freq_mhz": f0 / 1e6, "pw_us": pw * 1e6, "amp": amp,
        "want": want, "got": got, "pw_med_us": round(pw_med * 1e6, 1),
        "on_time_ms": round(sum_pw * 1e3, 2),
        "want_on_time_ms": round(want_on * 1e3, 2),
        "sat_frac": round(sat_frac, 3), "ok": bool(ok)})
    log(f"train {f0/1e6:+7.2f} MHz pw {pw*1e6:7.1f} us: {got}/{want} "
        f"pulses, on-time {sum_pw*1e3:.2f}/{want_on*1e3:.2f} ms, "
        f"sat {sat_frac:.2f} {'OK' if ok else 'MISS'}")
sat_total = int(np.sum(p["sat"]))
results["truth_m560_rich"] = {
    "total_pulses_recovered": int(len(p["toa"])),
    "truth_total": sum(truth_counts),
    "saturated_pdws": sat_total,
    "trains": train_stats, "all_ok": bool(ok_all),
    "compile_plus_run_s": round(wall, 1),
}
assert sat_total > 0, "saturating train produced no saturated PDWs"

# ------------------------------------------------- operating points -------
rng = np.random.default_rng(1)
t = np.arange(N)


def make_point(dense):
    iqp = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))
           ).astype(np.complex64)
    if dense:
        amp, trains = 1.0, [(1.35e6, 100e-6, 1e-3), (-7.65e6, 50e-6, 0.7e-3)]
    else:
        amp, trains = 0.02, [(1.0e6, 100e-6, 1e-3), (-8.0e6, 50e-6, 0.7e-3)]
    for k, (f0, pw, pri) in enumerate(trains):
        tone = (amp * np.exp(2j * np.pi * f0 / FS * t)).astype(np.complex64)
        pw_n, pri_n = int(pw * FS), int(pri * FS)
        for s in range(137 + k * 1000, N - pw_n, pri_n):
            iqp[s:s + pw_n] = tone[s:s + pw_n]
    return jax.device_put(np.ascontiguousarray(
        iqpacket.from_complex(iqp, 12)).view(np.int32).ravel(), dev)


q_dense, q_sparse = make_point(True), make_point(False)


def fwd(q, block_frames=None):
    from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
        pallas_channelize_streams_packed_cm2,
    )

    if block_frames is None:
        nf, _, batch = pipe.forward_packed(q, bit_width=12)
    else:
        mag_cm, dph_cm, satcs = pallas_channelize_streams_packed_cm2(
            q, pipe.channelizer.taps_rev, bit_width=12,
            sat_level=cfg.saturation_level, block_frames=block_frames)
        nf = pdwmod.noise_floor_cm(mag_cm, M560, FRAMES)
        batch = pdwmod._extract_channelized_cm2(
            mag_cm, dph_cm, satcs, cfg, nf, FRAMES, M560)
    return touch(nf, batch.mag, batch.snr_db,
                 batch.toa_idx.astype(jnp.float32))


PARTS = os.environ.get("M560_PARTS", "OP,KNOBS").upper()

if "OP" in PARTS:
    for label, q in (("dense", q_dense), ("sparse", q_sparse)):
        dt = graph_time(f"m560_{label}", fwd, q)
        results[f"m560_{label}"] = {
            "samples": N, "ms_per_step": round(dt * 1e3, 2),
            "msps": round(N / dt / 1e6, 1)}

if "KNOBS" in PARTS:
    knob_results = {}
    # streams-kernel block size at m_pad=640 (2048 measured infeasible:
    # 104 MB of scoped VMEM with the transpose-first look-ahead)
    for bf in (512, 1024):
        try:
            dt = graph_time(f"m560_bf{bf}", lambda q: fwd(q, bf), q_dense)
            knob_results[f"block_frames_{bf}_ms"] = round(dt * 1e3, 2)
        except Exception as e:  # infeasible point: record, keep sweeping
            knob_results[f"block_frames_{bf}_error"] = str(e)[:120]
    # transpose-first off (r4 form) at this shape
    ck.CM2_TRANSPOSE_FIRST = False
    dt = graph_time("m560_tf_off", fwd, q_dense)
    knob_results["transpose_first_off_ms"] = round(dt * 1e3, 2)
    ck.CM2_TRANSPOSE_FIRST = True
    # per-tile stats descents (r4 form)
    pdwmod._STATS_BATCH = 1
    dt = graph_time("m560_bt1", fwd, q_dense)
    knob_results["stats_batch_off_ms"] = round(dt * 1e3, 2)
    pdwmod._STATS_BATCH = 0
    # rank-search block
    pdwmod._RANK_BLOCK = 128
    dt = graph_time("m560_rb128", fwd, q_dense)
    knob_results["rank_block_128_ms"] = round(dt * 1e3, 2)
    pdwmod._RANK_BLOCK = 256
    results["m560_knobs"] = knob_results

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
path = os.path.join(repo, "M560_r05.json")
if os.path.exists(path):
    merged = json.load(open(path))
    merged.update(results)
    results = merged
with open(path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
log("wrote M560_r05.json")
