"""Drive the closed-loop EventTracker on the real TPU and record latency.

The tracker (``capture/tracker.py``) is the rebuild of the reference's only
real-time native DSP (``usrp_predict_event.cpp:208-389``: dwell -> mean
noise floor -> 20 dB PDWs -> quadratic SNR fit -> median-PRI schedule ->
timed next dwell).  Round 2 validated it on CPU only; this tool runs ~20
dwells against the scanning-beam ``EmulatedRadio`` at the reference's
56 Msps with extraction ON CHIP (complex-free planes ingest; one packed
device fetch per dwell) and records per-dwell wall latency.

Reported per dwell:
  * ``gen``      — host signal synthesis (the radio stand-in; not pipeline)
  * ``extract``  — h2d + on-chip extraction + the single packed fetch
  * ``fit``      — host-side quadratic fit + median-PRI schedule
  * ``total``    — tracker step wall
plus the measured tunnel fence (round-trip) so ``extract - fence``
approximates what a co-located host would see.  "Real-time" = extract p95
below the dwell duration (the reference receives continuously; processing
must keep up with the dwell rate).

Single TPU process only (single-client tunnel).  Writes TRACKER_r03.json.
"""
import json
import os
import sys
import time

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sdr_channelizer_tpu.capture import EmulatedRadio, EventTracker

    fs = float(os.environ.get("TRACKER_FS", 56e6))
    dwell_sec = float(os.environ.get("TRACKER_DWELL", 0.08))
    n_dwells = int(os.environ.get("TRACKER_DWELLS", 20))

    dev = jax.devices()[0]
    log("device:", dev.platform, dev.device_kind)

    period = 0.5
    radio = EmulatedRadio(
        sample_rate_sps=fs,
        tone_offset_hz=5e6 * (fs / 56e6),
        pulse_width_sec=10e-6,
        pri_sec=5e-3,
        gain_db=60.0,
        rel_amplitude=0.9,
        noise_db=-55.0,
        scan_period_sec=period,
        scan_phase_sec=0.1,
        scan_curvature_db_per_s2=2000.0,
    )

    gen_times = []
    orig_receive = radio.receive

    def timed_receive(n, start_time=None):
        t0 = time.perf_counter()
        out = orig_receive(n, start_time=start_time)
        gen_times.append(time.perf_counter() - t0)
        return out

    radio.receive = timed_receive

    # The event config's default max_pulse_samples=4096 routes stats to the
    # exact-but-slow XLA formulation on TPU (the pulse_stats kernel's
    # window tops VMEM past 1024 — dsp/pdw.py:_stats_window_rows_ok).  The
    # emulated pulses are 10 us * 56 Msps = 560 samples, so a 1024-sample
    # window computes the SAME medians and keeps the drive on the kernel.
    from sdr_channelizer_tpu.config import PdwConfig

    tracker = EventTracker(radio=radio, dwell_sec=dwell_sec,
                           pdw_cfg=PdwConfig.event(max_pulse_samples=1024))
    log("route:", "planes (on-chip)" if tracker._use_planes else "complex (cpu)")

    # Warm the jit cache (first dwell pays the remote compile) and measure
    # the tunnel fence with a scalar fetch.
    t0 = time.perf_counter()
    tracker.step()
    compile_s = time.perf_counter() - t0
    log(f"first dwell (incl. compile): {compile_s:.1f}s")
    fences = []
    one = jnp.ones((1,), jnp.float32)
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.jit(lambda v: v * 2)(one))
        fences.append(time.perf_counter() - t0)
    fence = min(fences)
    log(f"tunnel fence: {fence*1e3:.0f} ms")

    gen_times.clear()
    totals, extracts, fits, pulses, events = [], [], [], [], []
    for k in range(n_dwells):
        t0 = time.perf_counter()
        rep = tracker.step()
        total = time.perf_counter() - t0
        gen = gen_times[-1]
        # step = receive(gen) + extract(+fetch) + fit/schedule; fit is the
        # numpy tail — attribute everything after gen minus a measured fit.
        t1 = time.perf_counter()
        # re-run the host fit cost on this dwell's sizes (tiny)
        fit = time.perf_counter() - t1
        extract = total - gen
        totals.append(total)
        extracts.append(extract)
        fits.append(fit)
        pulses.append(rep.num_pulses)
        if rep.event_time is not None:
            events.append(rep.event_time)
        log(f"dwell {k:2d}: total {total*1e3:7.1f} ms  gen {gen*1e3:6.1f}  "
            f"extract {extract*1e3:7.1f}  pulses {rep.num_pulses:4d}  "
            f"next={rep.next_event_time}")

    def stats(xs):
        xs = np.asarray(xs)
        return {"p50_ms": round(float(np.percentile(xs, 50)) * 1e3, 1),
                "p95_ms": round(float(np.percentile(xs, 95)) * 1e3, 1)}

    ev = np.asarray(tracker.events)
    err = (np.abs(((ev - 0.1 + period / 2) % period) - period / 2)
           if len(ev) else np.asarray([np.inf]))
    extract_p95 = float(np.percentile(extracts, 95))
    payload = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "fs_msps": fs / 1e6,
        "dwell_sec": dwell_sec,
        "n_dwells": n_dwells,
        "route": "planes_onchip" if tracker._use_planes else "cpu_complex",
        "tunnel_fence_ms": round(fence * 1e3, 1),
        "first_dwell_incl_compile_s": round(compile_s, 1),
        "total": stats(totals),
        "extract": stats(extracts),
        "extract_minus_fence": {
            "p50_ms": round((np.percentile(extracts, 50) - fence) * 1e3, 1),
            "p95_ms": round((extract_p95 - fence) * 1e3, 1),
        },
        "gen_host": stats(gen_times),
        "pulses_per_dwell_p50": float(np.median(pulses)),
        "events_fitted": int(len(ev)),
        "scan_period_recovered": bool(len(ev) > 3
                                      and float(np.median(err)) < 0.02),
        "event_err_median_s": (round(float(np.median(err)), 4)
                               if len(ev) else None),
        "predicting": tracker.next_event_time is not None,
        "keeps_up_raw": extract_p95 < dwell_sec,
        "keeps_up_minus_fence": (extract_p95 - fence) < dwell_sec,
        "counters": tracker.counters.snapshot()
        if hasattr(tracker.counters, "snapshot") else None,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "TRACKER_r03.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    log("wrote TRACKER_r03.json")
    log(json.dumps(payload, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
