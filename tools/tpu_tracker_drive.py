"""Drive the closed-loop EventTracker on the real TPU and record latency.

The tracker (``capture/tracker.py``) is the rebuild of the reference's only
real-time native DSP (``usrp_predict_event.cpp:208-389``: dwell -> mean
noise floor -> 20 dB PDWs -> quadratic SNR fit -> median-PRI schedule ->
timed next dwell).  Round-4 configuration:

* dwells are synthesized ON DEVICE (``capture.DeviceDwellEmitter``) — no
  host synthesis (round 3's 1.8 s/dwell ``gen_host``) and no host->device
  sample transfer;
* extraction is the event-mode mean-amplitude path
  (``dsp.pdw.extract_pdws_event`` — the C++ loop's exact statistics,
  prefix sums, no window bound, no Pallas) with the quadratic fit folded
  on device, so the per-dwell packed fetch is the only sync.

Reported per dwell:
  * ``gen_device`` — synced on-device dwell synthesis cost (measured
    separately; inside the loop the emit overlaps the extract dispatch)
  * ``extract``  — tracker step minus the receive dispatch: on-chip
    extraction + the single packed fetch
  * ``total``    — tracker step wall
plus the measured tunnel fence (round-trip) so ``extract - fence``
approximates what a co-located host would see.  "Real-time" = extract p95
below the dwell duration (the reference receives continuously; processing
must keep up with the dwell rate).

Round-5 stress scenes (VERDICT r4 next #4 — the r4 artifacts all ran a
~2-pulses-per-dwell scanning beam, the easiest regime) via TRACKER_SCENE:

* ``scan``  — the r4 baseline scanning beam (default);
* ``dense`` — PRI 0.5 ms -> ~160 pulses per 80 ms dwell hitting the fit;
* ``sat``   — emitter 6 dB over full scale: saturation_events > 0 and the
  reference's gain-down-1dB ladder (usrp_predict_event.cpp:210-218)
  actually steps on the TPU drive until the ADC unclips;
* ``two``   — a second steady emitter at a distinct PRI/tone interleaved
  with the scanned one (the median-PRI predictor's behavior under
  multi-emitter TOA streams).

Single TPU process only (single-client tunnel).
Writes TRACKER_r05_<scene>[_<fs>M].json.
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

    from sdr_channelizer_tpu.capture import DeviceDwellEmitter, EventTracker
    from sdr_channelizer_tpu.utils.profiling import sync_device

    fs = float(os.environ.get("TRACKER_FS", 56e6))
    dwell_sec = float(os.environ.get("TRACKER_DWELL", 0.08))
    n_dwells = int(os.environ.get("TRACKER_DWELLS", 20))
    scene = os.environ.get("TRACKER_SCENE", "scan")

    dev = jax.devices()[0]
    log("device:", dev.platform, dev.device_kind, "scene:", scene)

    period = 0.5
    kw = dict(
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
    if scene == "dense":
        # ~160 pulses per 80 ms dwell all hitting the mean-amp extractor
        # and the quadratic fit (reference loop ingests them all).  The
        # pulse width shrinks with the PRI: the reference's noise floor is
        # the dwell MEAN (usrp_predict_event.cpp:288), so duty must stay
        # low enough that 100x mean (20 dB) clears the beam amplitude —
        # at 2% duty the floor self-raises past full scale and NOTHING
        # detects (faithful behavior, measured on the first r5 drive).
        kw.update(pri_sec=0.5e-3, pulse_width_sec=2e-6)
    elif scene == "sat":
        # 6 dB over full scale: every beam-center dwell clips until the
        # gain ladder has stepped the ADC back under 0.9999.
        kw.update(rel_amplitude=2.0)
    elif scene == "two":
        # Second steady emitter, distinct PRI + tone.  Amplitude must
        # clear 100x the (mean) floor it raises itself: 0.6 at 0.24% duty
        # keeps threshold ~0.3 -> both emitters detect, the second in
        # EVERY dwell (the interleaved-TOA stream the median-PRI
        # predictor must survive).
        kw.update(tone2_offset_hz=-3.1e6 * (fs / 56e6),
                  pulse_width2_sec=8e-6, pri2_sec=3.3e-3,
                  rel_amplitude2=0.6)
    elif scene != "scan":
        raise SystemExit(f"unknown TRACKER_SCENE {scene!r}")
    radio = DeviceDwellEmitter(**kw)

    recv_dispatch = []
    orig_receive = radio.receive

    def timed_receive(n, start_time=None):
        t0 = time.perf_counter()
        out = orig_receive(n, start_time=start_time)
        recv_dispatch.append(time.perf_counter() - t0)
        return out

    radio.receive = timed_receive

    tracker = EventTracker(radio=radio, dwell_sec=dwell_sec)
    log("route: device-generated dwell + on-chip mean-amp extract + fit")

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

    # Synced on-device generation cost (emit + sync, minus fence): inside
    # the tracker loop the emit is dispatched asynchronously and overlaps
    # the extract, so it is measured standalone here.
    dwell_n = int(round(dwell_sec * fs))
    gen_synced = []
    for _ in range(4):
        t0 = time.perf_counter()
        planes, _ = orig_receive(dwell_n)
        sync_device(planes)
        gen_synced.append(max(time.perf_counter() - t0 - fence, 0.0))
    gen_dev = float(np.median(gen_synced))
    log(f"gen_device (synced, minus fence): {gen_dev*1e3:.1f} ms")

    recv_dispatch.clear()
    totals, extracts, pulses, gains = [], [], [], []
    tracker.events.clear()
    tracker.next_event_time = None
    for k in range(n_dwells):
        t0 = time.perf_counter()
        rep = tracker.step()
        total = time.perf_counter() - t0
        extract = total - recv_dispatch[-1]
        totals.append(total)
        extracts.append(extract)
        pulses.append(rep.num_pulses)
        gains.append(float(radio.gain_db))
        log(f"dwell {k:2d}: total {total*1e3:7.1f} ms  "
            f"recv-dispatch {recv_dispatch[-1]*1e3:6.1f}  "
            f"extract {extract*1e3:7.1f}  pulses {rep.num_pulses:4d}  "
            f"gain {radio.gain_db:5.1f}  sat={rep.saturated}  "
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
        "route": "device_gen + onchip mean-amp extract + onchip fit",
        "tunnel_fence_ms": round(fence * 1e3, 1),
        "first_dwell_incl_compile_s": round(compile_s, 1),
        "total": stats(totals),
        "extract": stats(extracts),
        # (a round-4 "extract_minus_fence" field — p50 minus a larger
        # constant — carried no information and was dropped per VERDICT r4
        # weak #6; keeps_up_raw / tunnel_fence_ms tell the story.)
        "gen_device_synced_ms": round(gen_dev * 1e3, 1),
        "gen_under_dwell": gen_dev < dwell_sec,
        "scene": scene,
        "pulses_per_dwell_p50": float(np.median(pulses)),
        "pulses_per_dwell_max": int(np.max(pulses)),
        "gain_db_trace": gains,
        "gain_steps_taken": int(round(gains[0] - min(gains))),
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
    name = (f"TRACKER_r05_{scene}.json" if abs(fs - 56e6) < 1
            else f"TRACKER_r05_{scene}_{int(round(fs / 1e6))}M.json")
    with open(os.path.join(repo, name), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    log(f"wrote {name}")
    log(json.dumps(payload, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
