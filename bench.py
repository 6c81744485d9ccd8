#!/usr/bin/env python
"""Headline benchmark: end-to-end channelize->PDW throughput on one chip.

Measures complex Msamples/s through the flagship pipeline (64-band polyphase
channelizer + per-band noise floor + PDW extraction — the compiled
``create_pdws_channelized.m`` chain) at TWO operating points:

* **dense**: tones mid-transition-band at full scale — every channel's
  512-pulse slot capacity nearly saturates with 1-2 sample edge transients
  (the worst case for the per-pulse statistics tiers);
* **sparse**: the reference's actual fixture regime
  (generate_training_iq.m:16-22 — a few hundred real pulses, two active
  channels) — bin-centered tones 24 dB over the noise floor.

The reference's implied operating point is keeping up with a 56 Msps radio
(BASELINE.md); ``vs_baseline`` is the multiple of that floor the DENSE
point sustains.

Timing protocol — in-graph repetition with the OUT-OF-FLAT-REGION rule
(round-4 calibration, KSWEEP_r04.json): the transport has THREE traps.
(1) Repeated identical (program, args, K) dispatches can be elided to ~0.
(2) Every distinct dispatch pays a ~0.43 s round trip.  (3) Device
execution OVERLAPS that round trip: measured wall(K) =
max(rtt, K*step + ~33 ms), flat until K*step exceeds ~0.43 s — so a
difference (t(K2) - t(K1)) / (K2 - K1) with K1 inside the flat region
UNDER-reports the step (this biased every round-2/3 headline low-K
in-graph number; the K-sweep slope is the truth).  Therefore each
measurement is ONE dispatch running K salted in-graph iterations
(``lax.fori_loop``), every dispatch uses a DISTINCT K, and K1 is chosen
from a pilot so that t(K1) sits well past the flat region; per-step =
median over reps of (t(K2) - t(K1)) / (K2 - K1).  ``block_until_ready``
is a no-op over the tunnel and complex d2h is unsupported, so every
boundary fetches a float32 scalar.

Prints exactly one JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _sync(tree) -> None:
    """Force completion (scalar-fetch barrier; also defeats DCE)."""
    from sdr_channelizer_tpu.utils.profiling import sync_device

    sync_device(tree)


def _make_capture(n: int, bands: int, sparse: bool = False) -> np.ndarray:
    rng = np.random.default_rng(0)
    fs = bands * 1e6
    t = np.arange(n)
    iq = (0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    )
    if sparse:
        # Bin-centered tones 24 dB over the per-channel noise floor: the
        # detector recovers exactly the real pulses (~680 over 262 ms, two
        # active channels, no edge transients) — the reference fixture
        # regime (generate_training_iq.m:16-22).
        amp, trains = 0.02, [(1.0e6, 100e-6, 1e-3), (-8.0e6, 50e-6, 0.7e-3)]
    else:
        # Full-scale tones mid-transition-band: every channel catches
        # broadband edge clicks and threshold-hovering leakage — ~32k
        # 1-2 sample pulses/step, the dense worst case.
        amp, trains = 1.0, [(1.3e6, 100e-6, 1e-3), (-7.6e6, 50e-6, 0.7e-3)]
    for k, (f0, pw, pri) in enumerate(trains):
        tone = (amp * np.exp(2j * np.pi * f0 / fs * t)).astype(np.complex64)
        pw_n, pri_n = int(pw * fs), int(pri * fs)
        for s in range(137 + k * 1000, n - pw_n, pri_n):
            iq[s : s + pw_n] = tone[s : s + pw_n]
    return iq


def _quantize(cap: np.ndarray) -> np.ndarray:
    """complex64 [-1,1) -> interleaved Q11 int16 pairs (the recorder payload)."""
    return np.clip(np.round(np.stack([cap.real, cap.imag], -1) * 2048),
                   -2048, 2047).astype(np.int16)


def _timed_dispatch(run, args_dev, k):
    t0 = time.perf_counter()
    _sync(run(k, *args_dev)[0])
    return time.perf_counter() - t0


def _graph_time(run, args_dev, iters: int = 120, reps: int = 3):
    """Per-step seconds from in-graph repetition; see module docstring.

    ``run(K, *args) -> (acc, count)``.  Returns (dt, per-rep estimates,
    pulse count).  Protocol (KSWEEP_r04.json calibration):

    * every dispatch uses a DISTINCT K (identical-dispatch elision);
    * a pilot measures the transport floor t(4) ~ rtt and a far point to
      estimate the slope, then K1 is picked so K1*step >= 2.5x the floor —
      OUT of the flat region where execution hides under the round trip
      (differencing from inside it under-reports, the round-2/3 bias);
    * the K2-K1 span is stretched until it carries >= ~1.2 s of signal
      against the ~±90 ms single-dispatch jitter; median over reps.
    """
    out = run(3, *args_dev)
    _sync(out[0])
    count = float(np.asarray(out[1]))
    t_floor = _timed_dispatch(run, args_dev, 4)
    # Geometric pilot: keep doubling K until the dispatch clearly exits the
    # flat region (a fixed-K pilot under-runs it for fast graphs, yielding
    # junk slopes and unbounded K1 — the crash mode).  s_est = t/K slightly
    # overestimates the step, which keeps K1 and the budget conservative.
    pk = max(8, iters // 4)
    t_pilot = _timed_dispatch(run, args_dev, pk)
    while t_pilot < 1.6 * t_floor and pk < 4000:
        pk *= 2
        t_pilot = _timed_dispatch(run, args_dev, pk)
    s_pilot = t_pilot / pk
    # Bound every dispatch to ~8 s of device time: a ~20 s dispatch
    # crashed the TPU worker (kernel-fault watchdog) during round-4 probing.
    budget = max(int(8.0 / s_pilot), 8)
    k1 = min(max(8, int(2.5 * t_floor / s_pilot) + 1), budget)
    span = min(max(iters, int(1.2 / s_pilot) + 1), budget, 4000)
    ests = []
    for r in range(reps):
        t1 = _timed_dispatch(run, args_dev, k1 + r)
        t2 = _timed_dispatch(run, args_dev, k1 + span + r)
        ests.append(max(t2 - t1, 1e-9) / span)
    dt = float(np.median(ests))
    print(f"bench: protocol floor {t_floor*1e3:.0f} ms, pilot "
          f"{s_pilot*1e3:.2f} ms/step, K1={k1}, span={span}",
          file=sys.stderr)
    return dt, ests, count


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=64)
    ap.add_argument("--frames", type=int, default=262144,
                    help="channelizer frames per step (samples = frames*bands)")
    # Enough in-graph iterations that the measured work clears the tunnel
    # fence's tens-of-ms jitter with margin: the difference t(K2)-t(K1)
    # carries ~K2-K1 steps of signal against ~±30 ms of per-dispatch fence
    # noise, so at ~1.5-6 ms/step 120 iters gives a 0.2-0.7 s signal
    # (at 20 iters the same program read up to ~2x slow,
    # STATS_COST_r02.json fwd_* rows).
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--stages", action="store_true",
                    help="also time channelize / noise-floor / pdw separately")
    ap.add_argument("--planes", action="store_true",
                    help="measure the f32-planes ingest instead of the "
                         "packed int16 headline")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--inner", action="store_true",
                    help="(internal) run the measurement in this process")
    args = ap.parse_args()

    if not args.inner:
        # The TPU tunnel here can wedge for minutes after an unrelated crash;
        # run the measurement in a watchdogged subprocess and fall back to a
        # clearly-labeled CPU run so the benchmark always reports.
        import subprocess

        base = [sys.executable, os.path.abspath(__file__), "--inner",
                "--bands", str(args.bands), "--frames", str(args.frames),
                "--iters", str(args.iters)]
        base += ["--stages"] if args.stages else []
        base += ["--planes"] if args.planes else []
        # The TPU tunnel stays wedged for minutes after any failed run
        # (its own or another process's) — retry with backoff before
        # falling back to a labeled CPU measurement.  The fallback runs a
        # reduced capture: the interpret-mode Pallas kernels do ~0.1 Msps
        # on this host (full size would take ~1.5 h), and the JSON's
        # "device": "cpu" already marks the number as a liveness signal,
        # not a perf claim.
        cpu_cmd = [sys.executable, os.path.abspath(__file__), "--inner",
                   "--bands", str(args.bands),
                   "--frames", str(min(args.frames, 8192)), "--iters", "2",
                   "--cpu"]
        attempts = ([(base, 1500), (base, 1200)] if not args.cpu else [])
        attempts.append((cpu_cmd, 1800))
        for k, (cmd, tmo) in enumerate(attempts):
            try:
                res = subprocess.run(cmd, timeout=tmo, stdout=subprocess.PIPE)
                out = res.stdout.decode()
                if res.returncode == 0 and '"metric"' in out:
                    sys.stdout.write(out)
                    return
                print(f"bench: attempt failed (rc={res.returncode})", file=sys.stderr)
            except subprocess.TimeoutExpired:
                print(f"bench: attempt timed out ({cmd[-1]})", file=sys.stderr)
            if k + 1 < len(attempts) and "--cpu" not in attempts[k + 1][0]:
                print("bench: waiting out possible tunnel wedge...", file=sys.stderr)
                time.sleep(300)
        raise SystemExit(1)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

    dev = jax.devices()[0]
    print(f"bench: device = {dev.platform}:{dev.device_kind}", file=sys.stderr)

    import jax.numpy as jnp

    n = args.bands * args.frames
    pipe = ChannelizerPipeline.create(
        args.bands,
        pdw_cfg=PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024),
    )
    i16_dense = _quantize(_make_capture(n, args.bands))
    i16_sparse = _quantize(_make_capture(n, args.bands, sparse=True))

    def _touch(*xs):
        tot = jnp.zeros((), jnp.float32)
        for x in xs:
            tot = tot + jnp.sum(x.astype(jnp.float32))
        return tot

    def _outputs(nf, batch):
        return (_touch(nf, batch.mag, batch.snr_db, batch.freq_offset_hz,
                       batch.toa_idx.astype(jnp.float32)),
                jnp.sum(batch.count).astype(jnp.float32))

    # The salt is a runtime-zero, compile-time-opaque perturbation of one
    # input element derived from the loop carry: XLA can't hoist the body
    # out of the fori_loop, and the data flowing through the step is
    # bit-identical.  The big input stays an ARGUMENT (a jit-closure device
    # array becomes an embedded constant and the remote compile rejects
    # >~100 MB bodies).  NOTE: no complex arrays touch the device —
    # complex h2d/d2h is unimplemented on the TPU transport.
    if args.planes:
        # f32-planes ingest (8 bytes/sample h2d); the packed path below is
        # the headline (4 bytes/sample, dequant in-kernel).
        def _planes(i16):
            return (
                jax.device_put(np.ascontiguousarray(
                    i16[:, 0].astype(np.float32) / 2048.0), dev),
                jax.device_put(np.ascontiguousarray(
                    i16[:, 1].astype(np.float32) / 2048.0), dev),
            )

        @jax.jit
        def run(K, a, b):
            def body(_, carry):
                salt = jnp.isnan(carry[0]).astype(jnp.float32)
                nf, mag, batch = pipe.forward_fused(
                    a.at[0].add(salt), b, bit_width=0)
                tot, cnt = _outputs(nf, batch)
                return carry[0] * 0.5 + tot, cnt

            return jax.lax.fori_loop(0, K, body, (jnp.float32(0),) * 2)

        dense_in, sparse_in = _planes(i16_dense), _planes(i16_sparse)
        ingest = "f32_planes"
    else:
        # Headline path: the raw recorder payload — int16 I/Q pairs viewed
        # as one int32 plane, deinterleave + sign-extend + Q11 dequant
        # in-kernel.  TPU-ground-truth validated (tools/tpu_validate.py).
        def _packed(i16):
            return (jax.device_put(
                np.ascontiguousarray(i16).view(np.int32).ravel(), dev),)

        @jax.jit
        def run(K, q):
            def body(_, carry):
                salt = jnp.isnan(carry[0]).astype(jnp.int32)
                nf, mag, batch = pipe.forward_packed(
                    q.at[0].set(q[0] ^ salt), bit_width=12)
                tot, cnt = _outputs(nf, batch)
                return carry[0] * 0.5 + tot, cnt

            return jax.lax.fori_loop(0, K, body, (jnp.float32(0),) * 2)

        dense_in, sparse_in = _packed(i16_dense), _packed(i16_sparse)
        ingest = "packed_int16"

    if args.stages:
        # Coarse per-stage split (streams kernel / noise floor / PDW tail),
        # each timed with the same in-graph protocol.  For the full prefix
        # bisect of the headline graph use tools/tpu_probe_r3.py.
        from sdr_channelizer_tpu.dsp import pdw as pdwmod
        from sdr_channelizer_tpu.ops import medians
        from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
            pallas_channelize_streams,
        )

        sr = jax.device_put(np.ascontiguousarray(
            i16_dense[:, 0].astype(np.float32) / 2048.0), dev)
        si = jax.device_put(np.ascontiguousarray(
            i16_dense[:, 1].astype(np.float32) / 2048.0), dev)

        def _loop1(fn):
            @jax.jit
            def r(K, *a):
                def body(_, acc):
                    salt = jnp.isnan(acc).astype(a[0].dtype)
                    return acc * 0.5 + fn(a[0].at[(0,) * a[0].ndim].add(salt),
                                          *a[1:])

                return jax.lax.fori_loop(0, K, body, jnp.float32(0)), 0.0

            return r

        streams = jax.jit(lambda a, b: pallas_channelize_streams(
            a, b, pipe.channelizer.taps_rev))(sr, si)
        _sync(streams)
        mag, ph, sat = streams
        nf = jax.jit(lambda v: medians.median(v, axis=0))(mag)
        _sync(nf)
        for name, fn, a in (
            ("streams_kernel", lambda x, y: _touch(*pallas_channelize_streams(
                x, y, pipe.channelizer.taps_rev)), (sr, si)),
            ("noise_floor", lambda v: _touch(medians.median(v, axis=0)),
             (mag,)),
            ("pdw_extract", lambda x, y, z: _touch(
                *(o for o in pdwmod.extract_pdws_channelized_streams(
                    x, y, z > 0.5, pipe.pdw_cfg, noise_floor=nf)
                  if o is not None)), (mag, ph, sat)),
        ):
            per, _, _ = _graph_time(_loop1(fn), a, iters=args.iters, reps=2)
            print(f"bench: {name:<14s} {n/per/1e6:10.1f} Msps  "
                  f"({per*1e3:.2f} ms)", file=sys.stderr)

    t_compile0 = time.perf_counter()
    dt, ests, n_dense = _graph_time(run, dense_in, iters=args.iters)
    print(f"bench: dense total incl. compile+warmup "
          f"{time.perf_counter()-t_compile0:.1f}s", file=sys.stderr)
    # Latency p50 (BASELINE.md second north-star metric): per-step device
    # execution, the median of the per-rep in-graph estimates — the same
    # executable as the throughput number.
    lat_p50 = float(np.median(ests))

    # Sparse operating point: same compiled program, different payload.
    dt_sparse, _, n_sparse = _graph_time(run, sparse_in, iters=args.iters)

    msps = n / dt / 1e6
    msps_sparse = n / dt_sparse / 1e6
    # Published variance band (round-4 ask: one number ± a stated bound):
    # spread of the per-rep in-graph estimates around the best estimate.
    spread_pct = (0.0 if dt <= 0 else
                  round((max(ests) - min(ests)) / dt * 100.0, 1))
    print(f"bench: dense  {dt*1e3:.2f} ms/step ({int(n_dense)} pulses), "
          f"latency p50 {lat_p50*1e3:.2f} ms, rep spread {spread_pct}%",
          file=sys.stderr)
    print(f"bench: sparse {dt_sparse*1e3:.2f} ms/step "
          f"({int(n_sparse)} pulses)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "channelize_pdw_throughput",
                "value": round(msps, 3),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 56.0, 3),
                "latency_p50_ms": round(lat_p50 * 1e3, 2),
                "dense_pulses_per_step": int(n_dense),
                "sparse_msps": round(msps_sparse, 3),
                "sparse_pulses_per_step": int(n_sparse),
                "protocol": "in-graph fori_loop repetition",
                "rep_spread_pct": spread_pct,
                "ingest": ingest,
                "device": f"{dev.platform}:{dev.device_kind}",
            }
        )
    )


if __name__ == "__main__":
    main()
