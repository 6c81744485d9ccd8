#!/usr/bin/env python
"""Headline benchmark: end-to-end channelize->PDW throughput on one chip.

Measures complex Msamples/s through the flagship pipeline (64-band polyphase
channelizer + per-band noise floor + PDW extraction — the compiled
``create_pdws_channelized.m`` chain).  The reference's implied operating
point is keeping up with a 56 Msps radio (BASELINE.md); ``vs_baseline`` is
the multiple of that floor this sustains.

Synchronization note: on some remote TPU transports ``block_until_ready``
returns before execution finishes and complex-dtype device-to-host copies
are unsupported; every timing boundary here therefore fetches one float32
scalar derived from the outputs, which serializes behind all queued device
work on the single compute stream.

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


def _make_capture(n: int, bands: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    fs = bands * 1e6
    t = np.arange(n)
    iq = (0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    )
    for k, (f0, pw, pri) in enumerate([(1.3e6, 100e-6, 1e-3), (-7.6e6, 50e-6, 0.7e-3)]):
        tone = np.exp(2j * np.pi * f0 / fs * t).astype(np.complex64)
        pw_n, pri_n = int(pw * fs), int(pri * fs)
        for s in range(137 + k * 1000, n - pw_n, pri_n):
            iq[s : s + pw_n] = tone[s : s + pw_n]
    return iq


def _time_fn(fn, x, iters: int, warmup: int = 1) -> float:
    """Seconds per call, sync-fenced with scalar fetches."""
    for _ in range(warmup):
        out = fn(x)
    _sync(out)
    # The fence (tunnel round-trip, ~0.4 s) carries tens of ms of jitter;
    # take the min of 3 samples so it doesn't swamp the per-step time.
    fences = []
    for _ in range(3):
        t_fence0 = time.perf_counter()
        _sync(out)
        fences.append(time.perf_counter() - t_fence0)
    fence = min(fences)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    _sync(out)
    dt = time.perf_counter() - t0 - fence
    return max(dt, 1e-9) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=64)
    ap.add_argument("--frames", type=int, default=262144,
                    help="channelizer frames per step (samples = frames*bands)")
    # 40 iters so the measured work (~0.5 s) clears the tunnel fence's
    # tens-of-ms jitter: at 20 iters the same program read up to ~2x slow
    # (24.5 vs 12.7 ms/step, STATS_COST_r02.json fwd_* rows).
    ap.add_argument("--iters", type=int, default=40)
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

    n = args.bands * args.frames
    pipe = ChannelizerPipeline.create(
        args.bands,
        pdw_cfg=PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024),
    )
    cap = _make_capture(n, args.bands)
    # Headline path: the raw recorder payload — int16 I/Q pairs viewed as
    # one int32 plane (on-disk bytes to the device, 4 bytes/sample h2d),
    # deinterleave + sign-extend + Q11 dequant in-kernel.  TPU-ground-truth
    # validated (tools/tpu_validate.py); --planes measures the f32-planes
    # ingest (8 bytes/sample) instead.
    i16 = np.clip(np.round(np.stack([cap.real, cap.imag], -1) * 2048),
                  -2048, 2047).astype(np.int16)
    # NOTE: no complex arrays touch the device — complex h2d/d2h is
    # unimplemented on the TPU transport and poisons later fetches.
    xr = jax.device_put(
        np.ascontiguousarray(i16[:, 0].astype(np.float32) / 2048.0), dev)
    xi = jax.device_put(
        np.ascontiguousarray(i16[:, 1].astype(np.float32) / 2048.0), dev)
    # ``salted``: same forward with a distinct scalar threaded through, so
    # no layer of the remote transport can elide repeated identical
    # (program, args) dispatches — unsalted 8-step latency batches measured
    # ~0.2 ms/step, 50x below the device time, on this tunnel.  The big
    # input stays an ARGUMENT (a jit-closure device array becomes an
    # embedded constant and the remote compile rejects >~100 MB bodies).
    if args.planes:
        def fused_step(_):
            return pipe.step_fused(xr, xi, bit_width=0)

        _salted = jax.jit(
            lambda a, b, k: (pipe.forward_fused(a, b, bit_width=0), k + 1))

        def salted(k):
            return _salted(xr, xi, k)
        ingest = "f32_planes"
    else:
        xq = jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(), dev)

        def fused_step(_):
            return pipe._jit_forward_packed(xq, bit_width=12)

        _salted = jax.jit(
            lambda q, k: (pipe.forward_packed(q, bit_width=12), k + 1))

        def salted(k):
            return _salted(xq, k)
        ingest = "packed_int16"

    if args.stages:
        import jax.numpy as jnp

        from sdr_channelizer_tpu.dsp import pdw as pdwmod
        from sdr_channelizer_tpu.ops import medians
        from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
            pallas_channelize_streams,
        )
        from sdr_channelizer_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        f_ch = jax.jit(lambda a, b: pallas_channelize_streams(
            a, b, pipe.channelizer.taps_rev))
        streams = f_ch(xr, xi)
        _sync(streams)
        mag, ph, sat = streams
        f_nf = jax.jit(lambda v: medians.median(v, axis=0))
        nf = f_nf(mag)
        _sync(nf)
        f_pdw = jax.jit(lambda a, b, c: pdwmod.extract_pdws_channelized_streams(
            a, b, c > 0.5, pipe.pdw_cfg, noise_floor=nf))
        _sync(f_pdw(mag, ph, sat))
        # One device fence per stage (each sync costs a tunnel round-trip).
        for name, fn in (("streams_kernel", lambda: f_ch(xr, xi)),
                         ("noise_floor", lambda: f_nf(mag)),
                         ("pdw_extract", lambda: f_pdw(mag, ph, sat))):
            with timer.stage(name) as box:
                for _ in range(args.iters):
                    out = fn()
                box.append(out)
        for name, tot in timer.totals.items():
            per = tot / args.iters
            print(f"bench: {name:<14s} {n/per/1e6:10.1f} Msps  ({per*1e3:.2f} ms)",
                  file=sys.stderr)

    t_compile0 = time.perf_counter()
    dt = _time_fn(fused_step, None, args.iters)
    print(f"bench: total incl. compile+warmup {time.perf_counter()-t_compile0:.1f}s",
          file=sys.stderr)

    # PDW-extraction latency p50 (BASELINE.md second north-star metric):
    # per-step device execution time, estimated as the fence-subtracted
    # wall time of small dispatch batches (8 steps), p50 across batches.
    # A direct single-step wall measurement is meaningless over the remote
    # tunnel: the sync round-trip (~0.45 s) carries tens-of-ms jitter that
    # dwarfs a ~10 ms step, so each sample amortizes it over 8 steps and
    # the fence is the min of 5 samples.  fence_ms is reported so the
    # subtraction is honest.
    import jax.numpy as jnp

    out = salted(jnp.int32(0))
    _sync(out)
    fences = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(out)
        fences.append(time.perf_counter() - t0)
    fence = min(fences)
    lat = []
    salt = out[1]
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(8):
            out = salted(salt)
            salt = out[1]
        _sync(out)
        lat.append(max(time.perf_counter() - t0 - fence, 0.0) / 8)
    lat_p50 = float(np.median(lat))

    msps = n / dt / 1e6
    print(f"bench: {args.iters} iters, {dt*1e3:.2f} ms/step, "
          f"latency p50 {lat_p50*1e3:.2f} ms (fence {fence*1e3:.0f} ms)",
          file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "channelize_pdw_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 56.0, 1),
                "latency_p50_ms": round(lat_p50 * 1e3, 2),
                "sync_fence_ms": round(fence * 1e3, 2),
                "ingest": ingest,
                "device": f"{dev.platform}:{dev.device_kind}",
            }
        )
    )


if __name__ == "__main__":
    main()
