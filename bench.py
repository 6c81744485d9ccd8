#!/usr/bin/env python
"""Headline benchmark: end-to-end channelize->PDW throughput on one chip.

Measures complex Msamples/s through the flagship pipeline (64-band polyphase
channelizer + per-band noise floor + PDW extraction — the compiled
``create_pdws_channelized.m`` chain).  The reference's implied operating
point is keeping up with a 56 Msps radio (BASELINE.md); ``vs_baseline`` is
the multiple of that floor this sustains.

Prints exactly one JSON line to stdout; progress goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=64)
    ap.add_argument("--frames", type=int, default=262144,
                    help="channelizer frames per step (samples = frames*bands)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

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

    rng = np.random.default_rng(0)
    t = np.arange(n)
    fs = args.bands * 1e6
    iq = (0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
        np.complex64
    )
    # A handful of real pulses so the PDW stage does representative work.
    for k, (f0, pw, pri) in enumerate([(1.3e6, 100e-6, 1e-3), (-7.6e6, 50e-6, 0.7e-3)]):
        tone = np.exp(2j * np.pi * f0 / fs * t).astype(np.complex64)
        pw_n, pri_n = int(pw * fs), int(pri * fs)
        for s in range(137 + k * 1000, n - pw_n, pri_n):
            iq[s : s + pw_n] = tone[s : s + pw_n]
    x = jax.device_put(iq, dev)

    for _ in range(args.warmup):
        out = pipe.step(x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = pipe.step(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    msps = n * args.iters / dt / 1e6
    print(
        f"bench: {args.iters} iters x {n} samples in {dt:.3f}s", file=sys.stderr
    )
    print(
        json.dumps(
            {
                "metric": "channelize_pdw_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 56.0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
