#!/usr/bin/env python
"""Scaling-efficiency benchmark: samples/s through the sharded pipeline at
mesh sizes 1, 2, 4, ... devices (BASELINE.md north-star: >= 80% scaling
efficiency).

On a machine with one real TPU chip this degenerates to the single-chip
number; run with ``JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8`` to validate the
harness and the collective paths on a virtual mesh (relative CPU scaling is
not a TPU claim — the harness is what transfers to real multi-chip).

Prints one JSON line per mesh size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _sync(tree) -> None:
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    jax.block_until_ready(leaves)
    leaf = leaves[0]
    np.asarray(jax.jit(lambda v: jnp.ravel(v)[:1].real.astype(jnp.float32))(leaf))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", type=int, default=64)
    ap.add_argument("--frames-per-device", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chan-split", type=int, default=1,
                    help="channel-axis size of the mesh (rest goes to time)")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force a virtual CPU mesh of this many devices "
                         "(the JAX_PLATFORMS env var is ignored on this box)")
    ap.add_argument("--fixed-total", action="store_true",
                    help="strong-scaling mode: shard the SAME total capture "
                         "across every mesh size.  On a virtual CPU mesh "
                         "(shared physical cores) this is the honest metric: "
                         "throughput should stay flat, so value/value[1] "
                         "measures sharding+collective overhead, not compute "
                         "scaling")
    ap.add_argument("--fused", action="store_true",
                    help="measure the fused-kernel sharded path (per-shard "
                         "Pallas channelize-streams kernel, packed int16 "
                         "ingest — the multi-chip form of the bench.py "
                         "headline).  Requires chan-split 1.")
    args = ap.parse_args()
    if args.fused and args.chan_split != 1:
        ap.error("--fused shards time only; use --chan-split 1")

    import os

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp.channelizer import Channelizer
    from sdr_channelizer_tpu.parallel import make_mesh
    from sdr_channelizer_tpu.parallel.pipeline import ShardedPipeline

    n_devices = len(jax.devices())
    sizes = []
    d = 1
    while d <= n_devices:
        sizes.append(d)
        d *= 2

    chan = Channelizer.create(args.bands)
    cfg = PdwConfig.channelized(max_pulses=256, max_pulse_samples=1024)
    rng = np.random.default_rng(0)

    results = {}
    for nd in sizes:
        n_chan = args.chan_split if nd % args.chan_split == 0 and nd >= args.chan_split else 1
        n_time = nd // n_chan
        mesh = make_mesh(n_time=n_time, n_chan=n_chan,
                         devices=jax.devices()[:nd])
        pipe = ShardedPipeline(mesh, chan, cfg)
        total_time = max(sizes) if args.fixed_total else n_time
        n = args.bands * args.frames_per_device * total_time
        x = (0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
             ).astype(np.complex64)
        if args.fused:
            i16 = np.clip(np.round(np.stack([x.real, x.imag], -1) * 2048),
                          -2048, 2047).astype(np.int16)
            xq = i16.view(np.int32).ravel()
            step = lambda: pipe.step_packed(xq, bit_width=12)
        else:
            step = lambda: pipe.step(x)
        out = step()
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step()
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        msps = n / dt / 1e6
        results[nd] = msps
        if args.fixed_total:
            eff = msps / results[1] if 1 in results and nd > 1 else 1.0
        else:
            eff = msps / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(json.dumps({
            "metric": "sharded_throughput", "devices": nd,
            "mesh": f"{n_time}x{n_chan}", "value": round(msps, 1),
            "unit": "Msamples/s",
            ("overhead_efficiency" if args.fixed_total else "scaling_efficiency"):
                round(eff, 3),
        }))

    if len(results) > 1:
        top = max(results)
        if args.fixed_total:
            eff = results[top] / results[1]
            name = "sharding_overhead_efficiency"
        else:
            eff = results[top] / (results[1] * top)
            name = "scaling_efficiency"
        print(json.dumps({
            "metric": name, "value": round(eff, 3),
            "unit": f"1->{top} devices", "vs_baseline": round(eff / 0.8, 2),
        }))
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
