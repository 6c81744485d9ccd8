"""Worker process for the two-process ``jax.distributed`` test.

Not a test module — spawned by ``test_distributed_two_process.py`` with
``argv = (process_id, num_processes, coordinator_port, workdir)``.  Each
process owns 4 virtual CPU devices (``XLA_FLAGS`` set by the parent), reads
only its own span of the dwell files (``host_local_time_range``), assembles
the globally sharded capture, runs one ``ShardedPipeline`` step, and writes
its addressable rows of the PDW batch for the parent to stitch and compare.

This exercises the real process boundary the virtual single-process mesh
cannot: addressable-shard logic in ``make_global_capture``, host-local
ingest spans, and cross-process collectives (FIR halo ppermute, latch
all_gather, global noise-floor median) through jax's distributed runtime —
SURVEY.md section 4's "multi-process JAX on one host" test plan.
"""

import dataclasses
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, work = sys.argv[3], sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
        initialization_timeout=60,
    )
    import numpy as np

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp.channelizer import Channelizer
    from sdr_channelizer_tpu.dsp.streaming import CaptureSet
    from sdr_channelizer_tpu.parallel import make_mesh
    from sdr_channelizer_tpu.parallel.multihost import (
        host_local_time_range,
        ingest_capture_set,
    )
    from sdr_channelizer_tpu.parallel.pipeline import ShardedPipeline

    assert jax.process_count() == nprocs, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == nprocs * jax.local_device_count(), n_dev

    cs = CaptureSet.from_dir(work)
    seg = cs.segments[0]
    n = seg.num_samples
    mesh = make_mesh(n_time=n_dev, n_chan=1)
    lo, hi = host_local_time_range(mesh, n)
    # Each process must read a proper, disjoint span (the point of the test).
    assert hi - lo == n // nprocs, (lo, hi, n)
    xg = ingest_capture_set(mesh, seg, n)

    cfg = PdwConfig.channelized(max_pulses=32, max_pulse_samples=64)
    pipe = ShardedPipeline(mesh, Channelizer.create(8), cfg, halo_frames=64,
                           halo_mode="strict")
    _, _, batch = pipe.step(xg)

    out = {"lo": lo, "hi": hi}
    for f in dataclasses.fields(batch):
        arr = getattr(batch, f.name)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        out[f.name] = np.concatenate(
            [np.asarray(s.data) for s in shards], axis=0)
    np.savez(os.path.join(work, f"proc{pid}.npz"), **out)
    # One process writing per-process files; barrier so the parent sees both.
    jax.experimental.multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
