"""Per-stage timing and JAX profiler integration.

The reference's only tracing is timestamped progress prints
(``create_pdws.m:35,49``; per-dwell ``"Received N"`` prints,
``blade_record_iq_12bit.cpp:311``).  Here: a :class:`StageTimer` that times
named stages (ingest / channelize / detect / merge) with device
synchronization, and :func:`trace` wrapping ``jax.profiler`` for on-device
traces.

Note on synchronization: some remote TPU transports make
``block_until_ready`` a no-op, so :meth:`StageTimer.sync` forces completion
by fetching one scalar derived from the stage output — honest wall-clock on
every backend.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np


def sync_device(tree) -> None:
    """Force completion of every array in ``tree`` (tiny d2h fetch).

    Only the scalar fetch: it dispatches a one-element program that
    serializes behind all queued device work on the single compute stream,
    so its result arriving implies the tree's producers finished.  Do NOT
    also call ``jax.block_until_ready`` here — on the remote-tunnel
    transport it costs a FULL extra round-trip (~0.43 s) on freshly
    produced arrays while the timing fence (stale arrays) doesn't pay it,
    which silently inflated fence-subtracted step times by ~11 ms/step at
    40 iters (bench read 21 ms for a 10 ms program until this was found
    with tools/tpu_ab_probe.py vs bench.py A/B).
    """
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return
    # The scalar fetch serializes only on the fetched leaf's device(s).  If
    # the tree spans several devices (sharded parallel/ outputs), one leaf's
    # stream completing says nothing about the others — fall back to
    # block_until_ready there (multi-device arrays only arise on backends
    # where it works; the single-stream remote tunnel is single-device).
    devices = set()
    for x in leaves:
        try:
            devices |= x.devices()
        except Exception:
            pass
    if len(devices) > 1:
        jax.block_until_ready(leaves)
        return
    leaf = leaves[-1]
    np.asarray(jax.jit(lambda v: jnp.ravel(v)[:1].real.astype(jnp.float32))(leaf))


@dataclasses.dataclass
class StageTimer:
    """Accumulates wall-clock per named stage across repeated passes."""

    totals: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; pass the stage's output pytree as ``sync`` (or call
        :func:`sync_device` yourself before exiting the block)."""
        t0 = time.perf_counter()
        box: List = []
        try:
            yield box
        finally:
            target = box[0] if box else sync
            if target is not None:
                sync_device(target)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<16s} {tot:8.3f} s  ({n} calls, {tot/n*1e3:8.2f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``jax.profiler.trace`` wrapper; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
