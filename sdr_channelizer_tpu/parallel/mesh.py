"""Device mesh construction for the (time x channel) 2-D layout.

Axis semantics (``config.ShardingConfig``):

* ``time``  — the capture's sample axis, sharded into contiguous blocks;
  neighboring shards exchange FIR-history and pulse halos over ICI with
  ``ppermute`` (the reference's analog is one dwell file per time window,
  ``blade_record_iq_12bit.cpp:287-325``).
* ``chan``  — the channelizer output bands; PDW extraction is embarrassingly
  parallel across bands (``create_pdws_channelized.m:79`` loops bins
  sequentially), and the channel-extraction DFT matmul is column-split so
  each shard only computes its own bands.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

TIME_AXIS = "time"
CHAN_AXIS = "chan"


def make_mesh(
    n_time: Optional[int] = None,
    n_chan: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    """Build a ``(time, chan)`` mesh over ``devices`` (default: all).

    ``n_time`` defaults to ``len(devices) // n_chan``.  Time is the major
    (outer) axis so neighboring time blocks sit on adjacent devices — halo
    exchange then rides nearest-neighbor ICI links.
    """
    devs = list(jax.devices() if devices is None else devices)
    if n_time is None:
        if len(devs) % n_chan:
            raise ValueError(f"{len(devs)} devices not divisible by n_chan={n_chan}")
        n_time = len(devs) // n_chan
    need = n_time * n_chan
    if need > len(devs):
        raise ValueError(f"mesh {n_time}x{n_chan} needs {need} devices, have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_time, n_chan)
    return jax.sharding.Mesh(grid, (TIME_AXIS, CHAN_AXIS))
