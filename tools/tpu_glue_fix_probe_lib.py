"""Shared builder for the stats-stage glue probes (w0 slow variant)."""
import os
import sys

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams_packed,
)
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums
from sdr_channelizer_tpu.ops.pallas.transpose_kernel import pallas_cm_streams
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
    TILE, pulse_stats_dense,
)
from sdr_channelizer_tpu.ops.rank_find import find_ranks_cm

BANDS, FRAMES = 64, 262144
N = BANDS * FRAMES
cfg = PdwConfig.channelized(max_pulses=512, max_pulse_samples=1024)
pipe = ChannelizerPipeline.create(BANDS, pdw_cfg=cfg)
taps = pipe.channelizer.taps_rev
THR = 10.0 ** (cfg.snr_threshold_db / 10.0)
SW = pdwmod._SHORT_WINDOW
P_SLOTS = ((cfg.max_pulses + TILE - 1) // TILE) * TILE
N_FLAT = BANDS * P_SLOTS


def touch(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def prefix_p4(q):
    mag, ph, sat = pallas_channelize_streams_packed(
        q, taps, bit_width=12, sat_level=cfg.saturation_level)
    nf = medians.median(mag, axis=0)
    cl, ct = pallas_latch_cumsums(mag, nf * THR, nf * THR)
    m, t_len = mag.shape[1], mag.shape[0]
    ranks2d = jnp.broadcast_to(
        jnp.arange(1, P_SLOTS + 1, dtype=jnp.float32)[None, :], (m, P_SLOTS))
    toa_idx = find_ranks_cm(cl[:m], ranks2d, t_len)
    te_idx = find_ranks_cm(ct[:m], ranks2d, t_len)
    mag_cm, dph_cm, sat_cm = pallas_cm_streams(mag, ph, sat)
    return (nf, cl, ct, toa_idx, te_idx, mag_cm, dph_cm, sat_cm, m, t_len)


def part_scatter(toa_idx, te_idx, m, t_len):
    flat_toa = toa_idx.reshape(-1)
    flat_te = te_idx.reshape(-1)
    chan_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None], (m, P_SLOTS)).reshape(-1)
    plen = flat_te - flat_toa + 1
    sel = (flat_toa < t_len) & (flat_te < t_len) & (plen <= SW)
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    rank = jnp.where(sel, rank, N_FLAT)
    base = jnp.full((N_FLAT,), t_len, jnp.int32)
    return (base.at[rank].set(flat_toa, mode="drop"),
            base.at[rank].set(flat_te, mode="drop"),
            jnp.zeros((N_FLAT,), jnp.int32).at[rank].set(chan_f, mode="drop"))


def make_input():
    rng = np.random.default_rng(0)
    t = np.arange(N)
    sig = (0.001 * (rng.standard_normal(N) + 1j * rng.standard_normal(N))
           ).astype(np.complex64)
    tone = np.exp(2j * np.pi * 1.3e6 / 64e6 * t)
    for s in range(137, N - 6400, 64000):
        sig[s:s + 6400] = tone[s:s + 6400]
    i16 = np.clip(np.round(np.stack([sig.real, sig.imag], -1) * 2048),
                  -2048, 2047).astype(np.int16)
    return jax.device_put(np.ascontiguousarray(i16).view(np.int32).ravel(),
                          jax.devices()[0])


def build_w0_and_input():
    def w0(q):
        nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, m, t_len = prefix_p4(q)
        ts, te_, ch = part_scatter(toa, te, m, t_len)
        mm, dd, ss = pulse_stats_dense(mag_cm, dph_cm, sat_cm, ts, te_, ch,
                                       window=SW, t_len=t_len)
        return touch(nf, cl, ct, toa, te, mag_cm, dph_cm, sat_cm, mm, dd, ss)
    return jax.jit(w0), make_input()
