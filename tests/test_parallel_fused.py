"""Fused-kernel sharded pipeline parity (interpret mode, virtual CPU mesh).

The fused sharded path runs the Pallas channelize + detection-streams
kernel per time shard (overlap-save FIR history over ``ppermute``) and the
Pallas ``pulse_stats`` extraction per shard — the multi-chip composition of
the single-chip headline path (``bench.py``).  These tests pin bit-identity
against the single-device fused pipeline, including pulses straddling
shard boundaries and the FIR history handoff.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.dsp.channelizer import Channelizer
from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams,
    pallas_channelize_streams_packed,
)
from sdr_channelizer_tpu.parallel import make_mesh
from sdr_channelizer_tpu.parallel.pipeline import ShardedPipeline
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

M = 8
FS = 8e6
CFG = PdwConfig.channelized(max_pulses=64, max_pulse_samples=128)


def _capture(bit_width=12, n_frames=1024, seed=3) -> np.ndarray:
    """Quantized (N, 2) multi-emitter capture with pulses that straddle the
    4-way and 8-way shard boundaries of ``n_frames``."""
    n = n_frames * M
    dur = n / FS
    specs = [
        PulseTrainSpec(sample_rate_sps=FS, duration_sec=dur, frequency_hz=1.02e6,
                       pulse_width_sec=40e-6, pri_sec=110e-6, start_index=37),
        PulseTrainSpec(sample_rate_sps=FS, duration_sec=dur, frequency_hz=-2.97e6,
                       pulse_width_sec=80e-6, pri_sec=270e-6, start_index=803),
    ]
    rng = np.random.default_rng(seed)
    iq = sum(pulse_train(s) for s in specs)
    iq = iq + 1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return np.ascontiguousarray(iqpacket.from_complex(iq.astype(np.complex64),
                                                      bit_width)[:n])


def _sorted_pdws(d):
    order = np.lexsort((d["channel"], d["toa"]))
    return {k: np.asarray(v)[order] for k, v in d.items()}


def _assert_pdws_equal(got, ref):
    got, ref = _sorted_pdws(got), _sorted_pdws(ref)
    assert len(got["toa"]) == len(ref["toa"]) > 10
    for key in ("toa", "pw", "mag", "sat", "channel"):
        np.testing.assert_array_equal(got[key], ref[key], err_msg=key)
    # /360 and log10 may compile as multiply-by-reciprocal in one program
    # and true divide in the other -> a couple f32 ULPs on freq/snr.
    for key in ("freq", "snr"):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-9, atol=1e-5)


def test_streams_kernel_history_parity():
    """Kernel overlap-save: running two halves with the FIR history handoff
    equals one unsharded pass, bit-for-bit (planes and packed ingest)."""
    samples = _capture(12)
    chan = Channelizer.create(M)
    p = chan.taps_rev.shape[0]
    kw = dict(bit_width=12, block_frames=256, interpret=True)
    xr = jnp.asarray(np.ascontiguousarray(samples[:, 0]))
    xi = jnp.asarray(np.ascontiguousarray(samples[:, 1]))
    full = pallas_channelize_streams(xr, xi, chan.taps_rev, **kw)

    half = samples.shape[0] // 2  # whole frames (n_frames even)
    first = pallas_channelize_streams(xr[:half], xi[:half], chan.taps_rev, **kw)
    hist_r = xr[:half].reshape(-1, M)[-(p - 1):]
    hist_i = xi[:half].reshape(-1, M)[-(p - 1):]
    second = pallas_channelize_streams(
        xr[half:], xi[half:], chan.taps_rev, history=(hist_r, hist_i), **kw)
    for f, a, b in zip(full, first, second):
        np.testing.assert_array_equal(
            np.asarray(f), np.concatenate([np.asarray(a), np.asarray(b)]))

    xq = jnp.asarray(samples.view(np.int32).ravel())
    fullp = pallas_channelize_streams_packed(xq, chan.taps_rev, **kw)
    hq = xq[:half].reshape(-1, M)[-(p - 1):]
    secondp = pallas_channelize_streams_packed(
        xq[half:], chan.taps_rev, history=hq, **kw)
    for f, b in zip(fullp, secondp):
        np.testing.assert_array_equal(np.asarray(f)[half // M:], np.asarray(b))


@pytest.mark.parametrize("n_time", [4, 8])
def test_sharded_fused_matches_single_device(n_time):
    """Sharded fused (XLA block-core stats on CPU) == single-device fused."""
    samples = _capture(12)
    chan = Channelizer.create(M)
    mesh = make_mesh(n_time=n_time, n_chan=1)
    pipe = ShardedPipeline(mesh, chan, CFG)
    got = pipe.extract_fused(samples, bit_width=12, fs=FS, fc=1e9,
                             sample_start_time=2.0)
    ref = ChannelizerPipeline(channelizer=chan, pdw_cfg=CFG).extract_fused(
        samples, bit_width=12, fs=FS, fc=1e9, sample_start_time=2.0)
    _assert_pdws_equal(got, ref)


def test_sharded_fused_pallas_stats_route(monkeypatch):
    """With the sort-free route forced (the real-TPU configuration), the
    per-shard Pallas latch + pulse-stats extraction still equals the
    single-device fused pipeline."""
    samples = _capture(12)
    chan = Channelizer.create(M)
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    ref = ChannelizerPipeline(channelizer=chan, pdw_cfg=CFG).extract_fused(
        samples, bit_width=12, fs=FS, fc=1e9, sample_start_time=2.0)

    mesh = make_mesh(n_time=4, n_chan=1)
    pipe = ShardedPipeline(mesh, chan, CFG)
    got = pipe.extract_fused(samples, bit_width=12, fs=FS, fc=1e9,
                             sample_start_time=2.0, stats="pallas")
    _assert_pdws_equal(got, ref)


def test_sharded_fused_int8_packed():
    """8-bit recordings go through the packed int16 lane sharded too."""
    samples = _capture(8)
    assert samples.dtype == np.int8
    chan = Channelizer.create(M)
    mesh = make_mesh(n_time=4, n_chan=1)
    pipe = ShardedPipeline(mesh, chan, CFG)
    got = pipe.extract_fused(samples, bit_width=8, fs=FS, fc=0.0)
    ref = ChannelizerPipeline(channelizer=chan, pdw_cfg=CFG).extract_fused(
        samples, bit_width=8, fs=FS, fc=0.0)
    _assert_pdws_equal(got, ref)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_sharded_fused_chan_split(mesh_shape):
    """The fused pipeline over a full (time x chan) mesh — each mesh column
    runs the kernel with its band slice of the DFT matmul (SURVEY section
    5.8's 2-D mesh) — equals the single-device fused pipeline bit-for-bit."""
    n_time, n_chan = mesh_shape
    samples = _capture(12)
    chan = Channelizer.create(M)
    mesh = make_mesh(n_time=n_time, n_chan=n_chan)
    pipe = ShardedPipeline(mesh, chan, CFG)
    got = pipe.extract_fused(samples, bit_width=12, fs=FS, fc=1e9,
                             sample_start_time=2.0)
    ref = ChannelizerPipeline(channelizer=chan, pdw_cfg=CFG).extract_fused(
        samples, bit_width=12, fs=FS, fc=1e9, sample_start_time=2.0)
    _assert_pdws_equal(got, ref)


def test_sharded_fused_chan_split_pallas_stats(monkeypatch):
    """(2, 2) mesh with the sort-free (real-TPU) per-shard extraction."""
    samples = _capture(12)
    chan = Channelizer.create(M)
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    ref = ChannelizerPipeline(channelizer=chan, pdw_cfg=CFG).extract_fused(
        samples, bit_width=12, fs=FS, fc=1e9, sample_start_time=2.0)
    mesh = make_mesh(n_time=2, n_chan=2)
    pipe = ShardedPipeline(mesh, chan, CFG)
    got = pipe.extract_fused(samples, bit_width=12, fs=FS, fc=1e9,
                             sample_start_time=2.0, stats="pallas")
    _assert_pdws_equal(got, ref)


def test_sharded_fused_rejects_indivisible_bands():
    mesh = make_mesh(n_time=2, n_chan=3)
    pipe = ShardedPipeline(mesh, Channelizer.create(M), CFG)
    with pytest.raises(ValueError, match="divisible"):
        pipe.step_packed(jnp.zeros(4096, jnp.int32), bit_width=12)


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2)])
def test_sharded_fused_cm2_matches_single_device(mesh_shape, monkeypatch):
    """The v2 (cm2) sharded composition — per-shard slim channel-major
    kernels with RAW halo exchange, global masked noise-floor median,
    last-shard +inf latch guard — equals the single-device cm2 route
    pulse-for-pulse, including boundary-straddling pulses and a pulse
    open at capture end."""
    n_time, n_chan = mesh_shape
    m = 16 if n_chan > 1 else M  # m_loc must be 8-aligned for cm2
    n_frames = 1024
    n = n_frames * m
    fs = m * 1e6
    dur = n / fs
    specs = [
        PulseTrainSpec(sample_rate_sps=fs, duration_sec=dur,
                       frequency_hz=1.02e6, pulse_width_sec=40e-6,
                       pri_sec=110e-6, start_index=37),
        PulseTrainSpec(sample_rate_sps=fs, duration_sec=dur,
                       frequency_hz=-2.97e6, pulse_width_sec=80e-6,
                       pri_sec=270e-6, start_index=803),
    ]
    rng = np.random.default_rng(3)
    iq = sum(pulse_train(s) for s in specs)
    iq = (iq + 1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    # re-open a strong pulse at capture end (must NOT be emitted)
    iq[-60:] = iq[37 * 1:37 + 60]
    samples = np.ascontiguousarray(iqpacket.from_complex(iq, 12)[:n])

    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    chan = Channelizer.create(m)
    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=128)
    mesh = make_mesh(n_time=n_time, n_chan=n_chan)
    pipe = ShardedPipeline(mesh, chan, cfg)
    assert pipe._fused2_ok(n)
    got = pipe.extract_fused(samples, bit_width=12, fs=fs, fc=1e9,
                             sample_start_time=2.0)
    ref = ChannelizerPipeline(channelizer=chan, pdw_cfg=cfg).extract_fused(
        samples, bit_width=12, fs=fs, fc=1e9, sample_start_time=2.0)
    _assert_pdws_equal(got, ref)


def test_sharded_fused_cm2_planes_route(monkeypatch):
    """Planes ingest through the v2 sharded composition."""
    samples = _capture(12)
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    chan = Channelizer.create(M)
    mesh = make_mesh(n_time=4, n_chan=1)
    pipe = ShardedPipeline(mesh, chan, CFG)
    xr = np.ascontiguousarray(samples[:, 0], np.float32) / 2048.0
    xi = np.ascontiguousarray(samples[:, 1], np.float32) / 2048.0
    nf, batch = pipe.step_fused(jnp.asarray(xr), jnp.asarray(xi),
                                bit_width=0, route="cm2")
    single = ChannelizerPipeline(channelizer=chan, pdw_cfg=CFG)
    nf_ref, _, batch_ref = single.forward_fused(
        jnp.asarray(xr), jnp.asarray(xi), bit_width=0, route="cm2")
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(nf_ref))
    # per-shard batches stack along time; compare the merged PDW sets
    from sdr_channelizer_tpu.parallel.pipeline import merge_block_batches
    t_loc = samples.shape[0] // (4 * M)
    got = pdwmod.finalize_pdws(
        merge_block_batches(batch, t_loc), fs=FS / M, fc=1e9,
        sample_start_time=2.0, bin_offsets_hz=chan.center_frequencies(FS))
    ref = pdwmod.finalize_pdws(
        batch_ref, fs=FS / M, fc=1e9, sample_start_time=2.0,
        bin_offsets_hz=chan.center_frequencies(FS))
    _assert_pdws_equal(got, ref)
