"""TX/RX loopback and multihost-ingest tests."""

import jax
import numpy as np
import pytest

from sdr_channelizer_tpu.capture.txrx import (
    TxRxSpec,
    loopback,
    matched_filter_delay,
    run_txrx,
    tx_waveform,
)
from sdr_channelizer_tpu.io import iqpacket


def test_tx_waveform_structure():
    spec = TxRxSpec(sample_rate_sps=1e6, chip_width_sec=10e-6, pri_sec=1e-3,
                    duration_sec=5e-3)
    tx = tx_waveform(spec)
    pw = spec.pulse_samples
    assert pw == 130
    on = np.abs(tx) > 0.5
    assert on[:pw].all() and not on[pw : 1000].any()
    assert on.sum() == 5 * pw


def test_barker13_autocorrelation_sidelobes():
    """Barker-13 coding: peak sidelobe of the chip autocorrelation is 1/13."""
    spec = TxRxSpec(sample_rate_sps=1.3e6, chip_width_sec=1e-6 / 1.3,
                    duration_sec=1e-3, barker13=True)
    pw = spec.pulse_samples
    pulse = tx_waveform(spec)[:pw]
    chips = pulse[::spec.chip_samples][:13]
    ac = np.correlate(chips, chips, "full")
    peak = np.abs(ac[12])
    side = np.abs(np.concatenate([ac[:12], ac[13:]])).max()
    assert abs(peak - 13.0) < 1e-5
    assert side <= 1.0 + 1e-5


def test_loopback_roundtrip_files(tmp_path):
    spec = TxRxSpec(sample_rate_sps=2e6, chip_width_sec=5e-6, pri_sec=1e-3,
                    duration_sec=8e-3, delay_samples=137,
                    attenuation_db=20.0, noise_std=1e-3, barker13=True)
    tx_path, rx_path = run_txrx(spec, str(tmp_path), start_epoch=1723800000.0)
    th, ts = iqpacket.read_iq(tx_path)
    rh, rs = iqpacket.read_iq(rx_path)
    assert th.num_samples == rh.num_samples
    tx = iqpacket.to_complex(np.asarray(ts), th.bit_width)
    rx = iqpacket.to_complex(np.asarray(rs), rh.bit_width)
    # matched filter recovers the channel delay from the recorded files
    assert matched_filter_delay(tx, rx) == 137
    # attenuation is respected (20 dB down from 0.9FS TX)
    assert 0.05 < np.abs(rx).max() < 0.2


def test_multihost_single_process_global_array():
    """make_global_capture on one process == device_put + sharding; the
    sharded pipeline consumes it unchanged."""
    import jax.numpy as jnp

    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp.channelizer import Channelizer, channelize
    from sdr_channelizer_tpu.dsp.pdw import extract_pdws_channelized
    from sdr_channelizer_tpu.parallel import make_mesh
    from sdr_channelizer_tpu.parallel.multihost import (
        host_local_time_range,
        make_global_capture,
    )
    from sdr_channelizer_tpu.parallel.pipeline import ShardedPipeline

    m = 8
    n = m * 1024
    rng = np.random.default_rng(0)
    t = np.arange(n)
    iq = (np.exp(2j * np.pi * 0.13 * t) * (t % 800 < 200) * 0.9
          + 1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    mesh = make_mesh(n_time=8, n_chan=1)
    lo, hi = host_local_time_range(mesh, n)
    assert (lo, hi) == (0, n)  # single process owns everything
    xg = make_global_capture(mesh, iq, n, 0)
    assert xg.shape == (n,)

    cfg = PdwConfig.channelized(max_pulses=32, max_pulse_samples=256)
    pipe = ShardedPipeline(mesh, Channelizer.create(m), cfg)
    _, _, batch = pipe.step(xg)
    ref = extract_pdws_channelized(
        channelize(jnp.asarray(iq), Channelizer.create(m)), cfg
    )
    assert int(np.asarray(batch.count).sum()) == int(np.asarray(ref.count).sum())


def test_multihost_segment_ingest(tmp_path):
    """Dwell files -> host-local read -> global sharded array."""
    from sdr_channelizer_tpu.dsp.streaming import CaptureSet
    from sdr_channelizer_tpu.parallel import make_mesh
    from sdr_channelizer_tpu.parallel.multihost import ingest_capture_set
    from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

    fs = 1e6
    spec = PulseTrainSpec(sample_rate_sps=fs, duration_sec=4e-3,
                          frequency_hz=0.2e6, pulse_width_sec=100e-6,
                          pri_sec=500e-6, noise_std=1e-3)
    iq = pulse_train(spec, seed=1)
    # write as 4 contiguous dwell files
    n = len(iq)
    chunk = n // 4
    for k in range(4):
        part = iq[k * chunk : (k + 1) * chunk]
        samples = iqpacket.from_complex(part, 16)
        hdr = iqpacket.IqHeader(
            frequency_hz=0, bandwidth_hz=fs, sample_rate_sps=fs, rx_gain_db=0,
            num_samples=len(part), bit_width=16,
            sample_start_time=100.0 + k * chunk / fs,
        )
        iqpacket.write_iq(tmp_path / f"d{k}.iq", hdr, samples)
    cs = CaptureSet.from_dir(str(tmp_path))
    assert len(cs.segments) == 1
    mesh = make_mesh(n_time=8, n_chan=1)
    xg = ingest_capture_set(mesh, cs.segments[0], n)
    got = np.asarray(xg)
    want = iqpacket.to_complex(iqpacket.from_complex(iq, 16), 16)
    np.testing.assert_array_equal(got, want)
