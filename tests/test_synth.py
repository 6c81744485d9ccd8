"""Synthetic generator tests: ground-truth pulse placement, tone phase,
Barker coding, and the v1 training-file writer
(``generate_training_iq.m``, ``generate_pulsed_iq.m`` semantics)."""

import numpy as np

from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.signal import synth
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec


def test_pulse_placement_and_width():
    spec = PulseTrainSpec(
        sample_rate_sps=1e6,
        duration_sec=10e-3,
        frequency_hz=0.0,
        pulse_width_sec=100e-6,
        pri_sec=1000e-6,
        start_index=37,
    )
    iq = synth.pulse_train(spec)
    mag = np.abs(iq)
    starts = synth.pulse_starts(spec)
    # 10 PRIs in the capture; the last pulse at 37+9000 has 37+9000+100<10000 ok
    assert len(starts) == 10
    for s in starts:
        assert np.all(mag[s : s + spec.pw_samples] > 0.99)
    # gaps are zero
    assert mag[36] == 0.0
    assert mag[37 + spec.pw_samples] == 0.0


def test_pulse_must_fit_entirely():
    # Reference writes a pulse only when idx + pw < N (generate_training_iq.m:52).
    spec = PulseTrainSpec(
        sample_rate_sps=1e6,
        duration_sec=1e-3,
        pulse_width_sec=200e-6,
        pri_sec=500e-6,
        start_index=850,
    )
    iq = synth.pulse_train(spec)
    assert np.all(np.abs(iq) == 0.0)


def test_cw_tone_frequency():
    fs = 1e6
    f = 123456.0
    spec = PulseTrainSpec(
        sample_rate_sps=fs,
        duration_sec=1e-3,
        frequency_hz=f,
        pulse_width_sec=500e-6,
        pri_sec=1000e-6,
        start_index=0,
    )
    iq = synth.pulse_train(spec)
    pw = spec.pw_samples
    ph = np.unwrap(np.angle(iq[:pw]))
    dphase = np.diff(ph)
    np.testing.assert_allclose(dphase, 2 * np.pi * f / fs, rtol=1e-3)
    # Reference phase accumulator starts at 0 (generate_training_iq.m:44-47)
    assert abs(np.angle(iq[0])) < 1e-6


def test_lfm_chirp_sweeps():
    fs = 56e6
    spec = PulseTrainSpec(
        sample_rate_sps=fs,
        duration_sec=200e-6,
        frequency_hz=-5e6,
        pulse_width_sec=100e-6,
        pri_sec=200e-6,
        lfm_extent_hz=10e6,
    )
    iq = synth.pulse_train(spec)
    pw = spec.pw_samples
    inst_f = np.diff(np.unwrap(np.angle(iq[:pw]))) * fs / (2 * np.pi)
    # starts near -5 MHz, ends near +5 MHz
    assert abs(np.mean(inst_f[:100]) - (-5e6)) < 0.2e6
    assert abs(np.mean(inst_f[-100:]) - 5e6) < 0.2e6


def test_barker13_phase_flips():
    ph = synth.barker13_phase(13 * 4)
    assert len(ph) == 52
    np.testing.assert_allclose(ph[: 5 * 4], np.deg2rad(90))
    np.testing.assert_allclose(ph[5 * 4 : 7 * 4], np.deg2rad(-90))
    np.testing.assert_allclose(ph[-4:], np.deg2rad(90))


def test_random_spec_distributions():
    for seed in range(20):
        spec = synth.random_pulse_train_spec(seed)
        assert -28e6 <= spec.frequency_hz <= 28e6
        assert 10e-6 <= spec.pulse_width_sec <= 1000e-6
        assert spec.pri_sec >= max(10e-6, spec.pulse_width_sec) - 1e-12
        assert spec.pri_sec <= 10000e-6
        assert 1 <= spec.start_index <= spec.pri_samples + 1


def test_write_training_iq_v1(tmp_path):
    spec = PulseTrainSpec(
        sample_rate_sps=2e6,
        duration_sec=5e-3,
        frequency_hz=250e3,
        pulse_width_sec=50e-6,
        pri_sec=500e-6,
        start_index=10,
    )
    p = tmp_path / "train.iq"
    hdr = synth.write_training_iq(p, spec, sample_start_time=1700000000.0)
    got, samples = iqpacket.read_iq(p)
    assert got.file_format == 1
    assert got.bit_width == 16
    assert got.board_name == "simulated"
    assert got.sample_rate_sps == 2e6
    assert got.bandwidth_hz == 2e6
    assert got.num_samples == spec.num_samples
    iq = iqpacket.to_complex(np.asarray(samples), got.bit_width)
    ref = synth.pulse_train(spec)
    # int16 quantization error only (and +/-1.0 saturating to 32767/32768)
    np.testing.assert_allclose(iq, ref, atol=2.0 / 32768)
