"""Channelizer correctness tests.

The oracle is a brute-force NumPy implementation of the defining equation
(downconvert -> lowpass -> decimate, frame convention):

    y_k[n] = (h * (x . e^{-j2pi k t/M}))[nM + M - 1]

which is independent of the polyphase/DFT factorization under test.
Behavioral contracts from the reference: output (N/M, M), fftshift centering,
decimated rate fs/M, truncation to a multiple of M
(``create_pdws_channelized.m:52-62``).
"""

import numpy as np
import pytest

from sdr_channelizer_tpu.dsp import channelizer as chlib
from sdr_channelizer_tpu.ops import filters
from sdr_channelizer_tpu.signal import synth
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec


def brute_force_channelize(x, m, h):
    """O(N*L*M) direct evaluation of the defining equation (no fftshift)."""
    t_frames = len(x) // m
    x = x[: t_frames * m]
    n_idx = np.arange(len(x))
    out = np.zeros((t_frames, m), dtype=np.complex128)
    for k in range(m):
        d = x * np.exp(-2j * np.pi * k * n_idx / m)
        v = np.convolve(d, h)  # full; v[t] = sum_m h[m] d[t-m]
        out[:, k] = v[np.arange(t_frames) * m + m - 1]
    return out


@pytest.mark.parametrize("m,p", [(8, 12), (5, 4), (16, 12), (7, 3)])
def test_matches_brute_force(m, p):
    rng = np.random.default_rng(42)
    n = m * 50
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    ch = chlib.Channelizer.create(m, taps_per_band=p)
    h = np.zeros(m * p)
    # reconstruct prototype from the stored reversed polyphase matrix
    h = ch.taps_rev[:, ::-1].reshape(-1).astype(np.float64)
    got = np.asarray(ch(x, shift=False))
    want = brute_force_channelize(np.asarray(x, np.complex128), m, h)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fftshift_and_shape():
    m = 8
    ch = chlib.Channelizer.create(m)
    x = np.ones(m * 40, dtype=np.complex64)
    y = np.asarray(ch(x, shift=True))
    y_ns = np.asarray(ch(x, shift=False))
    assert y.shape == (40, m)
    np.testing.assert_allclose(y, np.fft.fftshift(y_ns, axes=-1), rtol=1e-6)


def test_truncates_to_multiple_of_m():
    m = 8
    ch = chlib.Channelizer.create(m)
    x = np.ones(m * 10 + 3, dtype=np.complex64)
    assert np.asarray(ch(x)).shape == (10, m)


def test_tone_lands_in_correct_channel():
    m = 16
    fs = 16e6
    ch = chlib.Channelizer.create(m)
    cf = ch.center_frequencies(fs)
    for k_off in [-7, -3, 0, 2, 5]:
        f = k_off * fs / m
        t = np.arange(m * 200) / fs
        x = np.exp(2j * np.pi * f * t).astype(np.complex64)
        y = np.asarray(ch(x, shift=True))
        steady = np.abs(y[ch.taps_per_band + 2 :])
        ch_idx = int(np.argmax(steady.mean(axis=0)))
        assert cf[ch_idx] == pytest.approx(f), f"tone {f} landed in {cf[ch_idx]}"
        # unit amplitude at channel center, ~unit DC gain prototype
        assert steady[:, ch_idx].mean() == pytest.approx(1.0, abs=0.02)


def test_adjacent_channel_rejection():
    m = 16
    fs = 16e6
    ch = chlib.Channelizer.create(m, taps_per_band=12, stopband_atten_db=80.0)
    cf = ch.center_frequencies(fs)
    k = 5  # tone at channel center
    f = cf[k]
    t = np.arange(m * 500) / fs
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    y = np.asarray(ch(x, shift=True))
    steady = np.abs(y[ch.taps_per_band + 2 :])
    sig = steady[:, k].mean()
    others = np.delete(steady, k, axis=1).max()
    # 80 dB design stopband; require >= 60 dB in float32
    assert 20 * np.log10(sig / others) > 60.0


def test_offset_tone_phase_slope():
    # Tone at channel center + df: decimated phase advances 2*pi*df/fs_dec.
    m = 8
    fs = 8e6
    df = 37e3
    ch = chlib.Channelizer.create(m)
    cf = ch.center_frequencies(fs)
    k = 6
    f = cf[k] + df
    t = np.arange(m * 400) / fs
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    y = np.asarray(ch(x, shift=True))
    fs_dec = ch.decimated_rate(fs)
    seg = y[ch.taps_per_band + 2 :, k]
    dphi = np.angle(seg[1:] * np.conj(seg[:-1]))
    est_df = np.median(dphi) * fs_dec / (2 * np.pi)
    assert est_df == pytest.approx(df, rel=1e-3)


def test_streaming_blocks_match_single_shot():
    m = 8
    ch = chlib.Channelizer.create(m)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(m * 64) + 1j * rng.standard_normal(m * 64)).astype(
        np.complex64
    )
    full = np.asarray(ch(x))
    state = ch.init_state()
    blocks = []
    for i in range(4):
        blk, state = ch.stream_block(x[i * m * 16 : (i + 1) * m * 16], state)
        blocks.append(np.asarray(blk))
    streamed = np.concatenate(blocks, axis=0)
    np.testing.assert_allclose(streamed, full, atol=1e-6)


def test_pulse_train_energy_in_right_bin():
    # End-to-end-ish: channelize a pulsed tone, energy should pulse in the
    # channel containing the tone (the create_pdws_channelized use case).
    fs = 8e6
    m = 8
    spec = PulseTrainSpec(
        sample_rate_sps=fs,
        duration_sec=2e-3,
        frequency_hz=3e6 + 40e3,
        pulse_width_sec=100e-6,
        pri_sec=400e-6,
        start_index=500,
    )
    x = synth.pulse_train(spec)
    ch = chlib.Channelizer.create(m)
    y = np.abs(np.asarray(ch(x, shift=True)))
    cf = ch.center_frequencies(fs)
    k = int(np.argmin(np.abs(cf - spec.frequency_hz)))
    # on/off contrast in the right channel
    col = y[:, k]
    assert col.max() > 0.8
    frac_on = (col > 0.5).mean()
    expected_duty = spec.pulse_width_sec / spec.pri_sec
    assert frac_on == pytest.approx(expected_duty, rel=0.3)


def test_prototype_filter_properties():
    h = filters.design_prototype_filter(16, 12, 80.0)
    assert len(h) == 192
    assert np.sum(h) == pytest.approx(1.0)
    # symmetric (linear phase)
    np.testing.assert_allclose(h, h[::-1], atol=1e-15)
    # stopband: response at >= 2x channel spacing down by >= 75 dB
    w = np.fft.rfftfreq(8192 * 4)
    H = np.abs(np.fft.rfft(h, 8192 * 4))
    stop = H[w >= 1.0 / 16]
    assert 20 * np.log10(stop.max() / H[0]) < -70.0


def test_fine_grained_560_bands():
    """The reference's fine-grained config: 0.1 MHz bins -> 560 bands at
    56 Msps (generate_channelized_training_iq.m:95-96)."""
    from sdr_channelizer_tpu.config import bands_for_bin_width

    m = bands_for_bin_width(56e6, 1e5)
    assert m == 560
    chan = chlib.Channelizer.create(m)
    assert chan.taps_rev.shape == (12, 560)
    # a tone at a bin center lands in exactly that bin
    n_frames = 64
    t = np.arange(m * n_frames)
    f0 = 37 * 1e5  # bin +37 (0.1 MHz bins)
    x = np.exp(2j * np.pi * f0 / 56e6 * t).astype(np.complex64)
    import jax.numpy as jnp
    y = np.asarray(chlib.channelize(jnp.asarray(x), chan))
    steady = np.abs(y[20:])
    assert steady.mean(axis=0).argmax() == m // 2 + 37
