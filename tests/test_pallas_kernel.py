"""Fused Pallas channelizer kernel parity tests (interpreter mode on CPU;
the real-hardware comparison runs in bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdr_channelizer_tpu.dsp.channelizer import Channelizer, channelize
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import pallas_channelize


@pytest.mark.parametrize("m,n_frames,block", [(8, 256, 64), (64, 300, 128)])
def test_pallas_matches_dft_path(m, n_frames, block):
    rng = np.random.default_rng(m)
    n = m * n_frames
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    chan = Channelizer.create(m)
    ref = np.asarray(channelize(jnp.asarray(x), chan, method="dft"))
    got = np.asarray(
        pallas_channelize(jnp.asarray(x), chan.taps_rev, block_frames=block,
                          interpret=True)
    )
    assert got.shape == ref.shape == (n_frames, m)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_unshifted():
    m, n_frames = 8, 128
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(m * n_frames)
         + 1j * rng.standard_normal(m * n_frames)).astype(np.complex64)
    chan = Channelizer.create(m)
    ref = np.asarray(channelize(jnp.asarray(x), chan, shift=False, method="dft"))
    got = np.asarray(
        pallas_channelize(jnp.asarray(x), chan.taps_rev, shift=False,
                          block_frames=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_dft_path_matches_fft_path():
    """The DFT-matmul extraction (TPU default) equals the FFT oracle."""
    m, n_frames = 16, 512
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(m * n_frames)
         + 1j * rng.standard_normal(m * n_frames)).astype(np.complex64)
    chan = Channelizer.create(m)
    a = np.asarray(channelize(jnp.asarray(x), chan, method="fft"))
    b = np.asarray(channelize(jnp.asarray(x), chan, method="dft"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_streams_kernel_matches_prep(tmp_path):
    """Fused streams kernel == channelize(dft) + _prep_streams, and the full
    PDW chain over it recovers ground truth."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod
    from sdr_channelizer_tpu.io import iqpacket
    from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
        pallas_channelize_streams,
    )
    from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

    spec = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=2e-3,
                          frequency_hz=2.3e6, pulse_width_sec=100e-6,
                          pri_sec=500e-6, start_index=333, noise_std=3e-3)
    iq = pulse_train(spec, seed=1)
    samples = iqpacket.from_complex(iq, 12)  # int16 Q11 payload
    n = len(iq) // 8 * 8
    chan = Channelizer.create(8)

    xr = np.ascontiguousarray(samples[:n, 0])
    xi = np.ascontiguousarray(samples[:n, 1])
    mag, ph, sat = pallas_channelize_streams(
        jnp.asarray(xr), jnp.asarray(xi), chan.taps_rev, bit_width=12,
        block_frames=256, interpret=True,
    )

    iq_norm = iqpacket.to_complex(samples[:n], 12)
    y = channelize(jnp.asarray(iq_norm), chan, method="dft")
    mag_ref, ph_ref, sat_ref = pdwmod._prep_streams(y, 0.9999)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(mag_ref),
                               rtol=1e-5, atol=1e-6)
    # phase: compare via wrapped difference (atan2 conventions at +/-180)
    dph = np.abs(np.asarray(ph) - np.asarray(ph_ref))
    dph = np.minimum(dph, 360 - dph)
    big = np.asarray(mag_ref) > 1e-3  # phase of near-zero samples is noise
    assert dph[big].max() < 1e-2
    np.testing.assert_array_equal(np.asarray(sat) > 0.5, np.asarray(sat_ref))

    # end-to-end: PDWs from the fused streams match the reference chain
    cfg = PdwConfig.channelized(max_pulses=16, max_pulse_samples=256)
    batch = pdwmod.extract_pdws_channelized_streams(
        mag, ph, jnp.asarray(sat) > 0.5, cfg
    )
    batch_ref = pdwmod.extract_pdws_channelized(y, cfg)
    assert int(np.asarray(batch.count).sum()) == int(np.asarray(batch_ref.count).sum())
    np.testing.assert_array_equal(np.asarray(batch.toa_idx), np.asarray(batch_ref.toa_idx))


@pytest.mark.parametrize("bit_width", [12, 16, 8])
def test_packed_ingest_matches_planes(bit_width):
    """Packed payload ingest (int32 plane for int16 recordings, int16 plane
    for int8 recordings) is bit-identical to the f32-planes dequant path —
    the in-kernel sign-extension/unpack must reproduce the host split
    exactly (``blade_record_iq_12bit.cpp`` / ``blade_record_iq_08bit.cpp``
    wire formats)."""
    from sdr_channelizer_tpu.io import iqpacket
    from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
        pallas_channelize_streams, pallas_channelize_streams_packed,
    )
    from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

    m = 8
    spec = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=1e-3,
                          frequency_hz=1.7e6, pulse_width_sec=60e-6,
                          pri_sec=300e-6, start_index=101, noise_std=5e-3)
    iq = pulse_train(spec, seed=7)
    samples = iqpacket.from_complex(iq, bit_width)  # (N, 2) int16 or int8
    n = len(iq) // m * m
    samples = np.ascontiguousarray(samples[:n])
    chan = Channelizer.create(m)

    xr = np.ascontiguousarray(samples[:, 0])
    xi = np.ascontiguousarray(samples[:, 1])
    mag_p, ph_p, sat_p = pallas_channelize_streams(
        jnp.asarray(xr), jnp.asarray(xi), chan.taps_rev, bit_width=bit_width,
        block_frames=256, interpret=True,
    )

    # Byte-for-byte the on-disk payload, viewed as one packed lane/sample.
    packed_dt = np.int16 if samples.dtype == np.int8 else np.int32
    xq = samples.view(packed_dt).ravel()
    assert xq.nbytes == samples.nbytes
    mag_q, ph_q, sat_q = pallas_channelize_streams_packed(
        jnp.asarray(xq), chan.taps_rev, bit_width=bit_width,
        block_frames=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(mag_q), np.asarray(mag_p))
    np.testing.assert_array_equal(np.asarray(ph_q), np.asarray(ph_p))
    np.testing.assert_array_equal(np.asarray(sat_q), np.asarray(sat_p))
