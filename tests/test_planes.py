"""Complex-free (planes) pipeline path: must match the complex DFT path."""

import jax.numpy as jnp
import numpy as np

from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp.channelizer import Channelizer, channelize, channelize_planes
from sdr_channelizer_tpu.models import ChannelizerPipeline
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train


def _capture():
    spec = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=4e-3,
                          frequency_hz=2.3e6, pulse_width_sec=100e-6,
                          pri_sec=500e-6, start_index=1234, noise_std=3e-3)
    return pulse_train(spec, seed=7)


def test_channelize_planes_matches_dft():
    iq = _capture()
    n = len(iq) // 8 * 8
    chan = Channelizer.create(8)
    ref = np.asarray(channelize(jnp.asarray(iq[:n]), chan, method="dft"))
    yr, yi = channelize_planes(
        jnp.asarray(np.real(iq[:n]).astype(np.float32)),
        jnp.asarray(np.imag(iq[:n]).astype(np.float32)),
        chan,
    )
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=1e-6)


def test_pipeline_planes_matches_complex():
    iq = _capture()
    n = len(iq) // 8 * 8
    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=512)
    pipe = ChannelizerPipeline.create(8, pdw_cfg=cfg)
    ref = pipe.extract(jnp.asarray(iq[:n]), fs=8e6, fc=1e9, sample_start_time=9.0)
    got = pipe.extract_planes(iq[:n], fs=8e6, fc=1e9, sample_start_time=9.0)
    assert len(got["toa"]) == len(ref["toa"])
    np.testing.assert_array_equal(got["channel"], ref["channel"])
    np.testing.assert_allclose(got["toa"], ref["toa"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["pw"], ref["pw"], rtol=1e-6)
    np.testing.assert_allclose(got["snr"], ref["snr"], rtol=0, atol=1e-3)
    np.testing.assert_allclose(got["freq"], ref["freq"], rtol=0, atol=50.0)


def test_pipeline_fused_matches_complex():
    from sdr_channelizer_tpu.io import iqpacket

    iq = _capture()
    n = len(iq) // 8 * 8
    samples = iqpacket.from_complex(iq[:n], 12)
    iq_q = iqpacket.to_complex(samples, 12)
    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=512)
    pipe = ChannelizerPipeline.create(8, pdw_cfg=cfg)
    ref = pipe.extract(jnp.asarray(iq_q), fs=8e6, fc=1e9, sample_start_time=9.0)
    got = pipe.extract_fused(samples, bit_width=12, fs=8e6, fc=1e9,
                             sample_start_time=9.0)
    assert len(got["toa"]) == len(ref["toa"])
    np.testing.assert_allclose(got["toa"], ref["toa"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["snr"], ref["snr"], rtol=0, atol=1e-2)
    np.testing.assert_allclose(got["freq"], ref["freq"], rtol=0, atol=100.0)
