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
