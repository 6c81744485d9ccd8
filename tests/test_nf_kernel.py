"""VMEM-resident noise-floor kernel: must pick the identical order
statistics as ops.medians / np.median (create_pdws_channelized.m:73
exactness), including pad columns and even/odd counts."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.nf_kernel import pallas_noise_floor_cm


@pytest.mark.parametrize("r,t_len,t_pad", [
    (16, 5000, 5120),   # pad columns masked
    (8, 4095, 4096),    # odd count (middle order statistic)
    (8, 4096, 4096),    # even count (mean of two middles)
    (8, 300, 300),      # non-128-multiple lanes
])
def test_nf_kernel_matches_median(r, t_len, t_pad):
    rng = np.random.default_rng(r + t_len)
    mag = np.abs(rng.standard_normal((r, t_pad))).astype(np.float32)
    mag[:, t_len:] = 0.0
    got = np.asarray(pallas_noise_floor_cm(jnp.asarray(mag), t_len=t_len))
    np.testing.assert_array_equal(
        got, np.median(mag[:, :t_len], axis=1).astype(np.float32))


def test_noise_floor_cm_routes_to_kernel(monkeypatch):
    """dsp.pdw.noise_floor_cm takes the kernel on sort-free backends and
    the XLA descent otherwise — same values either way."""
    from sdr_channelizer_tpu.dsp import pdw as pdwmod

    rng = np.random.default_rng(3)
    mag = np.abs(rng.standard_normal((8, 1024))).astype(np.float32)
    xla = np.asarray(pdwmod.noise_floor_cm(jnp.asarray(mag), 7, 1024))
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    kern = np.asarray(pdwmod.noise_floor_cm(jnp.asarray(mag), 7, 1024))
    np.testing.assert_array_equal(xla, kern)
    np.testing.assert_array_equal(
        kern, np.median(mag[:7], axis=1).astype(np.float32))
