"""Event-mode wideband extraction tests: the mean-amplitude real-time
semantics of ``usrp_predict_event.cpp:300-343``, checked pulse-for-pulse
against a line-for-line sequential oracle of the C++ loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod


def cpp_tracker_oracle(iq, snr_db=20.0, sat_level=0.9999, noise_floor=None):
    """Sequential twin of usrp_predict_event.cpp:286-343 (f64 accumulation
    like the C++ ``double amp``)."""
    mag = np.abs(iq).astype(np.float32)
    nf = np.float32(np.mean(mag)) if noise_floor is None else np.float32(noise_floor)
    thresh = nf * np.float32(10.0 ** (snr_db / 10.0))
    active = False
    toa = 0
    amp = 0.0
    sat_flag = False
    out = []
    for jj in range(len(mag)):
        if not active:
            if mag[jj] >= thresh:
                active = True
                toa = jj
                sat_flag = False
                amp = float(mag[jj])
        else:
            if mag[jj] <= thresh:
                active = False
                out.append((toa, jj, amp / (jj - toa),
                            10.0 * np.log10((amp / (jj - toa)) / nf),
                            sat_flag))
            else:
                amp += float(mag[jj])
                if (abs(iq[jj].real) >= sat_level
                        or abs(iq[jj].imag) >= sat_level):
                    sat_flag = True
    return nf, out


def make_capture(n=2000000, seed=0, fs=1e6):
    rng = np.random.default_rng(seed)
    iq = (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    t = np.arange(n)
    tone = (0.9 * np.exp(2j * np.pi * 0.13e6 / fs * t)).astype(np.complex64)
    # Pulses of assorted widths, incl. one longer than any kernel window
    # (the event path has no window bound) and one open at capture end.
    for s, w in [(1000, 50), (5000, 7), (9000, 1), (20000, 9000),
                  (40000, 512), (60000, 513), (n - 100, 500)]:
        iq[s:s + w] = tone[s:s + w]
    return iq


@pytest.mark.parametrize("seed", [0, 1])
def test_event_core_matches_cpp_oracle(seed):
    iq = make_capture(seed=seed)
    cfg = PdwConfig.event(max_pulses=64)
    nf, want = cpp_tracker_oracle(iq, snr_db=cfg.snr_threshold_db)
    batch = pdwmod.extract_pdws_event(jnp.asarray(iq), cfg)
    count = int(batch.count)
    assert count == len(want)
    toa = np.asarray(batch.toa_idx)[:count]
    te = np.asarray(batch.te_idx)[:count]
    amp = np.asarray(batch.mag)[:count]
    snr = np.asarray(batch.snr_db)[:count]
    sat = np.asarray(batch.saturated)[:count]
    np.testing.assert_array_equal(toa, [w[0] for w in want])
    np.testing.assert_array_equal(te, [w[1] for w in want])
    # f32 prefix-sum accumulation vs the C++ double accumulator
    np.testing.assert_allclose(amp, [w[2] for w in want], rtol=2e-5)
    np.testing.assert_allclose(snr, [w[3] for w in want], rtol=1e-4, atol=2e-4)
    np.testing.assert_array_equal(sat, [w[4] for w in want])
    # the pulse open at capture end was not emitted
    assert toa.max() < len(iq) - 200


def test_event_planes_matches_complex():
    iq = make_capture(seed=2)
    cfg = PdwConfig.event(max_pulses=32)
    a = pdwmod.extract_pdws_event(jnp.asarray(iq), cfg)
    assert int(a.count) > 0
    b = pdwmod.extract_pdws_event_planes(
        jnp.asarray(np.ascontiguousarray(iq.real)),
        jnp.asarray(np.ascontiguousarray(iq.imag)), cfg)
    for name in ("toa_idx", "te_idx", "count", "valid", "saturated"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name))
    for name in ("mag", "snr_db"):
        np.testing.assert_allclose(getattr(a, name), getattr(b, name),
                                   rtol=1e-6)


def test_event_core_saturation_interior_only():
    """Saturation at the leading or trailing edge sample must NOT flag the
    pulse (the C++ check runs only in the still-active branch)."""
    fs = 1e6
    n = 4096
    iq = np.full(n, 1e-3 + 0j, np.complex64)
    # pulse at [100, 110): saturated sample exactly at the leading edge
    iq[100:110] = 0.5
    iq[100] = 0.99995
    # pulse at [200, 210): saturated strictly inside
    iq[200:210] = 0.5
    iq[205] = 0.99995
    cfg = PdwConfig.event(max_pulses=8)
    batch = pdwmod.extract_pdws_event(jnp.asarray(iq), cfg)
    assert int(batch.count) == 2
    sat = np.asarray(batch.saturated)[:2]
    assert not sat[0] and sat[1]


def test_event_core_overflow_clamps_to_capacity():
    iq = make_capture(seed=3)
    cfg = PdwConfig.event(max_pulses=2)
    batch = pdwmod.extract_pdws_event(jnp.asarray(iq), cfg)
    assert int(batch.count) == 2
    assert int(np.sum(np.asarray(batch.valid))) == 2
