"""Event prediction tests (``predict_event.m`` / ``usrp_predict_event.cpp``
semantics: quadratic SNR-vs-TOA peak, median-PRI next-event)."""

import numpy as np
import pytest

from sdr_channelizer_tpu.config import EventConfig
from sdr_channelizer_tpu.dsp import events as evlib


def test_quadratic_peak_exact():
    # snr = -(t - 3.7)^2 + 20 peaks at t = 3.7
    t = np.linspace(0, 10, 50)
    v = -((t - 3.7) ** 2) + 20
    assert evlib.quadratic_peak_time(t, v) == pytest.approx(3.7, abs=1e-9)


def test_quadratic_peak_with_noise_and_offset():
    rng = np.random.default_rng(0)
    t = 1.7e9 + np.linspace(0, 5, 40)  # epoch-scale offsets must not break it
    v = -0.8 * (t - (1.7e9 + 2.25)) ** 2 + 30 + rng.normal(0, 0.05, t.size)
    assert evlib.quadratic_peak_time(t, v) == pytest.approx(1.7e9 + 2.25, abs=0.05)


def test_quadratic_peak_requires_3_points():
    with pytest.raises(ValueError):
        evlib.quadratic_peak_time([1.0, 2.0], [1.0, 2.0])


def test_masked_jit_fit_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    t = np.linspace(0, 4, 32).astype(np.float32)
    v = (-2.0 * (t - 1.3) ** 2 + 25 + rng.normal(0, 0.01, t.size)).astype(np.float32)
    valid = np.ones(32, bool)
    valid[20:] = False  # only first 20 points are real
    got = float(
        evlib.quadratic_peak_time_masked(jnp.asarray(t), jnp.asarray(v), jnp.asarray(valid))
    )
    want = evlib.quadratic_peak_time(t[:20], v[:20])
    assert got == pytest.approx(want, abs=1e-3)


def test_masked_fit_too_few_points_nan():
    import jax.numpy as jnp

    t = jnp.arange(8, dtype=jnp.float32)
    v = jnp.ones(8, jnp.float32)
    valid = jnp.array([True, True, False, False, False, False, False, False])
    assert np.isnan(float(evlib.quadratic_peak_time_masked(t, v, valid)))


def test_next_event_median_pri():
    ev = [0.0, 1.0, 2.1, 3.0, 4.05]
    # diffs: 1.0, 1.1, 0.9, 1.05 -> median 1.025
    assert evlib.next_event_time(ev) == pytest.approx(4.05 + 1.025)


def test_next_event_bootstrap():
    cfg = EventConfig()
    assert evlib.next_event_time([7.0], cfg) == pytest.approx(
        7.0 + 4.61962892466417
    )


def test_predictor_full_loop():
    # Simulate a periodic emitter scanning past: per capture the PDW SNRs
    # trace a parabola whose peak advances by the true period.
    period = 4.2
    cfg = EventConfig()
    pred = evlib.EventPredictor(cfg)
    rng = np.random.default_rng(1)
    preds = []
    for k in range(5):
        peak = 10.0 + k * period
        t = peak + np.linspace(-1, 1, 30)
        v = -5 * (t - peak) ** 2 + 25 + rng.normal(0, 0.02, 30)
        nxt = pred.update(t, v, max_abs_iq=0.95)
        preds.append(nxt)
    assert preds[0] == pytest.approx(10.0 + cfg.bootstrap_period_sec, abs=0.05)
    assert preds[-1] == pytest.approx(10.0 + 5 * period, abs=0.05)
    assert len(pred.events) == 5


def test_predictor_amplitude_gate():
    pred = evlib.EventPredictor()
    t = np.linspace(0, 2, 20)
    v = -(t - 1) ** 2
    assert pred.update(t, v, max_abs_iq=0.5) is None  # gated: max|iq| <= 0.9
    assert pred.events == []
