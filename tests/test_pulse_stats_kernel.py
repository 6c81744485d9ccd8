"""Pulse-stats kernel parity: must match the XLA masked-median path exactly
(same order statistics) on randomized pulse extents."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdr_channelizer_tpu.ops.medians import masked_median
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import pulse_stats


def test_pulse_stats_batched_matches_per_tile():
    """The batched-descent kernel (batch_tiles > 1, rejected as the r5
    default on speed but kept as a knob) must stay bit-identical to the
    per-tile form — group arithmetic is shared, only the loop structure
    differs."""
    rng = np.random.default_rng(5)
    m, t_len, p_slots, window = 4, 4096, 256, 256
    mag = np.abs(rng.standard_normal((m, t_len))).astype(np.float32)
    dph = rng.standard_normal((m, t_len)).astype(np.float32)
    sat = (rng.random((m, t_len)) < 0.01).astype(np.float32)
    toa = np.full((m, p_slots), t_len, np.int32)
    te = np.full((m, p_slots), t_len, np.int32)
    for c in range(m):
        starts = np.sort(rng.choice(t_len - 600, 150, replace=False))
        lens = rng.integers(1, 500, 150)
        toa[c, :150] = starts
        te[c, :150] = np.minimum(starts + lens, t_len - 1)
    args = (jnp.asarray(mag), jnp.asarray(dph), jnp.asarray(sat),
            jnp.asarray(toa), jnp.asarray(te))
    a = pulse_stats(*args, window=window, interpret=True, batch_tiles=1)
    b = pulse_stats(*args, window=window, interpret=True, batch_tiles=8)
    for x, y, nm in zip(a, b, ("mag", "dph", "sat")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=nm)


@pytest.mark.parametrize("seed", [0, 1])
def test_pulse_stats_matches_masked_median(seed):
    rng = np.random.default_rng(seed)
    m, t_len, p_slots, window = 4, 4096, 128, 256
    mag = np.abs(rng.standard_normal((m, t_len))).astype(np.float32)
    dph = rng.standard_normal((m, t_len)).astype(np.float32)
    sat = (rng.random((m, t_len)) < 0.01).astype(np.float32)

    toa = np.full((m, p_slots), t_len, np.int32)
    te = np.full((m, p_slots), t_len, np.int32)
    n_pulses = 40
    for c in range(m):
        starts = np.sort(rng.choice(t_len - 600, n_pulses, replace=False))
        lens = rng.integers(1, 500, n_pulses)  # some longer than window
        toa[c, :n_pulses] = starts
        te[c, :n_pulses] = np.minimum(starts + lens, t_len - 1)

    got_mag, got_dph, got_sat = pulse_stats(
        jnp.asarray(mag), jnp.asarray(dph), jnp.asarray(sat),
        jnp.asarray(toa), jnp.asarray(te), window=window, interpret=True,
    )
    got_mag, got_dph, got_sat = map(np.asarray, (got_mag, got_dph, got_sat))

    pos = np.arange(window)
    for c in range(m):
        for s in range(n_pulses):
            i0, i1 = toa[c, s], te[c, s]
            plen = min(i1 - i0 + 1, window)
            w_mag = mag[c, i0 : i0 + window]
            w_mag = np.pad(w_mag, (0, window - len(w_mag)), constant_values=np.inf)
            m_mask = pos < plen
            ref = np.asarray(masked_median(jnp.asarray(w_mag), jnp.asarray(m_mask),
                                           method="sort"))
            np.testing.assert_array_equal(got_mag[c, s], ref, err_msg=f"{c},{s}")

            w_dph = dph[c, i0 : i0 + window]
            w_dph = np.pad(w_dph, (0, window - len(w_dph)))
            d_mask = pos < plen - 1
            refd = np.asarray(masked_median(jnp.asarray(w_dph), jnp.asarray(d_mask),
                                            method="sort"))
            if plen - 1 > 0:
                np.testing.assert_array_equal(got_dph[c, s], refd)
            else:
                assert np.isnan(got_dph[c, s])

            s_mask = (pos >= 1) & (pos < plen - 1)
            w_sat = sat[c, i0 : i0 + window]
            w_sat = np.pad(w_sat, (0, window - len(w_sat)))
            assert (got_sat[c, s] > 0.5) == bool(np.any(w_sat[s_mask] > 0.5))

    # invalid slots -> NaN medians, zero saturation
    assert np.all(np.isnan(got_mag[:, n_pulses:]))
    assert np.all(got_sat[:, n_pulses:] == 0.0)


def test_channelized_extraction_pallas_stats_parity():
    """Full channelized extraction with the Pallas stats path == XLA path."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod
    from sdr_channelizer_tpu.dsp.channelizer import Channelizer, channelize
    from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

    specs = [
        PulseTrainSpec(sample_rate_sps=8e6, duration_sec=4e-3, frequency_hz=2.3e6,
                       pulse_width_sec=100e-6, pri_sec=500e-6, start_index=1234,
                       noise_std=3e-3),
        PulseTrainSpec(sample_rate_sps=8e6, duration_sec=4e-3, frequency_hz=-1.1e6,
                       pulse_width_sec=700e-6, pri_sec=1500e-6, start_index=100),
    ]
    iq = (pulse_train(specs[0], seed=7) + pulse_train(specs[1], seed=8)).astype(np.complex64)
    n = len(iq) // 8 * 8
    y = channelize(jnp.asarray(iq[:n]), Channelizer.create(8), method="dft")
    mag, ph, sat = pdwmod._prep_streams(y, 0.9999)

    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=512)
    ref = pdwmod.extract_pdws_channelized_streams(mag, ph, sat, cfg, stats="xla")
    got = pdwmod.extract_pdws_channelized_streams(mag, ph, sat, cfg, stats="pallas")

    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.toa_idx), np.asarray(ref.toa_idx))
    np.testing.assert_array_equal(np.asarray(got.te_idx), np.asarray(ref.te_idx))
    np.testing.assert_array_equal(np.asarray(got.saturated), np.asarray(ref.saturated))
    np.testing.assert_array_equal(np.asarray(got.mag), np.asarray(ref.mag))
    # /360 may compile as *-by-reciprocal in one program and true divide in
    # the other -> 1 ULP; the selected order statistics are identical.
    np.testing.assert_allclose(np.asarray(got.freq_offset_hz),
                               np.asarray(ref.freq_offset_hz), rtol=3e-7)
    np.testing.assert_allclose(np.asarray(got.snr_db), np.asarray(ref.snr_db),
                               rtol=0, atol=2e-5)


def test_tiny_pulse_tier_parity():
    """1-2 sample pulses route through the gather tier (no kernel slots)
    and must match the XLA path bit-for-bit — the saturating-capture case
    (noise transients at every band's slot cap) that motivated it."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod

    rng = np.random.default_rng(5)
    t_len, m = 8192, 4
    mag = np.abs(rng.standard_normal((t_len, m))).astype(np.float32) * 1e-3
    # plen 1, 2, and 3 pulses interleaved per channel.
    for c in range(m):
        for k, s in enumerate(range(200 + 37 * c, t_len - 600, 512)):
            mag[s : s + 1 + (k % 3), c] = 1.0 + 0.1 * rng.random()
    iq = (mag * np.exp(1j * 0.3)).astype(np.complex64)  # (T, M) streams
    phase = np.full((t_len, m), np.degrees(0.3), np.float32)
    sat = np.zeros((t_len, m), bool)
    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=512)

    ref = pdwmod.extract_pdws_channelized_streams(
        jnp.asarray(mag), jnp.asarray(phase), jnp.asarray(sat), cfg,
        stats="xla")
    got = pdwmod.extract_pdws_channelized_streams(
        jnp.asarray(mag), jnp.asarray(phase), jnp.asarray(sat), cfg,
        stats="pallas")
    assert int(np.asarray(ref.count).sum()) > 40
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_array_equal(np.asarray(got.toa_idx),
                                  np.asarray(ref.toa_idx))
    np.testing.assert_array_equal(np.asarray(got.te_idx), np.asarray(ref.te_idx))
    np.testing.assert_array_equal(np.asarray(got.mag), np.asarray(ref.mag))
    np.testing.assert_array_equal(np.asarray(got.saturated),
                                  np.asarray(ref.saturated))
    got_f = np.asarray(got.freq_offset_hz)
    ref_f = np.asarray(ref.freq_offset_hz)
    np.testing.assert_allclose(got_f, ref_f, rtol=3e-7)


def test_wideband_extraction_pallas_stats_parity():
    """Wideband (M=1) extraction through the Pallas stats path == XLA."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod

    rng = np.random.default_rng(3)
    n = 32768
    t = np.arange(n)
    iq = (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    tone = np.exp(2j * np.pi * 0.083 * t).astype(np.complex64)
    for s in range(500, n - 900, 2500):
        iq[s:s + 700] = tone[s:s + 700]
    cfg = PdwConfig.wideband(max_pulses=64, max_pulse_samples=1024)
    ref = pdwmod.extract_pdws(jnp.asarray(iq), cfg, stats="xla")
    got = pdwmod.extract_pdws(jnp.asarray(iq), cfg, stats="pallas")
    assert int(np.asarray(got.count)) == int(np.asarray(ref.count)) > 10
    np.testing.assert_array_equal(np.asarray(got.toa_idx), np.asarray(ref.toa_idx))
    np.testing.assert_array_equal(np.asarray(got.te_idx), np.asarray(ref.te_idx))
    np.testing.assert_array_equal(np.asarray(got.mag), np.asarray(ref.mag))
    np.testing.assert_array_equal(np.asarray(got.saturated), np.asarray(ref.saturated))
    np.testing.assert_allclose(np.asarray(got.freq_offset_hz),
                               np.asarray(ref.freq_offset_hz), rtol=3e-7)
    np.testing.assert_allclose(np.asarray(got.snr_db), np.asarray(ref.snr_db),
                               rtol=0, atol=2e-5)


def test_stats_kernel_feasibility_fallback():
    """Captures outside the kernel's static bounds must not crash the
    public API: short captures fall back to the XLA formulation on the
    auto path, and pulse_stats itself raises a descriptive ValueError
    (ADVICE r1: bare assert at trace time on TPU)."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod
    from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
        pulse_stats, stats_kernel_feasible,
    )

    # 300 samples with the CLI default 4096-sample window: too short.
    assert not stats_kernel_feasible(300, 4096)
    assert stats_kernel_feasible(65536, 4096)
    assert not stats_kernel_feasible(1 << 24, 4096)

    rng = np.random.default_rng(0)
    iq = (1e-3 * (rng.standard_normal(300) + 1j * rng.standard_normal(300))
          ).astype(np.complex64)
    iq[100:140] = 1.0
    cfg = PdwConfig.wideband(max_pulses=64, max_pulse_samples=4096)
    ref = pdwmod.extract_pdws(jnp.asarray(iq), cfg, stats="xla")
    got = pdwmod.extract_pdws(jnp.asarray(iq), cfg, stats="auto")
    np.testing.assert_array_equal(np.asarray(got.toa_idx), np.asarray(ref.toa_idx))

    with pytest.raises(ValueError, match="pulse_stats cannot run"):
        pulse_stats(
            jnp.zeros((1, 300), jnp.float32), jnp.zeros((1, 300), jnp.float32),
            jnp.zeros((1, 300), jnp.float32),
            jnp.zeros((1, 128), jnp.int32), jnp.zeros((1, 128), jnp.int32),
            window=4096,
        )

    # Round-5 routing bound (real-chip recalibration at the 100 MB scoped
    # limit): windows up to 3072 take the kernel path, 4096 still routes
    # to the XLA fallback with the loud warning.
    assert pdwmod._stats_window_rows_ok(
        PdwConfig.channelized(max_pulse_samples=3072))
    wide = PdwConfig.channelized(max_pulse_samples=4096)
    assert not pdwmod._stats_window_rows_ok(wide)
    import warnings as _warnings
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        pdwmod._warn_stats_fallback(wide, "test")
    assert any("3072 samples" in str(w.message) for w in rec)


def test_wideband_blocked_matches_single_shot():
    """Blockwise wideband extraction (latch carried across blocks, Pallas
    stats per block) matches the single-shot XLA extractor bit-for-bit —
    VERDICT r1 item 5 (create_pdws.m at generate_training_iq.m:12 rates).

    Exercises ``_extract_wideband_blocked`` directly with a small
    ``block_len`` so the same boundary-straddling coverage runs at ~1/8 the
    >2^24-sample capture the production route handles (the route itself is
    asserted separately below without paying for a 16.7M-sample extract)."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod
    from sdr_channelizer_tpu.ops import medians

    rng = np.random.default_rng(11)
    blk = 1 << 16
    n = 2 * blk + 30_000
    iq = (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    tone = np.exp(2j * np.pi * 0.137 * np.arange(400)).astype(np.complex64)
    # Pulses straddling both block boundaries, plus a sparse train
    # (train starts that would merge with a boundary pulse are dropped).
    starts = [500, blk - 200, 2 * blk - 137, n - 20_000]
    starts += [s for s in range(30_000, n - 500, 23_009)
               if all(abs(s - b) > 500 for b in starts)]
    for s in starts:
        iq[s:s + 400] = tone
    cfg = PdwConfig.wideband(max_pulses=128, max_pulse_samples=512)

    ref = pdwmod.extract_pdws(jnp.asarray(iq), cfg, stats="xla")
    mag, phase_deg, sat = pdwmod._prep_streams(jnp.asarray(iq),
                                               cfg.saturation_level)
    got = pdwmod._extract_wideband_blocked(
        mag, phase_deg, sat, cfg, medians.median(mag), block_len=blk)
    assert int(np.asarray(got.count)) == int(np.asarray(ref.count)) == len(set(starts))
    np.testing.assert_array_equal(np.asarray(got.toa_idx), np.asarray(ref.toa_idx))
    np.testing.assert_array_equal(np.asarray(got.te_idx), np.asarray(ref.te_idx))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.mag), np.asarray(ref.mag))
    np.testing.assert_array_equal(np.asarray(got.saturated), np.asarray(ref.saturated))
    np.testing.assert_allclose(np.asarray(got.freq_offset_hz),
                               np.asarray(ref.freq_offset_hz), rtol=3e-7)
    np.testing.assert_allclose(np.asarray(got.snr_db), np.asarray(ref.snr_db),
                               rtol=0, atol=2e-5)


def test_wideband_big_capture_routes_blockwise(monkeypatch):
    """A >2^24-sample capture on the pallas-stats path routes through
    ``_extract_wideband_blocked`` automatically (no trace-time assert)."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod

    sentinel = object()
    calls = {}

    def fake_blocked(mag, phase_deg, sat, cfg, noise_floor, block_len=1 << 23):
        calls["t_len"] = int(mag.shape[0])
        calls["block_len"] = block_len
        return sentinel

    from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import (
        stats_kernel_feasible,
    )

    monkeypatch.setattr(pdwmod, "_extract_wideband_blocked", fake_blocked)
    n = (1 << 24) + 7
    iq = jnp.zeros((n,), jnp.complex64)
    cfg = PdwConfig.wideband(max_pulses=128, max_pulse_samples=512)
    out = pdwmod.extract_pdws(iq, cfg, stats="pallas")
    assert out is sentinel
    assert calls["t_len"] == n
    assert stats_kernel_feasible(calls["block_len"], cfg.max_pulse_samples)


def test_double_buffer_mode_parity():
    """The double-buffered window-DMA mode computes identical medians
    (kept as an off-by-default experiment: it measured +0.19 ms dense /
    neutral sparse end-to-end on v5e — the per-tile cost is the serial
    radix descent, not the DMA; PROBE_r04 part J)."""
    import jax.numpy as jnp

    from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import pulse_stats

    rng = np.random.default_rng(4)
    m, t = 8, 2048
    mag = np.abs(rng.standard_normal((m, t))).astype(np.float32)
    dph = rng.standard_normal((m, t)).astype(np.float32)
    toa = np.full((m, 16), t, np.int32)
    te = np.full((m, 16), t, np.int32)
    for c in range(m):
        for k in range(5):
            s0 = 37 + 200 * k + 11 * c
            toa[c, k] = s0
            te[c, k] = s0 + 3 + 17 * (k % 4)
    a = pulse_stats(jnp.asarray(mag), jnp.asarray(dph), None,
                    jnp.asarray(toa), jnp.asarray(te), window=128, t_len=t)
    b = pulse_stats(jnp.asarray(mag), jnp.asarray(dph), None,
                    jnp.asarray(toa), jnp.asarray(te), window=128, t_len=t,
                    double_buffer=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
