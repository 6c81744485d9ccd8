"""Latch-kernel parity: the single-pass Pallas hysteresis scan must produce
exactly ``cumsum(lead_edge)`` / ``cumsum(trail_edge)`` of the XLA
associative-scan formulation (``dsp/pdw.py:hysteresis_fns``), including
carried entry states, and the full sort-free extraction path built on it
must match the XLA path bit-for-bit."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdr_channelizer_tpu.dsp.pdw import hysteresis_fns
from sdr_channelizer_tpu.ops.pallas.latch_kernel import pallas_latch_cumsums


def _xla_cumsums(mag, lead, trail, entry):
    ge_lead = jnp.asarray(mag) >= jnp.asarray(lead)[None, :]
    le_trail = jnp.asarray(mag) <= jnp.asarray(trail)[None, :]
    a, b = hysteresis_fns(ge_lead, le_trail, axis=0)
    ent = jnp.asarray(entry)
    state = jnp.where(ent[None, :], b, a)
    prev = jnp.concatenate([ent[None, :], state[:-1]])
    lead_edge = state & ~prev
    trail_edge = ~state & prev
    return (np.asarray(jnp.cumsum(lead_edge.astype(jnp.int32), axis=0)),
            np.asarray(jnp.cumsum(trail_edge.astype(jnp.int32), axis=0)))


@pytest.mark.parametrize("seed,t_len,m", [(0, 4096, 8), (1, 5000, 8),
                                          (2, 2048, 16),
                                          # 2m > 128: unpacked two-ladder path
                                          (3, 2048, 96)])
def test_latch_cumsums_match_xla(seed, t_len, m):
    rng = np.random.default_rng(seed)
    mag = np.abs(rng.standard_normal((t_len, m))).astype(np.float32)
    # Thresholds inside the magnitude distribution so the latch toggles a
    # lot, with lead > trail (the hysteresis band).
    lead = rng.uniform(1.0, 1.6, m).astype(np.float32)
    trail = rng.uniform(0.3, 0.9, m).astype(np.float32)
    entry = rng.random(m) < 0.5

    cl, ct = pallas_latch_cumsums(
        jnp.asarray(mag), jnp.asarray(lead), jnp.asarray(trail),
        jnp.asarray(entry), t_blk=1024, interpret=True,
    )
    # Channel-major (128-lane-padded, block-padded) outputs: the real rows /
    # columns must match the XLA cumsums; pad channels count nothing.
    ref_cl, ref_ct = _xla_cumsums(mag, lead, trail, entry)
    np.testing.assert_array_equal(
        np.asarray(cl)[:m, :t_len].astype(np.int64).T, ref_cl)
    np.testing.assert_array_equal(
        np.asarray(ct)[:m, :t_len].astype(np.int64).T, ref_ct)
    assert not np.asarray(cl)[m:].any()


def test_latch_cumsums_default_entry_and_padding():
    """No entry arg == all-inactive, and non-multiple-of-block lengths pad
    with -inf (latch resets in the pad; visible rows unaffected)."""
    rng = np.random.default_rng(7)
    t_len, m = 3000, 8  # not a multiple of t_blk
    mag = np.abs(rng.standard_normal((t_len, m))).astype(np.float32)
    lead = np.full(m, 1.4, np.float32)
    trail = np.full(m, 0.6, np.float32)
    cl, ct = pallas_latch_cumsums(
        jnp.asarray(mag), jnp.asarray(lead), jnp.asarray(trail),
        t_blk=2048, interpret=True,
    )
    ref_cl, ref_ct = _xla_cumsums(mag, lead, trail, np.zeros(m, bool))
    np.testing.assert_array_equal(
        np.asarray(cl)[:m, :t_len].astype(np.int64).T, ref_cl)
    np.testing.assert_array_equal(
        np.asarray(ct)[:m, :t_len].astype(np.int64).T, ref_ct)
    assert cl.shape[0] == 128 and cl.shape[1] % 2048 == 0
    # Pad-tail contract (rank_find relies on it): no lead edges in the pad,
    # and any pulse open at t_len closes with ONE trailing edge at t_len.
    cl_np, ct_np = np.asarray(cl), np.asarray(ct)
    np.testing.assert_array_equal(
        cl_np[:m, t_len:],
        np.broadcast_to(cl_np[:m, t_len - 1:t_len], cl_np[:m, t_len:].shape))
    open_at_end = ref_cl[-1] - ref_ct[-1]
    np.testing.assert_array_equal(
        ct_np[:m, t_len], ct_np[:m, t_len - 1] + open_at_end)


def test_sort_free_extraction_parity(monkeypatch):
    """Force the TPU sort-free gate on (latch kernel + searchsorted on f32
    cumsums + radix-select medians) and compare the full channelized
    extraction against the default CPU path — must agree exactly."""
    from sdr_channelizer_tpu.config import PdwConfig
    from sdr_channelizer_tpu.dsp import pdw as pdwmod
    from sdr_channelizer_tpu.dsp.channelizer import Channelizer, channelize
    from sdr_channelizer_tpu.ops import medians
    from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

    specs = [
        PulseTrainSpec(sample_rate_sps=8e6, duration_sec=2e-3,
                       frequency_hz=2.3e6, pulse_width_sec=100e-6,
                       pri_sec=500e-6, start_index=1234, noise_std=3e-3),
        PulseTrainSpec(sample_rate_sps=8e6, duration_sec=2e-3,
                       frequency_hz=-1.1e6, pulse_width_sec=700e-6,
                       pri_sec=1500e-6, start_index=100),
    ]
    iq = (pulse_train(specs[0], seed=7)
          + pulse_train(specs[1], seed=8)).astype(np.complex64)
    n = len(iq) // 8 * 8
    y = channelize(jnp.asarray(iq[:n]), Channelizer.create(8), method="dft")
    mag, ph, sat = pdwmod._prep_streams(y, 0.9999)
    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=512)

    ref = pdwmod.extract_pdws_channelized_streams(mag, ph, sat, cfg,
                                                  stats="pallas")
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    got = pdwmod.extract_pdws_channelized_streams(mag, ph, sat, cfg,
                                                  stats="pallas")

    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.toa_idx),
                                  np.asarray(ref.toa_idx))
    np.testing.assert_array_equal(np.asarray(got.te_idx),
                                  np.asarray(ref.te_idx))
    np.testing.assert_array_equal(np.asarray(got.mag), np.asarray(ref.mag))
    np.testing.assert_array_equal(np.asarray(got.saturated),
                                  np.asarray(ref.saturated))
    np.testing.assert_allclose(np.asarray(got.freq_offset_hz),
                               np.asarray(ref.freq_offset_hz), rtol=3e-7)
    np.testing.assert_allclose(np.asarray(got.snr_db),
                               np.asarray(ref.snr_db), rtol=0, atol=2e-5)


class TestLatchCm:
    """Channel-major latch kernel (pallas_latch_cumsums_cm): same cumsums
    as the XLA associative-scan oracle, zero MXU flips; ONE (2R, T) output
    (rows [0, R) lead, [R, 2R) trail) for any channel count."""

    def _oracle(self, mag_tm, lead, trail):
        import jax.numpy as jnp
        from sdr_channelizer_tpu.dsp.pdw import hysteresis_fns

        ge = mag_tm >= lead[None, :]
        le = mag_tm <= trail[None, :]
        a, _ = hysteresis_fns(ge, le, axis=0)
        state = a
        prev = jnp.concatenate([jnp.zeros_like(state[:1]), state[:-1]])
        lead_e = state & ~prev
        trail_e = ~state & prev
        return (jnp.cumsum(lead_e, axis=0).T.astype(np.float32),
                jnp.cumsum(trail_e, axis=0).T.astype(np.float32))

    def _make(self, t_len, m, seed=0, open_at_end=False):
        rng = np.random.default_rng(seed)
        mag = np.abs(rng.standard_normal((t_len, m))).astype(np.float32) * 0.01
        for c in range(m):
            for s in range(5 + c, t_len - 30, 97 + 13 * c):
                mag[s : s + 7 + c % 5, c] = 1.0
        if open_at_end:
            mag[-3:, 0] = 1.0
        nf = np.median(mag, axis=0).astype(np.float32)
        return mag, nf * 10.0, nf * 3.0

    @pytest.mark.parametrize("m,t_len", [(8, 1024), (64, 2048), (3, 512),
                                         (100, 512)])
    def test_matches_oracle(self, m, t_len):
        import jax.numpy as jnp
        from sdr_channelizer_tpu.ops.pallas.latch_kernel import (
            pallas_latch_cumsums_cm,
        )

        mag, lead, trail = self._make(t_len, m, open_at_end=True)
        r = ((m + 7) // 8) * 8
        mag_cm = np.zeros((r, t_len), np.float32)
        mag_cm[:m] = mag.T
        packed = pallas_latch_cumsums_cm(
            jnp.asarray(mag_cm), jnp.asarray(lead), jnp.asarray(trail),
            m_real=m, t_blk=256)
        assert packed.shape == (2 * r, t_len)
        cl_want, ct_want = self._oracle(jnp.asarray(mag), jnp.asarray(lead),
                                        jnp.asarray(trail))
        np.testing.assert_array_equal(np.asarray(packed)[:m], cl_want)
        np.testing.assert_array_equal(np.asarray(packed)[r:r + m], ct_want)
        # pad rows count nothing
        np.testing.assert_array_equal(np.asarray(packed)[m:r], 0.0)
        np.testing.assert_array_equal(np.asarray(packed)[r + m:], 0.0)

    def test_zero_pad_columns_close_open_pulse(self):
        """Zero pad columns (the channelizer kernel's t_len..T_pad range)
        produce exactly one trailing edge for a pulse open at t_len."""
        import jax.numpy as jnp
        from sdr_channelizer_tpu.ops.pallas.latch_kernel import (
            pallas_latch_cumsums_cm,
        )

        t_len, t_pad, m = 200, 256, 2
        r = 8
        mag, lead, trail = self._make(t_len, m, open_at_end=True)
        mag_cm = np.zeros((r, t_pad), np.float32)
        mag_cm[:m, :t_len] = mag.T
        packed = np.asarray(pallas_latch_cumsums_cm(
            jnp.asarray(mag_cm), jnp.asarray(lead), jnp.asarray(trail),
            m_real=m, t_blk=256))
        cl_want, ct_want = self._oracle(jnp.asarray(mag), jnp.asarray(lead),
                                        jnp.asarray(trail))
        cl_want, ct_want = np.asarray(cl_want), np.asarray(ct_want)
        np.testing.assert_array_equal(packed[:m, :t_len], cl_want)
        np.testing.assert_array_equal(packed[r:r + m, :t_len], ct_want)
        # channel 0's open pulse closes at column t_len, then stays flat
        assert packed[r, t_len] == ct_want[0, -1] + 1
        np.testing.assert_array_equal(packed[r, t_len:], packed[r, t_len])
        # no lead edges fire in the pad
        np.testing.assert_array_equal(packed[:m, t_len:],
                                      np.broadcast_to(cl_want[:, -1:],
                                                      (m, t_pad - t_len)))
