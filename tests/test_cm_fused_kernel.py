"""Channel-major fused channelizer kernel parity (interpret mode).

The ``*_cm`` kernel variants emit the transposed detection streams straight
from the channelizer pass (``channelizer_kernel.py:_streams_kernel`` with
``channel_major=True``), replacing the separate transpose kernel on the
headline path.  These tests pin bit-identity against the two-kernel
composition and against the full extraction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdr_channelizer_tpu.config import PdwConfig
from sdr_channelizer_tpu.dsp import pdw as pdwmod
from sdr_channelizer_tpu.dsp.channelizer import Channelizer
from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.ops import medians
from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
    pallas_channelize_streams,
    pallas_channelize_streams_cm,
    pallas_channelize_streams_packed_cm,
)
from sdr_channelizer_tpu.ops.pallas.transpose_kernel import pallas_cm_streams
from sdr_channelizer_tpu.signal.synth import PulseTrainSpec, pulse_train

M = 8
CFG = PdwConfig.channelized(max_pulses=64, max_pulse_samples=256)


def _capture(bit_width=16):
    spec = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=1e-3,
                          frequency_hz=1.7e6, pulse_width_sec=60e-6,
                          pri_sec=300e-6, start_index=101, noise_std=5e-3)
    iq = pulse_train(spec, seed=7)
    samples = iqpacket.from_complex(iq, bit_width)
    n = len(iq) // M * M
    return np.ascontiguousarray(samples[:n])


def test_cm_streams_match_transpose_kernel():
    samples = _capture()
    xr = jnp.asarray(np.ascontiguousarray(samples[:, 0]))
    xi = jnp.asarray(np.ascontiguousarray(samples[:, 1]))
    chan = Channelizer.create(M)
    kw = dict(bit_width=16, block_frames=256, interpret=True)

    mag, ph, sat = pallas_channelize_streams(xr, xi, chan.taps_rev, **kw)
    ref_cm = pallas_cm_streams(mag, ph, sat, interpret=True)

    mag2, mag_cm, dph_cm, sat_cm = pallas_channelize_streams_cm(
        xr, xi, chan.taps_rev, **kw)
    np.testing.assert_array_equal(np.asarray(mag2), np.asarray(mag))
    t_len = mag.shape[0]
    for got, ref in zip((mag_cm, dph_cm, sat_cm), ref_cm):
        got = np.asarray(got)
        np.testing.assert_array_equal(got[:, :t_len],
                                      np.asarray(ref)[:, :t_len])
        assert not got[:, t_len:].any()  # pad columns stay zero


@pytest.mark.parametrize("bit_width", [12, 8])
def test_packed_cm_matches_planes_cm(bit_width):
    samples = _capture(bit_width)
    chan = Channelizer.create(M)
    xr = jnp.asarray(np.ascontiguousarray(samples[:, 0]))
    xi = jnp.asarray(np.ascontiguousarray(samples[:, 1]))
    ref = pallas_channelize_streams_cm(
        xr, xi, chan.taps_rev, bit_width=bit_width, block_frames=256,
        interpret=True)

    packed_dt = np.int16 if samples.dtype == np.int8 else np.int32
    xq = jnp.asarray(samples.view(packed_dt).ravel())
    got = pallas_channelize_streams_packed_cm(
        xq, chan.taps_rev, bit_width=bit_width, block_frames=256,
        interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_extract_cm_matches_streams_path(monkeypatch):
    samples = _capture()
    chan = Channelizer.create(M)
    xr = jnp.asarray(np.ascontiguousarray(samples[:, 0]))
    xi = jnp.asarray(np.ascontiguousarray(samples[:, 1]))
    kw = dict(bit_width=16, block_frames=256, interpret=True)

    mag, ph, sat = pallas_channelize_streams(xr, xi, chan.taps_rev, **kw)
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    ref = pdwmod.extract_pdws_channelized_streams(
        mag, ph, sat > 0.5, CFG, stats="pallas")

    mag2, mag_cm, dph_cm, sat_cm = pallas_channelize_streams_cm(
        xr, xi, chan.taps_rev, **kw)
    got = pdwmod.extract_pdws_channelized_streams_cm(
        mag2, mag_cm, dph_cm, sat_cm, CFG)
    assert int(np.asarray(got.count).sum()) > 0
    for name in ("toa_idx", "te_idx", "pw_sec", "mag", "snr_db",
                 "freq_offset_hz", "saturated", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            err_msg=name)


def test_forward_packed_routes_cm(monkeypatch):
    """The pipeline's packed forward takes the cm route (when feasible) and
    emits the same batch as the two-kernel streams path."""
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
    from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
        pallas_channelize_streams_packed,
    )

    samples = _capture(12)
    pipe = ChannelizerPipeline.create(M, pdw_cfg=CFG)
    xq = jnp.asarray(samples.view(np.int32).ravel())

    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    assert pdwmod._pallas_stats_ok(samples.shape[0] // M, CFG)
    nf, mag, batch = pipe.forward_packed(xq, bit_width=12, route="cm")

    mag_r, ph_r, sat_r = pallas_channelize_streams_packed(
        xq, pipe.channelizer.taps_rev, bit_width=12,
        sat_level=CFG.saturation_level)
    ref = pdwmod.extract_pdws_channelized_streams(
        mag_r, ph_r, sat_r > 0.5, CFG, stats="pallas")
    np.testing.assert_array_equal(np.asarray(mag), np.asarray(mag_r))
    for name in ("toa_idx", "te_idx", "mag", "snr_db", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(batch, name)), np.asarray(getattr(ref, name)),
            err_msg=name)


def test_cm2_kernel_streams_match_cm():
    """v2 kernel: same mag/dph cm streams as the v1 cm kernel; saturation
    emitted as the inclusive per-channel cumsum of v1's sat stream."""
    from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (
        pallas_channelize_streams_cm2,
        pallas_channelize_streams_packed_cm2,
    )

    samples = _capture(12)
    chan = Channelizer.create(M)
    xr = jnp.asarray(np.ascontiguousarray(samples[:, 0]))
    xi = jnp.asarray(np.ascontiguousarray(samples[:, 1]))
    kw = dict(bit_width=12, block_frames=256, interpret=True)
    _, mag_cm, dph_cm, sat_cm = pallas_channelize_streams_cm(
        xr, xi, chan.taps_rev, **kw)
    got = pallas_channelize_streams_cm2(xr, xi, chan.taps_rev, **kw)
    # cm2 emits SLIM (8-aligned M) rows — compare against the real rows.
    r = got[0].shape[0]
    assert r == ((M + 7) // 8) * 8
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(mag_cm)[:r])
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(dph_cm)[:r])
    want_cs = np.cumsum(np.asarray(sat_cm)[:r], axis=1, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(got[2]), want_cs)

    xq = jnp.asarray(samples.view(np.int32).ravel())
    gp = pallas_channelize_streams_packed_cm2(xq, chan.taps_rev, **kw)
    for a, b in zip(gp, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cm2_transpose_first_and_tier_knobs(monkeypatch):
    """The non-default knob settings (transpose-last form, the 4-tier
    w128 split, per-tile vs batched descents) all emit bit-identical
    batches — they are speed A/B points, never semantics."""
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline
    from sdr_channelizer_tpu.ops.pallas import channelizer_kernel as ck

    samples = _capture(11)
    pipe = ChannelizerPipeline.create(M, pdw_cfg=CFG)
    xq = jnp.asarray(np.ascontiguousarray(samples).view(np.int32).ravel())
    monkeypatch.setattr(medians, "use_sort_free", lambda: True)

    def run():
        _, _, b = pipe.forward_packed(xq, bit_width=12, route="cm2")
        return {k: np.asarray(getattr(b, k))
                for k in ("toa_idx", "te_idx", "mag", "snr_db",
                          "freq_offset_hz", "saturated", "valid", "count")}

    ref = run()
    assert ref["count"].sum() > 0
    monkeypatch.setattr(ck, "CM2_TRANSPOSE_FIRST", False)
    tl = run()
    monkeypatch.setattr(ck, "CM2_TRANSPOSE_FIRST", True)
    monkeypatch.setattr(pdwmod, "_TIER_W128", True)
    monkeypatch.setattr(pdwmod, "_SHORT_WINDOW", 256)
    w4 = run()
    for name in ref:
        np.testing.assert_array_equal(ref[name], tl[name],
                                      err_msg=f"transpose_last {name}")
        np.testing.assert_array_equal(ref[name], w4[name],
                                      err_msg=f"4tier {name}")


def test_forward_packed_cm2_matches_cm(monkeypatch):
    """The v2 route (cm latch + no-compaction tiers + cumsum saturation)
    emits a bit-identical PdwBatch to the round-3 cm route."""
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

    # Saturating segment so the sat-from-cumsum path is exercised.
    samples = _capture(12)
    samples[3000:3040] = 2047
    pipe = ChannelizerPipeline.create(M, pdw_cfg=CFG)
    xq = jnp.asarray(np.ascontiguousarray(samples).view(np.int32).ravel())

    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    nf1, _, b1 = pipe.forward_packed(xq, bit_width=12, route="cm")
    nf2, _, b2 = pipe.forward_packed(xq, bit_width=12, route="cm2")
    np.testing.assert_array_equal(np.asarray(nf1), np.asarray(nf2))
    assert int(np.asarray(b1.count).sum()) > 0
    assert bool(np.asarray(b1.saturated).any())
    for name in ("toa_idx", "te_idx", "pw_sec", "mag", "snr_db",
                 "freq_offset_hz", "saturated", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b1, name)), np.asarray(getattr(b2, name)),
            err_msg=name)


def test_forward_packed_cm2_long_pulses(monkeypatch):
    """cm2 with pulses spanning the short/long tier boundary and an open
    pulse at capture end — tier masks + sentinel routing."""
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

    cfg = PdwConfig.channelized(max_pulses=64, max_pulse_samples=1024)
    spec = PulseTrainSpec(sample_rate_sps=8e6, duration_sec=4e-3,
                          frequency_hz=1.7e6, pulse_width_sec=400e-6,
                          pri_sec=1500e-6, start_index=101, noise_std=5e-3)
    iq = pulse_train(spec, seed=9)
    iq[-500:] = iq[200:700]  # re-open a pulse at capture end
    samples = iqpacket.from_complex(iq, 12)
    n = len(iq) // M * M
    samples = np.ascontiguousarray(samples[:n])
    pipe = ChannelizerPipeline.create(M, pdw_cfg=cfg)
    xq = jnp.asarray(samples.view(np.int32).ravel())

    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    nf1, _, b1 = pipe.forward_packed(xq, bit_width=12, route="cm")
    nf2, _, b2 = pipe.forward_packed(xq, bit_width=12, route="cm2")
    assert int(np.asarray(b1.count).sum()) > 0
    for name in ("toa_idx", "te_idx", "pw_sec", "mag", "snr_db",
                 "freq_offset_hz", "saturated", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b1, name)), np.asarray(getattr(b2, name)),
            err_msg=name)


def test_forward_packed_cm2_nonpair_bands(monkeypatch):
    """M > 64 (2M > 128 latch rows): the cm2 route takes the non-pair
    two-output latch — the code path the fine-grained M=560 config uses."""
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

    m = 96
    cfg = PdwConfig.channelized(max_pulses=32, max_pulse_samples=256)
    spec = PulseTrainSpec(sample_rate_sps=96e6, duration_sec=2e-4,
                          frequency_hz=11.3e6, pulse_width_sec=20e-6,
                          pri_sec=60e-6, start_index=57, noise_std=5e-3)
    iq = pulse_train(spec, seed=11)
    samples = iqpacket.from_complex(iq, 12)
    n = len(iq) // m * m
    samples = np.ascontiguousarray(samples[:n])
    pipe = ChannelizerPipeline.create(m, pdw_cfg=cfg)
    xq = jnp.asarray(samples.view(np.int32).ravel())

    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    _, _, b1 = pipe.forward_packed(xq, bit_width=12, route="cm")
    _, _, b2 = pipe.forward_packed(xq, bit_width=12, route="cm2")
    assert int(np.asarray(b1.count).sum()) > 0
    for name in ("toa_idx", "te_idx", "mag", "snr_db", "freq_offset_hz",
                 "saturated", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b1, name)), np.asarray(getattr(b2, name)),
            err_msg=name)


def test_forward_packed_cm2_tiny4_boundary(monkeypatch):
    """Pulses of exactly 1/2/3/4/5 decimated samples: the extended
    closed-form tiny tier (plen <= 4) must stay bit-identical to the
    round-3 route (which computes them in the stats kernel)."""
    from sdr_channelizer_tpu.models.pipeline import ChannelizerPipeline

    rng = np.random.default_rng(13)
    n_frames = 2048
    n = n_frames * M
    fs = 8e6
    iq = (1e-3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    t = np.arange(n)
    tone = (0.9 * np.exp(2j * np.pi * 1.02e6 / fs * t)).astype(np.complex64)
    # widths in raw samples ~ k decimated frames (M=8 samples per frame)
    for j, w in enumerate((8, 16, 24, 32, 40, 8, 24, 32)):
        s = 600 + j * 1200
        iq[s:s + w] = tone[s:s + w]
    samples = np.ascontiguousarray(iqpacket.from_complex(iq, 12))
    cfg = PdwConfig.channelized(max_pulses=32, max_pulse_samples=512)
    pipe = ChannelizerPipeline.create(M, pdw_cfg=cfg)
    xq = jnp.asarray(samples.view(np.int32).ravel())

    monkeypatch.setattr(medians, "use_sort_free", lambda: True)
    _, _, b1 = pipe.forward_packed(xq, bit_width=12, route="cm")
    _, _, b2 = pipe.forward_packed(xq, bit_width=12, route="cm2")
    plens = np.asarray(b1.te_idx) - np.asarray(b1.toa_idx) + 1
    got_lens = set(plens[np.asarray(b1.valid)].tolist())
    assert got_lens & {1, 2, 3, 4}, got_lens  # tiny tier actually exercised
    for name in ("toa_idx", "te_idx", "mag", "snr_db", "freq_offset_hz",
                 "saturated", "valid", "count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b1, name)), np.asarray(getattr(b2, name)),
            err_msg=name)
