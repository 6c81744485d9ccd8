"""Native-tier tests: C++ codec parity with the NumPy codec, the capture
emulator's CLI contract and file output, and the gain-search loop.

The native tier is built on demand (``make -C native``); tests skip if the
toolchain is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.io import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(REPO, "native")
BUILD = os.path.join(NATIVE_DIR, "build")


@pytest.fixture(scope="module", autouse=True)
def built():
    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no native toolchain")
    from conftest import build_native

    build_native()
    assert native.available()


def _header(fmt=3, bit_width=12, big_endian=False):
    return iqpacket.IqHeader(
        frequency_hz=2.4e9 if fmt > 1 else 1.2e9,
        bandwidth_hz=56e6,
        sample_rate_sps=56e6,
        rx_gain_db=42.5 if fmt >= 3 else 42.0,
        num_samples=0,
        bit_width=bit_width,
        sample_start_time=1723800000.125,
        link_speed=5000,
        board_name="bladeRF2micro",
        serial_number="abc123",
        fpga_version="0.15.3",
        fw_version="2.4.0",
        file_format=fmt,
        big_endian=big_endian,
    )


@pytest.mark.parametrize("fmt,bit_width", [(1, 16), (2, 12), (3, 12), (3, 8)])
def test_codec_cross_parity(tmp_path, fmt, bit_width):
    """Files written by either codec parse identically in both."""
    rng = np.random.default_rng(fmt * 100 + bit_width)
    dt = np.int8 if bit_width <= 8 else np.int16
    lim = 2 ** (bit_width - 1)
    samples = rng.integers(-lim, lim, size=(1000, 2)).astype(dt)
    hdr = _header(fmt, bit_width)

    p_py = tmp_path / "py.iq"
    p_cc = tmp_path / "cc.iq"
    iqpacket.write_iq(p_py, hdr, samples)
    native.write_iq(p_cc, hdr, samples)
    assert p_py.read_bytes() == p_cc.read_bytes()

    for p in (p_py, p_cc):
        h1, s1 = iqpacket.read_iq(p)
        h2, s2 = native.read_iq(p)
        np.testing.assert_array_equal(np.asarray(s1), s2)
        assert h1 == h2


def test_codec_big_endian_parity(tmp_path):
    hdr = _header(fmt=2, bit_width=12, big_endian=True)
    samples = np.arange(64, dtype=np.int16).reshape(32, 2)
    p = tmp_path / "be.iq"
    iqpacket.write_iq(p, hdr, samples)
    h_py, s_py = iqpacket.read_iq(p)
    h_cc, s_cc = native.read_iq(p)
    assert h_cc.big_endian and h_cc.file_format == 2
    # native reader byte-swaps to host order
    np.testing.assert_array_equal(np.asarray(s_py, np.int16), s_cc)
    assert h_py == h_cc


def test_filename_parity():
    for epoch in (0.0, 1723800000.125, 1723800000.9996):
        assert native.filename_utc(epoch) == iqpacket.utc_filename(epoch)


def test_record_emulator_contract(tmp_path):
    """The 7-positional-arg CLI produces one v3 file per dwell with
    delay-trimmed payloads and correct metadata."""
    exe = os.path.join(BUILD, "sdr_record_emulator")
    out = subprocess.run(
        [exe, "1000", "56", "2", "30", "0.005", "0.02", "100",
         "--out-dir", str(tmp_path), "--start-epoch", "1723800000.0",
         "--offset-mhz", "0.31", "--pw-us", "200", "--pri-us", "1000",
         "--noise-db", "-50"],
        check=True, capture_output=True, text=True,
    ).stdout
    files = sorted(tmp_path.glob("*.iq"))
    assert len(files) == 4  # 0.02 s / 0.005 s dwells
    assert "Overruns: 0" in out

    dwell_n = int(0.005 * 2e6)
    for k, f in enumerate(files):
        hdr, samples = iqpacket.read_iq(f)
        assert hdr.file_format == 3
        assert hdr.bit_width == 12
        assert hdr.board_name == "emulated"
        assert hdr.num_samples == dwell_n  # filter delay trimmed
        # start time is delay-corrected and advances by dwell+delay samples
        expect_t0 = 1723800000.0 + (k * (dwell_n + 100) + 100) / 2e6
        # f64 epoch-seconds resolution at 1.7e9 is ~2.4e-7 s
        assert abs(hdr.sample_start_time - expect_t0) < 1e-6
        assert f.name == iqpacket.utc_filename(hdr.sample_start_time)

    # Pulses are present at the synthesized PW/PRI.
    hdr, samples = iqpacket.read_iq(files[0])
    iq = iqpacket.to_complex(np.asarray(samples), hdr.bit_width)
    mag = np.abs(iq)
    # gain 30 dB below gain_ref 60 -> peak amplitude 10^(-30/20) ~ 0.032
    assert 0.025 < mag.max() < 0.04
    on = mag > 0.5 * mag.max()
    assert 0.15 < on.mean() < 0.25  # ~20% duty cycle (200us / 1000us)


def test_record_emulator_phase_continuity(tmp_path):
    """The emitter is phase-continuous across dwell files (absolute-index
    synthesis), so concatenated captures behave like one recording."""
    exe = os.path.join(BUILD, "sdr_record_emulator")
    subprocess.run(
        [exe, "1000", "56", "2", "30", "0.002", "0.004", "0",
         "--out-dir", str(tmp_path), "--start-epoch", "1723800000.0",
         "--offset-mhz", "0.25", "--pw-us", "1e9", "--pri-us", "1e9",
         "--noise-db", "-300"],
        check=True, capture_output=True,
    )
    files = sorted(tmp_path.glob("*.iq"))
    assert len(files) == 2
    iqs = []
    for f in files:
        hdr, samples = iqpacket.read_iq(f)
        iqs.append(iqpacket.to_complex(np.asarray(samples), hdr.bit_width))
    cat = np.concatenate(iqs)
    # 0.25 MHz tone at 2 Msps -> 8 samples/cycle, continuous at the seam.
    phase = np.unwrap(np.angle(cat))
    dph = np.diff(phase)
    assert np.allclose(dph, 2 * np.pi * 0.25 / 2.0, atol=0.02)


def test_gain_search_converges():
    """Saturation-feedback loop: start saturated, step down 1 dB per dwell
    until below 0.98 full scale (blade_find_max_unsaturated_gain.cpp)."""
    exe = os.path.join(BUILD, "sdr_gain_search")
    out = subprocess.run(
        [exe, "1000", "56", "2", "66", "0.001", "0.02", "--amplitude", "1.0",
         "--noise-db", "-300"],
        check=True, capture_output=True, text=True,
    ).stdout
    # amplitude 1.0 at gain_ref 60 hits full scale; unsaturated needs
    # amp < 0.98 -> gain <= 59 (20*log10(0.98) ~ -0.18 dB).
    assert "Max unsaturated gain: 59.0 dB" in out
    assert "saturated at 66.0" in out
