"""IqPacket codec round-trip tests across all format versions / bit widths.

The fixtures follow the reference writers: v1 per
``generate_training_iq.m:107-127``, v2/v3 per ``blade_record_iq_12bit.cpp``
and ``usrp_record_iq_12bit.cpp``; parsing semantics per
``convert_my_iq_to_mat.m:40-98``.
"""

import io

import numpy as np
import pytest

from sdr_channelizer_tpu.io import iqpacket
from sdr_channelizer_tpu.io.iqpacket import IqHeader, read_iq, write_iq


def _mk_header(fmt=3, bit_width=12, n=1000, big_endian=False):
    return IqHeader(
        frequency_hz=2.4e9 if fmt >= 2 else 1.2e9,
        bandwidth_hz=56e6,
        sample_rate_sps=56e6,
        rx_gain_db=42.5 if fmt >= 3 else 42.0,
        num_samples=n,
        bit_width=bit_width,
        sample_start_time=1723800000.123456,
        link_speed=3,
        spare0=0,
        board_name="bladeRF 2.0",
        serial_number="abc123",
        fpga_version="0.15.3",
        fw_version="2.4.0",
        file_format=fmt,
        big_endian=big_endian,
    )


def _mk_samples(bit_width, n, seed=0):
    rng = np.random.default_rng(seed)
    if bit_width <= 8:
        return rng.integers(-128, 128, size=(n, 2)).astype(np.int8)
    lim = 2 ** (bit_width - 1)
    return rng.integers(-lim, lim, size=(n, 2)).astype(np.int16)


@pytest.mark.parametrize("fmt,bit_width", [(1, 16), (2, 8), (2, 12), (3, 8), (3, 12), (3, 16)])
def test_roundtrip_versions(tmp_path, fmt, bit_width):
    n = 4096
    hdr = _mk_header(fmt=fmt, bit_width=bit_width, n=n)
    samples = _mk_samples(bit_width, n)
    p = tmp_path / f"v{fmt}_{bit_width}.iq"
    write_iq(p, hdr, samples)

    got, payload = read_iq(p)
    assert got.file_format == fmt
    assert got.bit_width == bit_width
    assert got.num_samples == n
    assert got.frequency_hz == hdr.frequency_hz
    assert got.bandwidth_hz == hdr.bandwidth_hz
    assert got.sample_rate_sps == hdr.sample_rate_sps
    assert got.rx_gain_db == hdr.rx_gain_db
    assert got.sample_start_time == hdr.sample_start_time
    assert got.board_name == hdr.board_name
    assert got.serial_number == hdr.serial_number
    np.testing.assert_array_equal(np.asarray(payload), samples)


def test_header_sizes():
    assert len(iqpacket.encode_header(_mk_header(fmt=1))) == iqpacket.HEADER_SIZE_V1
    assert len(iqpacket.encode_header(_mk_header(fmt=2))) == iqpacket.HEADER_SIZE_V2
    assert len(iqpacket.encode_header(_mk_header(fmt=3))) == iqpacket.HEADER_SIZE_V2


def test_big_endian_assumed_v2(tmp_path):
    # Magic 0x00000000 -> big-endian file, reader assumes format 2
    # (convert_my_iq_to_mat.m:43-45).
    hdr = _mk_header(fmt=2, bit_width=12, n=100, big_endian=True)
    samples = _mk_samples(12, 100)
    p = tmp_path / "be.iq"
    write_iq(p, hdr, samples)
    got, payload = read_iq(p)
    assert got.big_endian
    assert got.file_format == 2
    assert got.frequency_hz == hdr.frequency_hz
    np.testing.assert_array_equal(np.asarray(payload), samples)


def test_v1_u32_frequency_truncation():
    # v1 stores frequency as u32 (convert_my_iq_to_mat.m:63-65).
    hdr = _mk_header(fmt=1, bit_width=16, n=10)
    hdr.frequency_hz = 5.8e9  # > 2^32
    blob = iqpacket.encode_header(hdr)
    got, _ = iqpacket.parse_header(blob)
    assert got.frequency_hz == float(int(5.8e9) & 0xFFFFFFFF)


def test_v3_float_gain_roundtrip():
    hdr = _mk_header(fmt=3)
    hdr.rx_gain_db = -7.25
    got, _ = iqpacket.parse_header(iqpacket.encode_header(hdr))
    assert got.rx_gain_db == -7.25


def test_normalization_q11():
    # bitWidth=12 with int16 storage divides by 2048
    # (blade_record_iq_12bit.cpp:214,261; create_pdws.m:30-32).
    s = np.array([[2048, -2048], [1024, 0]], dtype=np.int16)
    c = iqpacket.to_complex(s, bit_width=12)
    np.testing.assert_allclose(c, [1.0 - 1.0j, 0.5 + 0.0j])


def test_from_complex_matlab_rounding():
    # MATLAB int16(x*32768): round half away from zero, saturate.
    iq = np.array([1.0, -1.0, 0.5 / 32768 * 1.0001j])
    s = iqpacket.from_complex(iq, 16)
    assert s[0, 0] == 32767  # saturated
    assert s[1, 0] == -32768
    # exact half rounds away from zero
    iq2 = np.array([(0.5 + 0.5j) / 32768])
    s2 = iqpacket.from_complex(iq2, 16)
    assert s2[0, 0] == 1 and s2[0, 1] == 1


def test_truncated_payload_raises(tmp_path):
    hdr = _mk_header(fmt=3, bit_width=16, n=100)
    samples = _mk_samples(16, 100)
    p = tmp_path / "t.iq"
    write_iq(p, hdr, samples)
    raw = p.read_bytes()
    p.write_bytes(raw[:-10])
    with pytest.raises(ValueError):
        read_iq(p)


def test_filelike_roundtrip():
    hdr = _mk_header()
    samples = _mk_samples(12, 64)
    buf = io.BytesIO()
    write_iq(buf, hdr, samples)
    buf.seek(0)
    got, payload = read_iq(buf)
    np.testing.assert_array_equal(payload, samples)
    assert got.num_samples == 64
