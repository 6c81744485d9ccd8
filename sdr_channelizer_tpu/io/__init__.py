"""I/O layer: the versioned IqPacket binary format (the reference's only
contract between its native capture tier and its analysis tier) plus
conversion helpers."""

from sdr_channelizer_tpu.io.iqpacket import (  # noqa: F401
    IqHeader,
    read_iq,
    write_iq,
    to_complex,
    HEADER_SIZE_V1,
    HEADER_SIZE_V2,
    MAGIC_TO_FORMAT,
)
