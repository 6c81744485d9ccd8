"""Pallas TPU kernels: the fused polyphase channelizer (FIR x DFT) and
supporting fused compute for the hot path."""

from sdr_channelizer_tpu.ops.pallas.channelizer_kernel import (  # noqa: F401
    pallas_channelize,
    pallas_channelize_streams,
)
from sdr_channelizer_tpu.ops.pallas.pulse_stats_kernel import pulse_stats  # noqa: F401
