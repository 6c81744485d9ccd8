"""Compute ops: prototype filter design, median reductions, and the fused
Pallas channelizer/STFT kernels."""

from sdr_channelizer_tpu.ops.filters import (  # noqa: F401
    design_prototype_filter,
    polyphase_decompose,
    kaiser_beta,
)
