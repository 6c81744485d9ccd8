"""Utilities: stage profiling, structured metrics counters, and array I/O
helpers shared by the CLI and pipelines."""

from sdr_channelizer_tpu.utils.profiling import StageTimer, trace  # noqa: F401
from sdr_channelizer_tpu.utils.metrics import Counters  # noqa: F401
