"""DSP layer: channelizer, PDW extraction, event prediction, spectrogram."""

from sdr_channelizer_tpu.dsp.channelizer import (  # noqa: F401
    Channelizer,
    channelize,
    center_frequencies,
)
