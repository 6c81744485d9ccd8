"""Visualization: the reference's plot outputs as PNG renderers."""

from sdr_channelizer_tpu.viz.plots import (  # noqa: F401
    plot_iq_png,
    waterfall_png,
    waterfall_video,
    waterfall_window_pngs,
    pdw_plot_png,
    event_fit_png,
)
