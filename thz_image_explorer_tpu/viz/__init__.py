"""Presentation helpers: the behavioral spec of the reference's GUI layer
(SURVEY.md §2.6) as host-side functions — colormaps, plot-series math,
image rendering — consumable by any frontend (notebook, web, CLI)."""

from thz_image_explorer_tpu.viz.colormap import (  # noqa: F401
    color_from_intensity,
    intensity_image_rgba,
)
from thz_image_explorer_tpu.viz.plots import (  # noqa: F401
    dynamic_range_db,
    fft_plot_series,
    peak_to_peak,
    stacked_pulse_series,
)
