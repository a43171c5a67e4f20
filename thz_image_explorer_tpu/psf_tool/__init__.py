"""PSF tool: knife-edge measurements → frequency-resolved PSF model.

The second application of the reference (``/root/reference/src/psf_tool/``):
load double-knife-edge THz scans, band-filter the traces, fit Gaussian-beam
widths/centers per frequency band, fit smooth spline/hybrid curves, run
Gaussian-beam physics diagnostics and export the 28-key PSF ``.npz``
consumed by the deconvolution filter.
"""

from thz_image_explorer_tpu.psf_tool.data_loader import (  # noqa: F401
    KnifeEdgeMeasurement,
    load_knife_edge_measurements,
    split_and_flip,
)
from thz_image_explorer_tpu.psf_tool.curve_fitting import (  # noqa: F401
    CubicSpline,
    CurveFits,
    HybridFitF64,
)
from thz_image_explorer_tpu.psf_tool.fitting import (  # noqa: F401
    BeamFitParams,
    BeamWidthFits,
    MeanBeamFit,
    fit_beam_widths,
    fit_mean_beam,
)
from thz_image_explorer_tpu.psf_tool.diagnostics import DiagnosticResults  # noqa: F401
from thz_image_explorer_tpu.psf_tool.app import PsfToolApp, FilterParams  # noqa: F401
