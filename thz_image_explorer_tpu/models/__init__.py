"""Model families: the frequency-resolved PSF model (splines + hybrid
physical fits) and Gaussian-beam models used by the PSF tool."""

from thz_image_explorer_tpu.models.psf import (  # noqa: F401
    PSF,
    CubicSplineCoeffs,
    HybridFit,
    create_psf_2d,
    gaussian,
)
