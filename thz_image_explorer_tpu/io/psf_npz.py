"""PSF ``.npz`` codec.

Reads/writes the 28-array schema shared between the reference's PSF-tool
export (``/root/reference/src/psf_tool/export.rs:8-128``) and its loader
(``/root/reference/src/io.rs:190-267``): hybrid-fit base coefficients plus
correction-spline knots/values/coefficients for wx/wy, and plain spline
coefficients for the beam centers x0/y0. Values are stored f64, consumed
f32 (like the reference loader).
"""

from __future__ import annotations

import numpy as np

from thz_image_explorer_tpu.models.psf import PSF, CubicSplineCoeffs, HybridFit


def _arr(z, name: str) -> np.ndarray:
    a = np.asarray(z[name], np.float64).reshape(-1)
    return a


def _scalar(z, name: str) -> float:
    a = _arr(z, name)
    if a.size == 0:
        raise ValueError(f"array {name} is empty")
    return float(a[0])


def _spline(z, prefix: str) -> CubicSplineCoeffs:
    return CubicSplineCoeffs(
        knots=_arr(z, f"{prefix}_knots_thz"),
        values=_arr(z, f"{prefix}_values_mm"),
        coeff_a=_arr(z, f"{prefix}_coeff_a"),
        coeff_b=_arr(z, f"{prefix}_coeff_b"),
        coeff_c=_arr(z, f"{prefix}_coeff_c"),
        coeff_d=_arr(z, f"{prefix}_coeff_d"),
    )


def _hybrid(z, prefix: str) -> HybridFit:
    return HybridFit(
        base_a=_scalar(z, f"{prefix}_base_a"),
        base_b=_scalar(z, f"{prefix}_base_b"),
        correction=_spline(z, f"{prefix}_corr"),
    )


def load_psf(path: str) -> PSF:
    with np.load(path) as z:
        return PSF(
            wx_fit=_hybrid(z, "wx"),
            wy_fit=_hybrid(z, "wy"),
            x0_spline=_spline(z, "x0"),
            y0_spline=_spline(z, "y0"),
        )


def save_psf(path: str, psf: PSF):
    """Write the 28-key schema (all arrays f64, matching the reference's
    hand-rolled NPY writer)."""

    def spline_entries(prefix: str, s: CubicSplineCoeffs) -> dict:
        return {
            f"{prefix}_knots_thz": np.asarray(s.knots, np.float64),
            f"{prefix}_values_mm": np.asarray(s.values, np.float64),
            f"{prefix}_coeff_a": np.asarray(s.coeff_a, np.float64),
            f"{prefix}_coeff_b": np.asarray(s.coeff_b, np.float64),
            f"{prefix}_coeff_c": np.asarray(s.coeff_c, np.float64),
            f"{prefix}_coeff_d": np.asarray(s.coeff_d, np.float64),
        }

    entries = {
        "wx_base_a": np.asarray([psf.wx_fit.base_a], np.float64),
        "wx_base_b": np.asarray([psf.wx_fit.base_b], np.float64),
        **spline_entries("wx_corr", psf.wx_fit.correction),
        "wy_base_a": np.asarray([psf.wy_fit.base_a], np.float64),
        "wy_base_b": np.asarray([psf.wy_fit.base_b], np.float64),
        **spline_entries("wy_corr", psf.wy_fit.correction),
        **spline_entries("x0", psf.x0_spline),
        **spline_entries("y0", psf.y0_spline),
    }
    # write through an opened handle: bare np.savez silently appends
    # ".npz" to a suffix-less path, so `--out /d/mypsf` would land at
    # /d/mypsf.npz while the CLI/web report the requested path (the
    # reference's zip writer writes exactly the given path, export.rs:8)
    with open(path, "wb") as fh:
        np.savez(fh, **entries)
