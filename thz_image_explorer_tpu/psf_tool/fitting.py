"""Beam fitting: knife-edge intensity profiles → Gaussian beam parameters.

Equivalent of ``/root/reference/src/psf_tool/fitting.rs``. The erf-model
knife-edge fit ``I(x) = (1 + erf(√2 (x − x0)/w))/2`` is a tiny 2-parameter
Nelder-Mead per band (host, scipy); the heavy part — FIR-filtering every
trace with every band — is one batched device program instead of the
reference's per-band rayon loops. The per-band fits stay sequential on
purpose: each fit is warm-started from the previous band's optimum with
monotonicity-constrained moving bounds (``fitting.rs:287-442``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from thz_image_explorer_tpu.psf_tool.data_loader import KnifeEdgeMeasurement


def erf_model(x, x0, w):
    """Knife-edge model: cumulative Gaussian (``fitting.rs:25-27``)."""
    from scipy.special import erf

    return (1.0 + erf(np.sqrt(2.0) * (x - x0) / w)) / 2.0


def compute_intensity(traces: np.ndarray) -> np.ndarray:
    """Sum of squares per position, min-max normalized
    (``fitting.rs:159-177``)."""
    intensity = (traces.astype(np.float64) ** 2).sum(axis=-1)
    lo, hi = intensity.min(), intensity.max()
    if abs(hi - lo) > 1e-10:
        intensity = (intensity - lo) / (hi - lo)
    return intensity


def fit_error_function(
    x_data: np.ndarray,
    y_data: np.ndarray,
    initial_guess: tuple[float, float],
    bounds: Optional[tuple[tuple[float, float], tuple[float, float]]] = None,
) -> tuple[float, float]:
    """2-parameter Nelder-Mead with penalty bounds (``fitting.rs:97-156``):
    the same initial simplex ([x0,w], [x0+0.1,w], [x0,w+0.1]), out-of-bounds
    cost 1e10, max 8000 iterations."""
    x = np.asarray(x_data, np.float64)
    y = np.asarray(y_data, np.float64)

    def cost(p):
        x0, w = p
        if bounds is not None:
            (lo, hi) = bounds
            if x0 < lo[0] or x0 > hi[0] or w < lo[1] or w > hi[1]:
                return 1e10
        pred = erf_model(x, x0, w)
        return float(((y - pred) ** 2).sum())

    x0g, wg = initial_guess
    simplex = np.array([[x0g, wg], [x0g + 0.1, wg], [x0g, wg + 0.1]])
    res = minimize(
        cost,
        np.asarray(initial_guess, np.float64),
        method="Nelder-Mead",
        options={"initial_simplex": simplex, "maxiter": 8000, "xatol": 1e-8,
                 "fatol": 1e-12},
    )
    return float(res.x[0]), float(res.x[1])


@dataclasses.dataclass
class MeanBeamFit:
    x0: float
    y0: float
    popt_x: tuple[float, float]
    popt_y: tuple[float, float]


def fit_mean_beam(
    x_positions, y_positions, x_traces, y_traces
) -> MeanBeamFit:
    """Broadband beam fit for center + initial width
    (``fitting.rs:180-263``)."""
    ix = compute_intensity(np.asarray(x_traces))
    popt_x = fit_error_function(x_positions, ix, (0.0, 10.0))
    if y_traces is x_traces and y_positions is x_positions:
        # _fit_axis passes the same knife half for both axes — a second
        # identical Nelder-Mead would return the same optimum at full cost
        popt_y = popt_x
    else:
        iy = compute_intensity(np.asarray(y_traces))
        popt_y = fit_error_function(y_positions, iy, (0.0, 10.0))
    return MeanBeamFit(
        x0=popt_x[0], y0=popt_y[0], popt_x=popt_x, popt_y=popt_y
    )


# ----------------------------------------------------------------------
# Batched band filtering on device
# ----------------------------------------------------------------------


def filter_traces_all_bands(traces: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """(P, T) traces x (B, L) taps -> (B, P, T) filtered traces.

    The reference's ``convolve`` is a zero-boundary 'same' *correlation*
    (``fitting.rs:266-284``); it runs as one MXU block-banded matmul
    program (``ops/firapply``) — no FFTs on the device path.
    """
    from thz_image_explorer_tpu.ops.firapply import fir_correlate_bands

    return fir_correlate_bands(traces, taps)


def filter_and_intensity_all_bands(traces: np.ndarray, taps: np.ndarray):
    """(P, T) traces x (B, L) taps -> ``(filtered, intensities)`` where
    ``filtered`` is the (B, P, T) cube **left on device** and
    ``intensities`` is the (B, P) per-band normalized knife-edge curve as
    numpy. The erf fits read only the intensities; shipping the full cube
    back per call cost ~850 ms on the tunnelled TPU link (bench psf_tool).
    """
    from thz_image_explorer_tpu.ops.firapply import fir_correlate_bands_device

    return fir_correlate_bands_device(traces, taps)


@dataclasses.dataclass
class BeamFitParams:
    """(``fitting.rs:42-60``)"""

    w_max: float = 30.0
    use_monotonicity_constraint: bool = True


@dataclasses.dataclass
class BeamWidthFits:
    popt_xs: np.ndarray  # (B, 2)
    popt_ys: np.ndarray  # (B, 2)
    # (B, P, T) — may be DEVICE arrays (lazily fetched); np.asarray on use
    filtered_traces_x: np.ndarray
    filtered_traces_y: np.ndarray
    x_positions: np.ndarray
    y_positions: np.ndarray


def fit_beam_widths(
    mean_fit: MeanBeamFit,
    x_positions,
    y_positions,
    x_traces,
    y_traces,
    taps: np.ndarray,
    fit_params: BeamFitParams,
    progress: Callable[[int, int], bool] = lambda _c, _t: True,
) -> Optional[BeamWidthFits]:
    """Per-band beam fits with warm starts and moving monotonic bounds
    (``fitting.rs:287-442``). Returns None when cancelled via ``progress``.
    """
    n_filters = taps.shape[0]
    # the host fit chain dedupes exactly like the device filter call
    # below: with identical inputs AND an identical warm start
    # (mean_fit from the deduped fit_mean_beam) the y chain is bitwise
    # the x chain — skipping it halves the dominant host cost (the
    # sequential Nelder-Mead fits) on this 1-core host
    dedupe_y = (
        y_traces is x_traces
        and y_positions is x_positions
        and mean_fit.popt_y == mean_fit.popt_x
    )
    x_positions = np.asarray(x_positions, np.float64)
    y_positions = np.asarray(y_positions, np.float64)

    # ALL bands filtered on device in one call (vs. rayon per band); the
    # per-band intensities come back in the same program (one tiny
    # transfer) and the filtered cubes stay on device. _fit_axis passes
    # the same half for both axes (app.rs:543-636 fits X and Y positions
    # of one knife half) — dedupe the identical filter call.
    fx, ix_all = filter_and_intensity_all_bands(np.asarray(x_traces), taps)
    if y_traces is x_traces:
        fy, iy_all = fx, ix_all
    else:
        fy, iy_all = filter_and_intensity_all_bands(np.asarray(y_traces), taps)

    popt_xs = np.zeros((n_filters, 2))
    popt_ys = np.zeros((n_filters, 2))

    popt_x = (mean_fit.popt_x[0], fit_params.w_max)
    popt_y = (mean_fit.popt_y[0], fit_params.w_max)
    w_max = fit_params.w_max
    range_max = w_max * 1.5
    bounds_x = ((-range_max / 2.0, 0.01), (range_max / 2.0, w_max))
    bounds_y = ((-range_max / 2.0, 0.01), (range_max / 2.0, w_max))

    for nf in range(n_filters):
        ix = ix_all[nf]

        popt_x = fit_error_function(x_positions, ix, popt_x, bounds_x)
        if fit_params.use_monotonicity_constraint:
            x_off, w_x = popt_x
            bounds_x = ((-w_x / 2.0 + x_off, 0.0), (w_x / 2.0 + x_off, w_x))
        else:
            bounds_x = ((-range_max / 2.0, 0.01), (range_max / 2.0, w_max))

        if dedupe_y:
            popt_y, bounds_y = popt_x, bounds_x
        else:
            iy = iy_all[nf]
            popt_y = fit_error_function(y_positions, iy, popt_y, bounds_y)
            if fit_params.use_monotonicity_constraint:
                y_off, w_y = popt_y
                bounds_y = (
                    (-w_y / 2.0 + y_off, 0.0), (w_y / 2.0 + y_off, w_y)
                )
            else:
                bounds_y = (
                    (-range_max / 2.0, 0.01), (range_max / 2.0, w_max)
                )

        popt_xs[nf] = (popt_x[0], abs(popt_x[1]))
        popt_ys[nf] = (popt_y[0], abs(popt_y[1]))

        if not progress(nf + 1, n_filters):
            return None

    return BeamWidthFits(
        popt_xs=popt_xs,
        popt_ys=popt_ys,
        filtered_traces_x=fx,
        filtered_traces_y=fy,
        x_positions=x_positions,
        y_positions=y_positions,
    )
