"""Built-in filter stages.

Each stage wraps a jitted op from :mod:`thz_image_explorer_tpu.ops` in the
stage protocol. Parameter defaults and domains mirror the reference
filters (``/root/reference/src/filters/``); the water-vapor notch is the
strict-superset stage BASELINE.json asks for.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from thz_image_explorer_tpu.assets.water_lines import WATER_LINES_THZ
from thz_image_explorer_tpu.data import ScanCube
from thz_image_explorer_tpu.ops import bandpass as bp
from thz_image_explorer_tpu.ops import deconvolution as dec
from thz_image_explorer_tpu.ops.tilt import tilt_compensate
from thz_image_explorer_tpu.pipeline.stage import (
    FilterConfig,
    FilterDomain,
    FilterStage,
    StageContext,
    register_filter,
)

log = logging.getLogger(__name__)

import jax as _jax
from functools import partial as _partial


@_partial(_jax.jit, static_argnames=("w", "h"))
def _crop2(data, w: int, h: int):
    """Static spatial crop (bucket-padding removal for deconvolution)."""
    return data[:w, :h]


@_jax.jit
def _insert2(full, sub):
    """Re-insert a deconvolved valid region into the padded grid (the
    padded border stays the pass-through data)."""
    return _jax.lax.dynamic_update_slice(full, sub, (0, 0, 0))


@register_filter
class TiltCompensation(FilterStage):
    """Per-pixel time shifts for tilted samples
    (``tilt_compensation.rs:97-226``). Inactive by default like every
    toggleable filter at startup."""

    fusable = True

    def __init__(self):
        self.tilt_x = 0.0  # degrees, range ±15
        self.tilt_y = 0.0
        self.active = False

    def config(self) -> FilterConfig:
        return FilterConfig(
            name="Tilt Compensation",
            description="Compensate misalignment of the sample along x and y.",
            domain=FilterDomain.TIME_BEFORE_FFT_PRIO_FIRST,
        )

    def apply(self, cube: ScanCube, context: StageContext) -> ScanCube:
        return tilt_compensate(
            cube, self.tilt_x, self.tilt_y, valid_wh=context.valid_wh
        )

    # -- fusion protocol ---------------------------------------------
    def traced_params(self):
        return (np.float32(self.tilt_x), np.float32(self.tilt_y))

    def fused_static(self, cube: ScanCube):
        from thz_image_explorer_tpu.ops.tilt import extension_steps

        if cube.dx is None or cube.dy is None:
            return (None,)
        # geometry from the TRUE scan size (meta.valid_wh), not the
        # bucket-padded grid — see tilt_compensate. The executor always
        # hands a host _Meta whose valid_wh is a tuple (executor.py:161);
        # a traced ScanCube here would silently re-derive tilt geometry
        # from the padded grid (THZ_SHAPE_BUCKET-dependent), so fail loud
        vwh = cube.valid_wh
        if not isinstance(vwh, tuple):
            raise TypeError(
                "fused_static needs host meta with a tuple valid_wh "
                f"(got {type(vwh).__name__}) — padded-grid tilt geometry "
                "is forbidden (tilt_compensation.rs:104-143)"
            )
        vw, vh = vwh
        return (
            extension_steps(
                vw, vh, cube.dx, cube.dy, self.tilt_x, self.tilt_y,
            ),
        )

    def fused_apply(self, cube: ScanCube, params, static) -> ScanCube:
        from thz_image_explorer_tpu.ops.tilt import _tilt_kernel

        (num_steps,) = static
        if num_steps is None:  # dx/dy unknown: no-op (tilt_compensation.rs:111)
            return cube
        data, new_time = _tilt_kernel(
            cube.data, cube.time, cube.valid_wh, params[0], params[1],
            np.float32(cube.dx), np.float32(cube.dy), num_steps,
        )
        return cube.replace(data=data, time=new_time)

    def host_time_out(self, time_np: np.ndarray, static) -> np.ndarray:
        from thz_image_explorer_tpu.ops.tilt import DT_PS

        (num_steps,) = static
        if not num_steps:
            return time_np
        ext = num_steps * DT_PS
        first, last = float(time_np[0]), float(time_np[-1])
        front = np.linspace(first - ext, first - DT_PS, num_steps)
        back = np.linspace(last + DT_PS, last + ext, num_steps)
        return np.concatenate([front, time_np, back]).astype(time_np.dtype)


class _TimeBandPass(FilterStage):
    """Shared TD band-pass behavior (zero outside [low, high] ps with
    adapted-Blackman edges; ``band_pass_td_before_fft.rs:124-182``)."""

    default_window_width = 2.0
    fusable = True

    def __init__(self):
        self.low = 0.0
        self.high = 0.0
        self.window_width = self.default_window_width
        self.active = False

    def reset(self, time: np.ndarray, shape) -> None:
        # the reference resets bounds to the full time range
        self.low = float(time[0]) if len(time) else 0.0
        self.high = float(time[-1]) if len(time) else 0.0

    def clamp_params(self, cube: ScanCube, time=None) -> None:
        # clamp persistently like the reference filter does
        # (band_pass_td_before_fft.rs:134-138) — but outside apply(), which
        # must stay pure (stage.py: FilterStage.clamp_params)
        if time is None:
            time = np.asarray(cube.time)
        if len(time):
            self.low = max(self.low, float(time[0]))
            self.high = min(self.high, float(time[-1]))

    def apply(self, cube: ScanCube, context: StageContext) -> ScanCube:
        data = bp.td_bandpass(
            cube.data, cube.time, self.low, self.high, self.window_width
        )
        return cube.replace(data=data)

    # -- fusion protocol ---------------------------------------------
    def traced_params(self):
        return (
            np.float32(self.low),
            np.float32(self.high),
            np.float32(self.window_width),
        )

    def fused_apply(self, cube: ScanCube, params, static) -> ScanCube:
        low, high, width = params
        return cube.replace(
            data=bp.td_bandpass(cube.data, cube.time, low, high, width)
        )

    def td_weight_vector(self, time, params):
        """The stage's whole effect as a per-time-sample weight — the
        TD analog of ``fd_weight_vector``: lean programs fold it into the
        adjacent DFT matrix (forward for before-FFT stages, inverse
        columns for after-iFFT) instead of a cube-sized mask pass."""
        low, high, width = params
        return bp.td_bandpass_weights(time, low, high, width)


@register_filter
class TimeBandPassBeforeFFT(_TimeBandPass):
    default_window_width = 2.0

    def config(self) -> FilterConfig:
        return FilterConfig(
            name="Time Band Pass",
            description="Band-Pass Filter in Time Domain before the FFT.",
            domain=FilterDomain.TIME_BEFORE_FFT,
        )


@register_filter
class TimeBandPassAfterFFT(_TimeBandPass):
    default_window_width = 0.1  # band_pass_td_after_fft.rs default

    def config(self) -> FilterConfig:
        return FilterConfig(
            name="Time Band Pass (post-FFT)",
            description="Band-Pass Filter in Time Domain after the iFFT.",
            domain=FilterDomain.TIME_AFTER_FFT,
        )


@register_filter
class FrequencyBandPass(FilterStage):
    """FD band-pass (``band_pass_fd.rs``): defaults 0.2–5.0 THz, window
    width 0.1; complex spectrum + amplitudes masked, phases untouched."""

    fusable = True

    def __init__(self):
        self.low = 0.2
        self.high = 5.0
        self.window_width = 0.1
        self.active = False

    def config(self) -> FilterConfig:
        return FilterConfig(
            name="Frequency Band Pass",
            description="Band Pass Filter in Frequency Domain.",
            domain=FilterDomain.FREQUENCY,
        )

    def apply(self, cube: ScanCube, context: StageContext) -> ScanCube:
        fft, amplitudes = bp.fd_bandpass(
            cube.fft, cube.amplitudes, cube.freq, self.low, self.high,
            self.window_width,
        )
        return cube.replace(fft=fft, amplitudes=amplitudes)

    # -- fusion protocol ---------------------------------------------
    def traced_params(self):
        return (
            np.float32(self.low),
            np.float32(self.high),
            np.float32(self.window_width),
        )

    def fused_apply(self, cube: ScanCube, params, static) -> ScanCube:
        fft, amplitudes = bp.fd_bandpass(
            cube.fft, cube.amplitudes, cube.freq, params[0], params[1],
            params[2],
        )
        return cube.replace(fft=fft, amplitudes=amplitudes)

    def fd_weight_vector(self, freq, params):
        """The stage's whole effect as a per-frequency weight (the
        one-pass spectral-reduction dispatch relies on FD stages being
        per-frequency multiplies — ``ops/pallas_specred``)."""
        return bp.fd_bandpass_weights(freq, params[0], params[1], params[2])


@register_filter
class WaterVaporNotch(FilterStage):
    """Comb of notches at atmospheric water-vapor lines. The reference
    only overlays these lines on plots (``center_panel.rs:477-485``);
    BASELINE.json's north star asks for them as a frequency-domain filter."""

    fusable = True

    def __init__(self):
        self.notch_width = 0.02  # THz half-width per line
        self.depth = 1.0  # 1 = full suppression
        self.active = False
        # host numpy, NOT an eager device array: construction must not
        # pin the lines to the ambient default device (a Pipeline built
        # next to a real TPU but run on a virtual CPU mesh would mix
        # platforms); jit transfers it to the right backend per program
        self._lines = np.asarray(WATER_LINES_THZ, np.float32)

    def config(self) -> FilterConfig:
        return FilterConfig(
            name="Water Vapor Notch",
            description=(
                "Suppress atmospheric water-vapor absorption lines with "
                "Blackman-shaped notches."
            ),
            domain=FilterDomain.FREQUENCY,
        )

    def apply(self, cube: ScanCube, context: StageContext) -> ScanCube:
        fft, amplitudes = bp.water_notch(
            cube.fft, cube.amplitudes, cube.freq, self._lines,
            self.notch_width, self.depth,
        )
        return cube.replace(fft=fft, amplitudes=amplitudes)

    # -- fusion protocol ---------------------------------------------
    def traced_params(self):
        return (np.float32(self.notch_width), np.float32(self.depth), self._lines)

    def fused_apply(self, cube: ScanCube, params, static) -> ScanCube:
        width, depth, lines = params
        fft, amplitudes = bp.water_notch(
            cube.fft, cube.amplitudes, cube.freq, lines, width, depth
        )
        return cube.replace(fft=fft, amplitudes=amplitudes)

    def fd_weight_vector(self, freq, params):
        """Per-frequency weight of the whole stage (see
        ``FrequencyBandPass.fd_weight_vector``)."""
        width, depth, lines = params
        return bp.water_notch_weights(freq, lines, width, depth)


@register_filter
class Deconvolution(FilterStage):
    """Frequency-resolved Richardson-Lucy deconvolution
    (``deconvolution.rs``; IEEE TTHZ.2025.3546756). Toggling it on does not
    auto-run — only an explicit Apply triggers it (``deconvolution.rs:
    1113-1116``); the executor reproduces the rerun-suppression rule."""

    is_deconvolution = True

    def __init__(self):
        self.params = dec.DeconvolutionParams()
        self.active = False

    def config(self) -> FilterConfig:
        return FilterConfig(
            name="Deconvolution",
            description=(
                "Frequency-dependent deconvolution for enhanced THz-TDS "
                "scans, accounting for beam width variations in time traces."
            ),
            domain=FilterDomain.TIME_AFTER_FFT_PRIO_LAST,
            hyperlink=("TTHZ.2025.3546756", "https://doi.org/10.1109/TTHZ.2025.3546756"),
        )

    def apply(self, cube: ScanCube, context: StageContext) -> ScanCube:
        context.progress(0.0)
        try:
            if cube.dx is None or cube.dy is None:
                log.error("No spatial resolution (dx/dy); skipping deconvolution.")
                return cube
            psf = context.psf
            if psf is None or not psf.is_loaded:
                log.error("No PSF loaded; skipping deconvolution.")
                return cube
            # Bucket padding: the spatial Richardson-Lucy convolutions
            # must not see the padded zero border (the reference pads
            # reflectively off the TRUE image edge, deconvolution.rs:
            # 620-712), so Apply crops to the valid region, deconvolves
            # at the exact scan size, and re-inserts. Exact-shape
            # compilation is acceptable here: Apply is explicit and heavy.
            vwh = context.valid_wh
            data = cube.data
            padded = vwh is not None and (
                vwh[0] < cube.width or vwh[1] < cube.height
            )
            if padded:
                data = _crop2(data, vwh[0], vwh[1])
            width = vwh[0] if padded else cube.width
            height = vwh[1] if padded else cube.height
            # Re-plan only when the inputs changed: the BandGeometry caches
            # its device-resident band stacks, so a cache hit means a rerun
            # re-transfers nothing.
            import dataclasses as _dc

            time_np = np.asarray(cube.time)
            plan_key = (
                _dc.astuple(self.params),
                # content fingerprint, NOT id(): a different PSF allocated
                # at a freed PSF's address must never hit the cache with
                # stale band geometry
                psf.fingerprint(),
                time_np.shape,
                float(time_np[0]),
                float(time_np[-1]),
                (width, height),
                cube.dx,
                cube.dy,
            )
            cached = getattr(self, "_plan_cache", None)
            if cached is not None and cached[0] == plan_key:
                geometry = cached[1]
            else:
                geometry = dec.plan_bands(
                    self.params, psf, time_np,
                    (width, height), cube.dx, cube.dy,
                )
                self._plan_cache = (plan_key, geometry)
            if geometry is None:
                log.warning("Deconvolution preconditions not met; skipping.")
                return cube
            out = dec.deconvolve_cube(
                data,
                geometry,
                progress=context.progress,
                cancelled=context.cancelled,
            )
            if out is None:  # cancelled
                return cube
            if padded:
                out = _insert2(cube.data, out)
            return cube.replace(data=out)
        finally:
            context.progress(None)
