"""Independent numpy (f64) oracle of the COMPLETE reference filter chain.

Re-implements, stage by stage, the exact pipeline composition of
``/root/reference/src/data_thread.rs:1090-1228``:

    scaling -> TD band-pass -> window+FFT -> FD band-pass -> water notch
    -> iFFT (avg spectra, avg-in-Fourier reconstruct, ROI traces)
    -> TD band-pass -> (deconvolution via tests/oracle_deconv.py)

with the reference's observable subtleties:

* the FFT window mutates the time-domain data, so downstream stages see
  *windowed* traces (``math_tools.rs:349-371``);
* the FD band-pass is slice -> adapted-Blackman edge window -> zero-pad
  back to the original frequency length (``band_pass_fd.rs:122-220``);
* ``ifft`` computes pixel-mean complex/amp/phase spectra, optionally
  reconstructs the average trace (and each ROI trace) from *polar means*,
  and overwrites ``data`` with the per-pixel normalized c2r
  (``math_tools.rs:418-571``);
* ROI averaging divides polygon coords by the scale factor, swaps x/y and
  flips vertically (``math_tools.rs:599-661``).

Everything here is plain numpy written from the Rust sources — independent
of the device code under test.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------------ windows
def blackman_window(n, m):
    """numpy-style Blackman value with the reference's NaN->1 disable trick
    and [0, 1] clamp (``math_tools.rs:81-90``)."""
    n = np.asarray(n, np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        res = (
            0.42
            - 0.5 * np.cos(2.0 * np.pi * n / m)
            + 0.08 * np.cos(4.0 * np.pi * n / m)
        )
    return np.where(np.isnan(res), 1.0, np.clip(res, 0.0, 1.0))


def adapted_blackman(time, lower, upper):
    """Window values of ``apply_adapted_blackman_window``
    (``math_tools.rs:102-122``) over the given axis: taper only the first
    ``lower`` and last ``upper`` axis units, unity in between."""
    time = np.asarray(time, np.float64)
    t0, t_end = time[0], time[-1]
    head = time <= lower + t0
    tail = time >= t_end - upper
    # the reference's if/else-if gives the head taper precedence
    return np.where(
        head,
        blackman_window(time - t0, 2.0 * lower),
        np.where(
            tail,
            blackman_window(time - (t_end - upper * 2.0), 2.0 * upper),
            1.0,
        ),
    )


def unwrap(phase):
    """Sequential numpy-style unwrap, period 2*pi, strict > pi comparisons
    (``math_tools.rs:211-240``)."""
    phase = np.asarray(phase, np.float64)
    out = phase.copy()
    flat = out.reshape(-1, out.shape[-1])
    for row in flat:
        prev_val = row[0]
        prev_unw = row[0]
        for i in range(1, len(row)):
            d = row[i] - prev_val
            if d > np.pi:
                d -= 2.0 * np.pi
            elif d < -np.pi:
                d += 2.0 * np.pi
            prev_val = row[i]
            prev_unw = prev_unw + d
            row[i] = prev_unw
    return out


# ------------------------------------------------------------------ stages
def oracle_scaling(arrs: dict, scale: int) -> dict:
    """Block-average downscale of data/amplitudes/phases/fft
    (``math_tools.rs:242-310``): crop to multiples, reshape, mean."""
    if scale <= 1:
        return dict(arrs)
    out = dict(arrs)
    for key in ("data", "amplitudes", "phases", "fft"):
        a = arrs[key]
        nw, nh = a.shape[0] // scale, a.shape[1] // scale
        c = a[: nw * scale, : nh * scale]
        out[key] = c.reshape(nw, scale, nh, scale, -1).mean(axis=(1, 3))
    return out


def oracle_td_bandpass(data, time, low, high, window_width):
    """``band_pass_td_before_fft.rs:124-182`` (identical for the
    after-iFFT variant save the default width)."""
    time = np.asarray(time, np.float64)
    n = len(time)
    low = max(float(low), float(time[0]))
    high = min(float(high), float(time[-1]))
    ge_low = np.nonzero(time >= low)[0]
    lower = int(ge_low[0]) if len(ge_low) else 0
    ge_high = np.nonzero(time >= high)[0]
    upper = int(ge_high[0]) if len(ge_high) else n - 1
    upper = min(max(upper, lower + 1), n)

    out = np.array(data, np.float64, copy=True)
    out[..., :lower] = 0.0
    out[..., upper:] = 0.0
    w = adapted_blackman(time[lower:upper], window_width, window_width)
    out[..., lower:upper] *= w
    return out


def oracle_fft(data, time, window_low, window_high):
    """``math_tools.rs:330-398``: adapted-Blackman window (mutating the
    data), r2c FFT, amplitudes, unwrapped phases."""
    w = adapted_blackman(time, window_low, window_high)
    windowed = np.asarray(data, np.float64) * w
    spec = np.fft.rfft(windowed, axis=-1)
    amps = np.abs(spec)
    phases = unwrap(np.angle(spec))
    return windowed, spec, amps, phases


def oracle_fd_bandpass(fft, amplitudes, freq, low, high, window_width):
    """``band_pass_fd.rs:122-220``: slice to [lower, upper), window the
    slice, zero-pad back."""
    freq = np.asarray(freq, np.float64)
    n = len(freq)
    safe_low = max(float(low), 0.0)
    safe_high = min(float(high), float(freq[-1]))
    ge = np.nonzero(freq >= safe_low)[0]
    lower = int(ge[0]) if len(ge) else 0
    le = np.nonzero(freq <= safe_high)[0]
    upper = int(le[-1]) + 1 if len(le) else n

    w = adapted_blackman(freq[lower:upper], window_width, window_width)
    out_fft = np.zeros_like(np.asarray(fft, np.complex128))
    out_amp = np.zeros_like(np.asarray(amplitudes, np.float64))
    out_fft[..., lower:upper] = fft[..., lower:upper] * w
    out_amp[..., lower:upper] = amplitudes[..., lower:upper] * w
    return out_fft, out_amp


def oracle_water_notch(fft, amplitudes, freq, lines, width, depth):
    """The framework's water-vapor notch spec (strict superset of the
    reference's plot-only lines): per line, inside |f - c| <= width
    multiply by ``1 - depth * blackman((f - (c - width)), 2*width)``,
    combined multiplicatively."""
    freq = np.asarray(freq, np.float64)
    w = np.ones_like(freq)
    for c in np.asarray(lines, np.float64):
        inside = np.abs(freq - c) <= width
        bump = blackman_window(freq - (c - width), 2.0 * width)
        w *= np.where(inside, 1.0 - depth * bump, 1.0)
    return fft * w, amplitudes * w


def polygon_mask(polygon, shape, scaling=1):
    """Boolean in-polygon mask with the reference's exact semantics:
    integer-divided coords, wrapping usize ray-cast, x/y swap + vertical
    flip (``math_tools.rs:574-661``). ``mask[y_size-1-y, x]``."""
    m64 = 1 << 64
    poly = [(x // scaling, y // scaling) for x, y in polygon]
    y_size, x_size = shape[0], shape[1]

    def inside(x, y):
        res = False
        j = len(poly) - 1
        for i in range(len(poly)):
            xi, yi = poly[i]
            xj, yj = poly[j]
            if (yi > y) != (yj > y):
                den = (yj - yi) % m64
                t = (((xj - xi) % m64) * ((y - yi) % m64)) % m64
                if x < (t // den + xi) % m64:
                    res = not res
            j = i
        return res

    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x_min, x_max = min(min(xs), x_size - 1), min(max(xs), x_size - 1)
    y_min, y_max = min(min(ys), y_size - 1), min(max(ys), y_size - 1)
    mask = np.zeros((y_size, x_size), bool)
    for y in range(y_min, y_max + 1):
        for x in range(x_min, x_max + 1):
            if inside(x, y):
                mask[y_size - 1 - y, x] = True
    return mask


def roi_average(arr, polygon, scaling=1):
    """``average_polygon_roi``: mean over in-polygon pixels per z."""
    mask = polygon_mask(polygon, arr.shape[:2], scaling)
    if not mask.any():
        return np.zeros(arr.shape[-1])
    return arr[mask].mean(axis=0)


def polar_irfft(amp, phase, n_time):
    """c2r of from_polar(amp, phase) with explicit 1/N
    (``math_tools.rs:442-470`` / ``:496-529``; realfft's c2r ignores the
    DC bin's imaginary part, as irfft does)."""
    spec = np.asarray(amp, np.float64) * np.exp(1j * np.asarray(phase, np.float64))
    return np.fft.irfft(spec, n=n_time, axis=-1)


def oracle_ifft(arrs: dict, rois, avg_in_fourier, scaling=1) -> dict:
    """``math_tools.rs:418-571``: pixel-mean spectra, optional polar
    reconstruction of the average trace, per-ROI freq-domain averages
    (+ trace via polar c2r in avg-in-Fourier mode, direct spatial average
    otherwise), per-pixel normalized c2r overwriting ``data``."""
    out = dict(arrs)
    n_time = arrs["data"].shape[-1]
    out["avg_fft"] = arrs["fft"].mean(axis=(0, 1))
    out["avg_signal_fft"] = arrs["amplitudes"].mean(axis=(0, 1))
    out["avg_phase_fft"] = arrs["phases"].mean(axis=(0, 1))
    if avg_in_fourier:
        out["avg_data"] = polar_irfft(
            out["avg_signal_fft"], out["avg_phase_fft"], n_time
        )

    roi_data, roi_amp, roi_ph = {}, {}, {}
    for uuid, (name, polygon) in rois.items():
        if polygon is None:
            continue
        amp = roi_average(arrs["amplitudes"], polygon, scaling)
        ph = roi_average(arrs["phases"], polygon, scaling)
        roi_amp[uuid] = amp
        roi_ph[uuid] = ph
        if avg_in_fourier:
            roi_data[uuid] = polar_irfft(amp, ph, n_time)
        else:
            roi_data[uuid] = roi_average(arrs["data"], polygon, scaling)

    out["data"] = np.fft.irfft(arrs["fft"], n=n_time, axis=-1)
    out["roi_data"], out["roi_amp"], out["roi_ph"] = roi_data, roi_amp, roi_ph
    return out


def oracle_optical(freq, samp_amp, samp_phase, ref_amp, ref_phase, thickness_m):
    """``calculate_optical_properties`` (``math_tools.rs:665-701``,
    formulas ``paper/paper.md:81-95``): freq in THz -> Hz, thickness in
    metres, delta_phi = sample - reference, clamps amp>=1e-12 / n>=1e-6."""
    c = 2.99792458e8
    f_hz = np.asarray(freq, np.float64) * 1.0e12
    d = float(thickness_m)
    delta_phi = np.asarray(samp_phase, np.float64) - np.asarray(ref_phase, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        omega = 2.0 * np.pi * f_hz
        n = 1.0 + c * delta_phi / (omega * d)
        amp = np.maximum(np.asarray(samp_amp, np.float64), 1e-12)
        amp_ref = np.maximum(np.asarray(ref_amp, np.float64), 1e-12)
        n_safe = np.maximum(n, 1e-6)
        alpha = -2.0 / d * np.log((n_safe + 1.0) ** 2 / (4.0 * n_safe) * amp / amp_ref)
        kappa = alpha * c / (4.0 * np.pi * f_hz)
    return n, alpha, kappa
